"""Paragraph/line-level exact deduplication for training corpora.

Removes repeated paragraphs ACROSS documents, keeping only the globally
first occurrence (by (doc_id, position)) of each distinct normalized
paragraph, then reassembles each document from its surviving paragraphs
— the line-level dedup step of CCNet / RefinedWeb-style pipelines and
the paragraph dedup of Lee et al. 2022 ("Deduplicating Training Data
Makes Language Models Better"), here as a pure DataFrame composition.

Scale notes (100 TB): the winner election groups by the 60-bit
paragraph hash, so the agg shuffle carries (hash, composite-position)
— fixed-width rows, map-side combined to one row per distinct
paragraph per partition. The kept-line join re-shuffles (hash,
paragraph-text) once; reassembly is a groupBy(doc_id) collect_list of
the surviving lines (bounded by document size). No UDFs, no windows
over a global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .analysis import portable_hash64

# composite position = doc_id * _POS_LIM + line_idx: assumes fewer than
# _POS_LIM lines per document (asserted nowhere — 1e6 lines in one doc
# would alias; raise if your corpus has pathological documents)
_POS_LIM = 1_000_000


def paragraph_dedup(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id",
                    sep: str = "\n") -> DataFrame:
    """Global paragraph-level exact dedup.

    Splits each document on ``sep``, trims each unit, drops empty units,
    keeps a unit only in the document where it first appears (minimum
    (doc_id, position) over the whole corpus), and reassembles documents
    from their surviving units in original order.

    Returns (id_col, text_dedup, n_kept, n_total) — documents whose
    every paragraph lost its election disappear from the output (their
    deduped text would be empty).

    Reference parity: the reference engine has no corpus-level text
    operators; this extends its Filter/GroupAggregate semantics
    (supersonic/cube/cube.h group-by contract) to the LLM-curation
    domain per the build brief.
    """
    lines = df.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), sep)).alias(
            "idx", "_raw"))
    lines = (lines.withColumn("para", F.trim(F.col("_raw")))
                  .filter(F.length("para") > 0)
                  .select(id_col, "idx", "para"))
    n_total = lines.groupBy(id_col).agg(F.count("*").alias("n_total"))
    comp = (F.col(id_col).cast("long") * F.lit(_POS_LIM)
            + F.col("idx").cast("long"))
    hashed = lines.withColumn("h", portable_hash64(F.col("para"))) \
                  .withColumn("pos", comp)
    winners = hashed.groupBy("h").agg(F.min("pos").alias("win_pos"))
    kept = (hashed.join(winners, "h")
                  .filter(F.col("pos") == F.col("win_pos")))
    reassembled = (kept.groupBy(id_col)
                   .agg(F.array_join(
                            F.transform(
                                F.array_sort(F.collect_list(
                                    F.struct("idx", "para"))),
                                lambda s: s["para"]),
                            sep).alias("text_dedup"),
                        F.count("*").alias("n_kept")))
    return (reassembled.join(n_total, id_col)
            .select(id_col, "text_dedup", "n_kept", "n_total"))
