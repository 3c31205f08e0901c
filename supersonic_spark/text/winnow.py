"""Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
SIGMOD 2003 — the MOSS algorithm): hash every positional k-gram, slide
a window of w consecutive hashes, and keep each window's minimum. The
guarantee: any shared substring of length >= w + k - 1 tokens between
two documents yields at least one IDENTICAL selected fingerprint in
both — so near-dup / plagiarism / quote detection reduces to an
equi-join on fingerprint hashes, with density ~2/(w+1) of the grams.

Plan shape (the 100 TB story): posexplode the positional grams (k-gram
density 1/token), hash with the engine-portable 60-bit md5 hash, and
take the windowed MIN over a doc-partitioned, pos-ordered frame of w
rows — Spark's WindowExec with a running frame, no shuffle beyond the
doc-key partition, no UDFs. DISTINCT on the selected values dedups the
overlapping windows that chose the same gram (the winnowing paper's
"record each hash at most once").

Tie-break portability: windows select the minimum of
  key = lpad(hex(hash), 15, '0') || lpad(pos, 8, '0')
— a single STRING min (hash first, leftmost position on equal hashes)
that Spark and DuckDB order identically, avoiding struct-ordering
differences across engines. The hash is 60 bits (15 hex chars) so the
pad is exact; pos is capped at 8 digits (10^8 grams/doc ~ 100x the
longest real document).

Short docs (< w grams) keep their single global-min fingerprint —
window starts are clamped to pos <= max(n_grams - w, 0), so pos 0's
truncated frame covers the whole doc.

Beyond-reference surface (Supersonic has no corpus tooling); oracle
parity in plans/oracles.py ``winnow_fingerprints``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column, Window
from pyspark.sql import functions as F

from .analysis import portable_hash64, tokens


def positional_ngrams(col: Column, n: int) -> Column:
    """Word n-grams in document order, duplicates KEPT (winnowing needs
    every position; contrast dedup.word_ngrams which is a distinct set)."""
    toks = tokens(col)
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def winnow_fingerprints(docs: DataFrame, k: int = 3, w: int = 4,
                        id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Selected fingerprints per document: (id, fp_pos, fp_hash).

    fp_pos is the 0-based gram position of the selected k-gram; fp_hash
    its portable 60-bit hash. Join two documents' outputs on fp_hash to
    find shared substrings of length >= w + k - 1 tokens.
    """
    grams = docs.select(
        F.col(id_col),
        F.posexplode(positional_ngrams(F.col(text_col), k))
         .alias("pos", "gram"))
    keyed = grams.select(
        F.col(id_col), F.col("pos"),
        F.concat(F.lpad(F.hex(portable_hash64(F.col("gram"))), 15, "0"),
                 F.lpad(F.col("pos").cast("string"), 8, "0")).alias("key"))
    by_pos = Window.partitionBy(id_col).orderBy("pos")
    frame = by_pos.rowsBetween(Window.currentRow, w - 1)
    sel = (keyed
           .withColumn("n_grams", F.count("*").over(
               Window.partitionBy(id_col)))
           .withColumn("sel_key", F.min("key").over(frame))
           .filter(F.col("pos") <= F.greatest(F.col("n_grams") - w,
                                              F.lit(0)))
           .select(F.col(id_col), F.col("sel_key"))
           .distinct())
    return sel.select(
        F.col(id_col),
        F.substring("sel_key", 16, 8).cast("int").alias("fp_pos"),
        F.conv(F.substring("sel_key", 1, 15), 16, 10).cast("long")
         .alias("fp_hash"))
