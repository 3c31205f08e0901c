"""Benchmark decontamination: flag training documents that share word
n-grams with an evaluation/benchmark set (the standard 13-gram-overlap
test-set-leakage check from GPT-3 appendix C / PaLM §7; n is a
parameter because sandbox documents are short).

Plan shape (the 100 TB story):
  1. explode the benchmark set's distinct n-grams (small side),
  2. explode each training doc's distinct n-grams,
  3. inner-join on the gram and count distinct overlapping grams per doc
     — Spark broadcasts the benchmark grams when they fit (a benchmark
     suite is MBs against a 100 TB corpus), so the corpus side never
     shuffles; otherwise it is one equi-join shuffle keyed by gram.
  4. a left join back marks clean documents with overlap 0.

No UDFs anywhere; word_ngrams is the same codegen shingle expression the
MinHash/Jaccard dedup stack uses, so decontamination composes with the
dedup pipeline on one scan.

Beyond-reference surface (Supersonic has no corpus tooling); oracle
parity in plans/oracles.py ``decontaminate``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import word_ngrams


def benchmark_grams(bench: DataFrame, text_col: str = "text",
                    n: int = 8) -> DataFrame:
    """Distinct word n-grams over the benchmark set: one column ``gram``."""
    return (bench
            .select(F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
            .distinct())


def decontaminate(docs: DataFrame, bench: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  n: int = 8, max_overlap: int = 0) -> DataFrame:
    """Per-document overlap report: (id, n_overlap, contaminated).

    ``n_overlap`` counts DISTINCT shared n-grams; ``contaminated`` is
    n_overlap > max_overlap. Keep only ``~contaminated`` rows to filter.
    """
    bg = benchmark_grams(bench, text_col=text_col, n=n)
    doc_grams = docs.select(
        F.col(id_col),
        F.explode(word_ngrams(F.col(text_col), n)).alias("gram"))
    hits = (doc_grams.join(F.broadcast(bg), "gram")
            .groupBy(id_col)
            .agg(F.count_distinct("gram").alias("n_overlap")))
    return (docs.select(id_col)
            .join(hits, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(F.col("n_overlap"), F.lit(0)).alias("n_overlap"))
            .withColumn("contaminated", F.col("n_overlap") > max_overlap))
