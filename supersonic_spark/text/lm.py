"""Corpus bigram language model scoring — the CCNet-style "perplexity
filter" stage of a training-data pipeline: estimate a bigram LM from
the corpus itself (or a reference corpus), score every document's
per-token cross-entropy under it, and drop documents whose entropy is
an outlier (gibberish scores high, boilerplate scores suspiciously
low).

Model: add-k smoothed conditional P(w2|w1) = (c(w1,w2) + k) /
(c(w1) + k*V), with V = corpus unigram-context vocabulary size.
Cross-entropy per document = -sum(ln P) / n_bigrams over the document's
bigrams. Everything is ratios of corpus-level integer counts, so a SQL
engine replays the score exactly (to the 4-decimal rounding the gate
compares at).

Plan shape at 100 TB: bigram extraction is a per-doc lag window (one
doc-keyed shuffle — free on a doc-clustered layout); the model is a
vocabulary-bounded aggregate joined back to the per-doc bigrams on w1/
w2 (bigram vocab ~ O(V^2) worst case but Zipf-bounded in practice — if
it outgrows broadcast, the join degrades gracefully to shuffle); the
final score is one doc-keyed aggregate. Zero UDFs.

Beyond-reference surface (Supersonic has no corpus tooling); oracle
parity in plans/oracles.py ``lm_perplexity``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def doc_bigrams(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document positional bigrams (id, w1, w2) via a doc-keyed
    lead window over whitespace tokens (empty tokens dropped)."""
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "w1"))
    tok = tok.filter(F.col("w1") != "")
    w = Window.partitionBy(id_col).orderBy("pos")
    return (tok.withColumn("w2", F.lead("w1").over(w))
               .filter(F.col("w2").isNotNull())
               .select(id_col, "w1", "w2"))


def bigram_model(bigrams: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Corpus counts from a (.., w1, w2) bigram table: returns
    (c(w1,w2) table, c(w1) context table, V = distinct context count).
    The single collected value is one scalar (the vocabulary size)."""
    c_bg = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c_bg"))
    c_w1 = c_bg.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    v = c_w1.count()
    return c_bg, c_w1, int(v)


def lm_cross_entropy(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", k: float = 0.5,
                     max_xent: float | None = None) -> DataFrame:
    """Per-document cross-entropy under the corpus's own add-k bigram
    LM: (id, n_bigrams, xent[, kept]). xent is rounded to 4 decimals;
    documents with no bigrams (0- or 1-token) are dropped — they carry
    no evidence either way and a filter should pass them through a
    separate length rule. With max_xent set, adds kept = xent <=
    max_xent (the filter's decision column)."""
    bg = doc_bigrams(docs, id_col, text_col)
    c_bg, c_w1, v = bigram_model(bg)
    scored = (bg.join(c_bg, ["w1", "w2"])
                .join(c_w1, "w1")
                .select(F.col(id_col),
                        (F.log((F.col("c_bg") + F.lit(k))
                               / (F.col("c_w1") + F.lit(k * v))))
                        .alias("lp")))
    out = (scored.groupBy(id_col)
           .agg(F.count("*").alias("n_bigrams"),
                F.round(-F.sum("lp") / F.count("*"), 4).alias("xent")))
    if max_xent is not None:
        out = out.withColumn(
            "kept", (F.col("xent") <= F.lit(max_xent)).cast("int"))
    return out
