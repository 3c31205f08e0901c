"""Corpus curation operators for training-data pipelines: token-budget
sequence packing and deterministic weighted source mixing.

Both are pure DataFrame compositions with exact cross-engine semantics
(hash-bucket sampling and cumulative-sum binning), so they gate against
DuckDB oracles like every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analysis import portable_hash64, token_count


def pack_sequences(df: DataFrame, budget: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   group_col: str | None = None) -> DataFrame:
    """Assign documents to ~budget-token training bins.

    Deterministic cumulative-sum binning under (group, id) order:
    bin = floor(tokens_before_this_doc / budget). Every bin holds
    >= budget tokens except the last (a doc that crosses a boundary stays
    in the bin it started in — bins overflow rather than split documents,
    the standard packing trade). One partitioned window, no shuffle
    beyond the group hash; at scale group_col (e.g. source or a date
    bucket) bounds window partition size."""
    n_tok = token_count(F.col(text_col))
    if group_col:
        w = (Window.partitionBy(group_col).orderBy(id_col)
             .rowsBetween(Window.unboundedPreceding, -1))
        before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        out = (df.withColumn("n_tokens", n_tok)
                 .withColumn("bin_id",
                             F.floor(before / F.lit(budget)).cast("long")))
        return out.select(group_col, id_col, "n_tokens", "bin_id")
    # ungrouped: a global running token count — computed WITHOUT a
    # single-partition Window via the with_rowid offsets technique:
    # range-partition by id, partition-local running sums, plus a tiny
    # per-partition prefix-offset map (one row per partition collected)
    sess = df.sparkSession
    n = sess.sparkContext.defaultParallelism
    keyed = (df.withColumn("n_tokens", n_tok)
               .select(id_col, "n_tokens")
               .repartitionByRange(n, F.col(id_col))
               .sortWithinPartitions(id_col)
               .withColumn("_mid", F.monotonically_increasing_id())
               .localCheckpoint(eager=True))
    pid = F.shiftright(F.col("_mid"), 33)
    parts = (keyed.groupBy(pid.alias("_pid"))
                  .agg(F.sum("n_tokens").alias("t")).collect())
    offsets: list = []
    acc = 0
    for r in sorted(parts, key=lambda r: r["_pid"]):
        offsets += [F.lit(int(r["_pid"])), F.lit(acc)]
        acc += r["t"]
    off_map = F.create_map(*offsets)
    w = (Window.partitionBy(pid).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    before = off_map[pid] + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return (keyed.withColumn("bin_id",
                             F.floor(before / F.lit(budget)).cast("long"))
                 .select(id_col, "n_tokens", "bin_id"))


def mix_sources(df: DataFrame, weights: dict[str, float],
                source_col: str = "source",
                id_col: str = "doc_id") -> DataFrame:
    """Deterministic weighted subsampling per source — training-mix
    construction. A doc survives iff portable_hash(source||'#'||id) mod
    10000 < weight*10000; reproducible on any engine, no RNG state, and
    independent of partitioning. Unlisted sources drop (weight 0)."""
    h = portable_hash64(F.concat_ws("#", F.col(source_col),
                                    F.col(id_col).cast("string")))
    bucket = F.pmod(h, F.lit(10000))
    expr = None
    for src, wgt in sorted(weights.items()):
        cond = (F.col(source_col) == src) & (bucket < int(round(wgt * 10000)))
        expr = cond if expr is None else (expr | cond)
    if expr is None:
        expr = F.lit(False)
    return df.filter(expr)
