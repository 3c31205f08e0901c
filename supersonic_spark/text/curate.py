"""Corpus curation operators for training-data pipelines: token-budget
sequence packing and deterministic weighted source mixing.

Both are pure DataFrame compositions with exact cross-engine semantics
(hash-bucket sampling and cumulative-sum binning), so they gate against
DuckDB oracles like every other operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.core import with_prefix_sum
from .analysis import portable_hash64, token_count


def pack_sequences(df: DataFrame, budget: int, text_col: str = "text",
                   id_col: str = "doc_id",
                   group_col: str | None = None) -> DataFrame:
    """Assign documents to ~budget-token training bins.

    Deterministic cumulative-sum binning under (group, id) order:
    bin = floor(tokens_before_this_doc / budget). Every bin holds
    >= budget tokens except the last (a doc that crosses a boundary stays
    in the bin it started in — bins overflow rather than split documents,
    the standard packing trade).

    Both paths run on with_prefix_sum (operators/core.py): range
    partitioning keeps each group contiguous, running sums stay
    partition-local, and a tiny collected offset map stitches partials —
    so one huge source never serializes through a single task (the naive
    Window.partitionBy(group) plan would push a whole source's rows
    through one window task; at 100 TB with ~20 sources that is 5 TB per
    task)."""
    group_cols = [group_col] if group_col else []
    toks = (df.withColumn("n_tokens", token_count(F.col(text_col)))
              .select(*group_cols, id_col, "n_tokens"))
    packed = with_prefix_sum(toks, order=[id_col], value_col="n_tokens",
                             out="_before", group_cols=group_cols)
    out = packed.withColumn(
        "bin_id", F.floor(F.col("_before") / F.lit(budget)).cast("long"))
    return out.select(*group_cols, id_col, "n_tokens", "bin_id")


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


def sample_per_group(df: DataFrame, k: int, group_col: str = "source",
                     id_col: str = "doc_id") -> DataFrame:
    """Deterministic cap of k documents per group — the
    per-source-contribution limit of a training mix. Ranks each group's
    docs by (portable_hash(group||'#'||id), id) — a fixed pseudo-random
    but engine-reproducible order — and keeps the first k. Partitioned
    window only (parallel per group, never global); at 100 TB the
    window partition is one group's rows on one reducer, same cost
    shape as any per-group top-k."""
    from pyspark.sql import Window
    h = portable_hash64(F.concat_ws("#", F.col(group_col),
                                    F.col(id_col).cast("string")))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (df.withColumn("_rk", F.row_number().over(w))
              .filter(F.col("_rk") <= k).drop("_rk"))


def train_val_test_split(df: DataFrame, fractions=(0.9, 0.05, 0.05),
                         id_col: str = "doc_id",
                         salt: str = "split") -> DataFrame:
    """Deterministic train/val/test labeling: the split is a pure
    function of (salt, id) via the portable hash, so it is reproducible
    across engines and runs, independent of partitioning, and stable
    under appends (new docs never move old docs between splits — the
    property a 100 TB corpus needs, where re-labeling means re-reading
    everything). Adds a ``split`` column; fractions must sum to 1."""
    if abs(sum(fractions) - 1.0) > 1e-9 or len(fractions) != 3:
        raise ValueError(f"fractions must be 3 values summing to 1, "
                         f"got {fractions}")
    h = portable_hash64(F.concat_ws("#", F.lit(salt),
                                    F.col(id_col).cast("string")))
    b = F.pmod(h, F.lit(10000))
    t1 = int(round(fractions[0] * 10000))
    t2 = t1 + int(round(fractions[1] * 10000))
    return df.withColumn(
        "split",
        F.when(b < t1, F.lit("train"))
         .when(b < t2, F.lit("val")).otherwise(F.lit("test")))


_WS_DENOM = float(1 << 60)


def weighted_sample(df: DataFrame, weight_col: str, k: int,
                    id_col: str = "doc_id",
                    group_col: str | None = None) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006, A-ES): each row gets key u^(1/w) with u a hash-derived
    uniform in (0,1); the k largest keys per group are the sample —
    inclusion probability proportional to weight, reproducible across
    engines and partitionings because u comes from the portable 60-bit
    hash of the id, not an RNG.

    Scale: one window top-k per group (rank over key), no global sort;
    with group_col=None the single partition holds only the candidate
    rows Spark's TakeOrderedAndProject-style cut retains per task.
    Weights must be positive.
    """
    from pyspark.sql import Window
    u = ((portable_hash64(F.concat(F.lit("ws#"),
                                   F.col(id_col).cast("string"))) + 0.5)
         / F.lit(_WS_DENOM))
    key = F.pow(u, F.lit(1.0) / F.col(weight_col))
    w = (Window.partitionBy(group_col) if group_col
         else Window.partitionBy(F.lit(1)))
    w = w.orderBy(F.col("_ws_key").desc(), F.col(id_col))
    return (df.withColumn("_ws_key", key)
              .withColumn("rn", F.row_number().over(w))
              .filter(F.col("rn") <= k)
              .drop("_ws_key"))


def stratified_sample_exact(df: DataFrame, stratum_col: str,
                            id_col: str, total: int) -> DataFrame:
    """Exact stratified sampling: allocate `total` slots across strata
    proportionally by the largest-remainder (Hamilton) method — each
    stratum gets floor(total * c_s / N), and the leftover slots go to
    the largest fractional remainders (ties broken by stratum value) so
    the sampled count is EXACTLY `total`, not total +- rounding. Within
    a stratum the n_s rows with the smallest portable id hash win —
    deterministic, engine-replayable, partitioning-independent.

    Scale: the allocation table is one strata-sized aggregate + one
    strata-sized window (strata cardinality ~ sources, tiny), broadcast
    back; row selection is one window top-n per stratum. All integer
    arithmetic (floor/remainder via div/pmod), so a SQL oracle matches
    exactly. Requires total <= N.
    """
    from pyspark.sql import Window
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("c_s"))
    n_total = F.sum("c_s").over(Window.partitionBy(F.lit(1)))
    base = (F.lit(total) * F.col("c_s") - F.pmod(
        F.lit(total) * F.col("c_s"), n_total)) / n_total
    rem = F.pmod(F.lit(total) * F.col("c_s"), n_total)
    alloc = counts.select(
        stratum_col, "c_s",
        base.cast("long").alias("n_floor"),
        rem.cast("long").alias("rem"),
        (F.lit(total) - F.sum(base.cast("long")).over(
            Window.partitionBy(F.lit(1)))).alias("leftover"))
    w_rem = Window.partitionBy(F.lit(1)).orderBy(
        F.col("rem").desc(), F.col(stratum_col))
    alloc = alloc.withColumn(
        "n_s", F.col("n_floor")
        + F.when(F.row_number().over(w_rem) <= F.col("leftover"), 1)
           .otherwise(0))
    pick = Window.partitionBy(stratum_col).orderBy(
        portable_hash64(F.concat(F.lit("strat#"),
                                 F.col(id_col).cast("string"))),
        F.col(id_col))
    return (df.join(F.broadcast(alloc.select(stratum_col, "n_s")),
                    stratum_col)
              .withColumn("_rn", F.row_number().over(pick))
              .filter(F.col("_rn") <= F.col("n_s"))
              .drop("_rn", "n_s"))
