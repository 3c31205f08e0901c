"""Event-analytics compositions: ordered funnels and cohort retention.

Classic OLAP workloads over an event stream (user_id, ts, event_type)
— the kind the reference's users run through its aggregate/join
operators (reference: supersonic/cursor/core/aggregate.h group-by and
hash-join contracts); here they compose the same Spark primitives so
Catalyst plans them.

Scale notes (100 TB): each funnel step is one user-keyed partial-agg
shuffle (min-ts per user), so a k-step funnel costs k bounded shuffles
— never a window over the global event order. Cohort retention is two
user-keyed aggs + one distinct; everything map-side combines first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel(df: DataFrame, steps: list[str], user_col: str = "user_id",
           ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Ordered-funnel conversion: for each step i, the number of users
    with a strictly increasing timestamp chain event(step_0) < ... <
    event(step_i). Returns (step, step_name, n_users), step 1-based.

    Each stage keeps only the EARLIEST qualifying timestamp per user
    (the optimal chain: if any chain exists, the greedy earliest chain
    exists), so state per user is one timestamp per step.
    """
    if not steps:
        raise ValueError("funnel needs at least one step")
    reached = (df.filter(F.col(type_col) == steps[0])
                 .groupBy(user_col)
                 .agg(F.min(ts_col).alias("_t")))
    out = [reached.agg(F.lit(1).alias("step"),
                       F.lit(steps[0]).alias("step_name"),
                       F.count("*").alias("n_users"))]
    for i, s in enumerate(steps[1:], start=2):
        nxt = (df.filter(F.col(type_col) == s)
                 .join(reached, user_col)
                 .filter(F.col(ts_col) > F.col("_t"))
                 .groupBy(user_col)
                 .agg(F.min(ts_col).alias("_t")))
        reached = nxt
        out.append(reached.agg(F.lit(i).alias("step"),
                               F.lit(s).alias("step_name"),
                               F.count("*").alias("n_users")))
    res = out[0]
    for o in out[1:]:
        res = res.unionAll(o)
    return res


def resample_ffill(df: DataFrame, key_col: str, ts_col: str,
                   value_col: str, step_hours: int = 1) -> DataFrame:
    """Time-series resampling with forward fill: per key, an hourly grid
    from the key's first to last observed hour; each grid point carries
    the latest observed hourly value at or before it (gaps inherit the
    previous value). The hourly observation is MAX(value) within the
    hour (deterministic under intra-hour ordering).

    Returns (key, h, v) with v never NULL (the grid starts at an
    observed hour).

    Scale: one groupBy for hourly aggregates, one for per-key bounds
    (grid size = hours-of-history per key, generated key-locally by
    sequence+explode — no cross-key blowup), one window ffill per key
    ordered by the grid — all key-partitioned; no global sort.
    """
    from pyspark.sql import Window
    h = F.date_trunc("hour", F.col(ts_col))
    hourly = (df.select(F.col(key_col), h.alias("h"), F.col(value_col))
                .groupBy(key_col, "h")
                .agg(F.max(value_col).alias("_v")))
    bounds = hourly.groupBy(key_col).agg(F.min("h").alias("_lo"),
                                         F.max("h").alias("_hi"))
    grid = bounds.select(
        key_col,
        F.explode(F.sequence(
            "_lo", "_hi",
            F.expr(f"interval {int(step_hours)} hour"))).alias("h"))
    w = (Window.partitionBy(key_col).orderBy("h")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (grid.join(hourly, [key_col, "h"], "left")
                .withColumn("v", F.last("_v", ignorenulls=True).over(w))
                .select(key_col, "h", "v"))


def winsorize(df: DataFrame, value_col: str, group_col: str,
              lo: float = 0.05, hi: float = 0.95) -> DataFrame:
    """Winsorization (outlier clipping) per group: values are clamped to
    the group's [lo, hi] interpolated percentiles — the standard robust
    preprocessing step before scaling/aggregation. Adds ``clipped``;
    keeps the original column.

    Scale: one groupBy computing two percentiles per group (Spark's
    exact percentile — at extreme cardinality swap in dd_quantiles),
    broadcast-joined back onto the scan: one shuffle of the fact rows
    never happens.
    """
    pcts = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, {lo!r})").alias("_plo"),
        F.expr(f"percentile({value_col}, {hi!r})").alias("_phi"))
    return (df.join(F.broadcast(pcts), group_col)
              .withColumn(
                  "clipped",
                  F.round(F.least(F.greatest(F.col(value_col).cast("double"),
                                             F.col("_plo")),
                                  F.col("_phi")), 4))
              .drop("_plo", "_phi"))


def cohort_retention(df: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts") -> DataFrame:
    """Weekly cohort retention: users grouped by the week of their first
    event; for each (cohort_week, offset_weeks) the number of distinct
    cohort users active that week. offset 0 is the cohort week itself.
    Returns (cohort_week date, offset_weeks int, n_users).

    Weeks are Monday-truncated in both engines (date_trunc('week')), so
    day differences are exactly divisible by 7.
    """
    wk = F.date_trunc("week", F.col(ts_col)).cast("date")
    first = (df.select(F.col(user_col), wk.alias("_wk"))
               .groupBy(user_col)
               .agg(F.min("_wk").alias("cohort_week")))
    active = df.select(F.col(user_col), wk.alias("active_week")).distinct()
    return (active.join(first, user_col)
            .withColumn("offset_weeks",
                        (F.datediff(F.col("active_week"),
                                    F.col("cohort_week")) / 7).cast("int"))
            .groupBy("cohort_week", "offset_weeks")
            .agg(F.count_distinct(user_col).alias("n_users")))
