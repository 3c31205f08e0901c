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


def ewma(df: DataFrame, key_col: str, order_cols: list[str],
         value_col: str, alpha: float = 0.1) -> DataFrame:
    """Exponentially weighted moving average per key: the adjust=False
    recursion y_0 = x_0, y_t = (1-alpha)*y_{t-1} + alpha*x_t, computed
    over the key's rows ordered by `order_cols`. Adds ``ewma`` (double)
    next to the input columns — the classic smoothing/feature step a
    training pipeline runs per conversation or per user.

    Implementation: Arrow-batched applyInPandas (pandas ewm) — each key
    group arrives as ONE pandas frame (unlike applyInPandasWithState's
    chunked iterator), so the sort + recursion see the whole group.

    Scale: one hash shuffle on key; per-group memory is the group's own
    rows (conversations/users, bounded); zero driver-side state. The
    recursion is sequential per key but keys are independent — exactly
    the parallelism a cluster has.
    """
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(list(df.schema.fields)
                            + [StructField("ewma", DoubleType())])
    order = list(order_cols)

    def kernel(pdf):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        pdf = pdf.sort_values(order, kind="mergesort")
        pdf["ewma"] = (pdf[value_col].astype("float64")
                       .ewm(alpha=alpha, adjust=False).mean())
        return pdf

    return df.groupBy(key_col).applyInPandas(kernel, schema=out_schema)


def resample_interpolate(df: DataFrame, key_col: str, ts_col: str,
                         value_col: str,
                         step_hours: int = 1) -> DataFrame:
    """Per-key hourly resample with LINEAR interpolation: the grid is
    the key's observed [first, last] hour; observed hours carry
    MAX(value) in the hour, gaps carry the straight line between the
    surrounding observations. Companion to :func:`resample_ffill` for
    numeric series where step-function fill distorts (sensor values,
    prices).

    Returns (key, h, v double). Interior gaps always have both
    neighbors (the grid starts/ends at observed hours).

    Scale: same shape as resample_ffill — key-local grid generation,
    key-partitioned windows only; the prev/next scan is two window
    passes, no self-join.
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
    wp = (Window.partitionBy(key_col).orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy(key_col).orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    g = (grid.join(hourly, [key_col, "h"], "left")
             .withColumn("_pv", F.last("_v", ignorenulls=True).over(wp))
             .withColumn("_ph", F.last(F.when(F.col("_v").isNotNull(),
                                              F.col("h")),
                                       ignorenulls=True).over(wp))
             .withColumn("_nv", F.first("_v", ignorenulls=True).over(wn))
             .withColumn("_nh", F.first(F.when(F.col("_v").isNotNull(),
                                               F.col("h")),
                                        ignorenulls=True).over(wn)))
    dt = (F.unix_timestamp("h") - F.unix_timestamp("_ph"))
    dT = (F.unix_timestamp("_nh") - F.unix_timestamp("_ph"))
    interp = (F.col("_pv")
              + ((F.col("_nv") - F.col("_pv")) * dt) / dT)
    return g.select(
        key_col, "h",
        F.round(F.when(F.col("_v").isNotNull(),
                       F.col("_v").cast("double"))
                .otherwise(interp), 4).alias("v"))


def zscore_flag(df: DataFrame, value_col: str, group_col: str,
                threshold: float = 1.5) -> DataFrame:
    """Per-group standardization + anomaly flag: z = (x - mean)/stddev
    within the group (population stddev), flagged when |z| exceeds the
    threshold. The flag is computed from the ROUNDED z (4 decimals) so
    the decision is reproducible across engines. Adds ``z`` and
    ``is_anomaly``.

    Scale: one tiny groupBy for (mean, std) per group, broadcast back
    onto the scan — the fact rows never shuffle (same shape as
    winsorize).
    """
    stats = df.groupBy(group_col).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_pop(value_col).alias("_sd"))
    z = F.round((F.col(value_col) - F.col("_mu")) / F.col("_sd"), 4)
    return (df.join(F.broadcast(stats), group_col)
              .withColumn("z", z)
              .withColumn("is_anomaly", F.abs(F.col("z")) > threshold)
              .drop("_mu", "_sd"))


def quantile_bucketize(df: DataFrame, value_col: str,
                       n_buckets: int = 10) -> DataFrame:
    """Equal-frequency binning: bucket boundaries are the exact
    interpolated q = i/n percentiles (i = 1..n-1); each row's bucket is
    1 + the number of boundaries strictly below its value. Returns the
    per-bucket histogram (bucket, n, min_val, max_val).

    Deliberately NOT ntile(): a global ntile is a single-partition
    global sort — a scale-killer. Here the boundaries come from one
    percentile aggregation (O(groups)=1 row), broadcast back, and
    bucket assignment is a scan-local expression — no global sort, no
    single-reducer stage at any data size.
    """
    qs = ", ".join(f"{i / n_buckets!r}" for i in range(1, n_buckets))
    bounds = df.agg(
        F.expr(f"percentile({value_col}, array({qs}))").alias("_bs"))
    return (df.crossJoin(F.broadcast(bounds))
              .withColumn(
                  "bucket",
                  (F.lit(1) + F.expr(
                      f"size(filter(_bs, _b -> {value_col} > _b))"))
                  .cast("int"))
              .groupBy("bucket")
              .agg(F.count("*").alias("n"),
                   F.min(value_col).alias("min_val"),
                   F.max(value_col).alias("max_val")))


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


def skyline2d(df: DataFrame, max_col: str, min_col: str) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other —
    q dominates p when q.max_col >= p.max_col AND q.min_col <= p.min_col
    with at least one strict. The "best tradeoffs" operator (Borzsony,
    Kossmann, Stocker, ICDE 2001), e.g. biggest part at the lowest
    price.

    Scale shape — NOT the naive O(n^2) self-join, and NOT a global
    single-partition window over the data either: dominance only
    depends on min(min_col) per distinct max_col value, so

    1. aggregate (max_col -> min(min_col)) — one shuffle bounded by the
       distinct max_col count;
    2. two running-MIN RANGE frames over that DISTINCT-VALUE table
       (tiny, so its global window is harmless):
       ``m_gt`` = best min_col among strictly greater max values,
       ``m_ge`` = best min_col among max values >= this one;
    3. broadcast the threshold table back and filter:
       survive iff (m_gt is null or m_gt > min_col) and m_ge >= min_col
       (an equal-max peer with strictly better min_col dominates).

    Engine-portable (DuckDB RANGE frames agree). Duplicate (max,min)
    points all survive, matching the NOT-EXISTS definition.
    """
    from pyspark.sql import Window
    per_max = df.groupBy(max_col).agg(F.min(min_col).alias("_mn"))
    o = Window.orderBy(F.col(max_col).desc())
    thresholds = per_max.select(
        max_col,
        F.min("_mn").over(o.rangeBetween(Window.unboundedPreceding, -1))
         .alias("_m_gt"),
        F.min("_mn").over(o.rangeBetween(Window.unboundedPreceding,
                                         Window.currentRow))
         .alias("_m_ge"))
    return (df.join(F.broadcast(thresholds), max_col)
              .filter((F.col("_m_gt").isNull()
                       | (F.col("_m_gt") > F.col(min_col)))
                      & (F.col("_m_ge") >= F.col(min_col)))
              .select(*df.columns))
