"""Mergeable cardinality sketches for 100 TB-scale profiling.

KMV (k-minimum-values, Bar-Yossef et al. 2002): keep the k smallest
distinct 64-bit hash values of a column; the k-th smallest normalized
hash estimates the distinct count as (k-1)/h_k. Properties that matter
at scale:

- **Map-side only.** Each partition emits at most k hashes (an Arrow
  kernel with a bounded np.unique/partition per batch), so the shuffle
  is O(partitions x k) rows regardless of input size — unlike exact
  COUNT(DISTINCT), whose exchange carries every distinct value.
- **Mergeable.** Sketches from different partitions/tables merge by
  union + re-truncate to k smallest — the final merge here is a single
  top-k (TakeOrderedAndProject), never a wide shuffle.
- **Exact below k.** If fewer than k distinct hashes exist, the sketch
  has seen every one and reports the exact distinct count. The driver
  gate exploits this (k chosen above the column's cardinality) so the
  result is DuckDB-verifiable; the estimator path is accuracy-tested in
  pytest at cardinalities far above k.

Hashing is Spark's xxhash64 (stable across sessions/versions by spec);
collisions at 64 bits are negligible below ~2^32 distinct values.

Beyond-reference surface: Supersonic exposes COUNT-DISTINCT via
HybridGroupAggregate (reference: supersonic/cursor/core/aggregate.h)
but no sub-linear sketch; this is the Spark-first scale path next to
the exact gates (agg_distinct, multi_distinct_rewrite).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TWO63 = 2 ** 63
_TWO64 = 2 ** 64


def kmv_partials(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """Per-partition KMV partials: at most k distinct xxhash64 values per
    input partition, one output column ``h`` (long). Arrow-batched; the
    per-partition state is a bounded k-length array."""
    hashed = df.select(F.xxhash64(F.col(col)).alias("h"))

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import numpy as np
        import pyarrow as pa
        best = None                      # sorted ascending, len <= k
        for batch in batches:
            if batch.num_rows == 0:
                continue
            vals = np.asarray(batch.column(0), dtype=np.int64)
            # unsigned ordering so the estimator's [0, 2^64) mapping and
            # the "k smallest" truncation agree
            u = vals.astype(np.uint64) + np.uint64(_TWO63)
            u = np.unique(u)             # sorted ascending
            best = u[:k] if best is None else \
                np.unique(np.concatenate([best, u]))[:k]
        if best is not None and len(best):
            signed = (best - np.uint64(_TWO63)).astype(np.int64)
            yield pa.RecordBatch.from_arrays(
                [pa.array(signed, pa.int64())], ["h"])

    return hashed.mapInArrow(run, schema="h long")


_MIN_LONG = -(2 ** 63)


def kmv_merge(partials: DataFrame, k: int = 1024) -> list[int]:
    """Union partition partials and keep the k smallest distinct hashes
    (unsigned order). The distinct + top-k runs over O(partitions x k)
    rows — trivial regardless of input size. XOR with the sign bit maps
    unsigned order onto signed order, no widening needed."""
    rows = (partials.select("h").distinct()
            .orderBy(F.col("h").bitwiseXOR(F.lit(_MIN_LONG)))
            .limit(k).collect())
    return [r["h"] for r in rows]


def kmv_estimate(hashes: list[int], k: int) -> int:
    """Distinct-count estimate from a merged sketch. Exact when the
    sketch holds fewer than k hashes (every distinct value was seen)."""
    if len(hashes) < k:
        return len(hashes)
    u_k = hashes[k - 1] + _TWO63         # k-th smallest in [0, 2^64)
    if u_k <= 0:
        return len(hashes)
    return int(round((k - 1) * _TWO64 / u_k))


def kmv_distinct_count(df: DataFrame, col: str, k: int = 1024) -> int:
    """End-to-end KMV distinct count of ``df[col]``."""
    return kmv_estimate(kmv_merge(kmv_partials(df, col, k), k), k)


def kmv_distinct_count_df(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """Gate-shaped variant: one row (n_distinct long) as a DataFrame."""
    spark = df.sparkSession
    n = kmv_distinct_count(df, col, k)
    return spark.createDataFrame([(n,)], "n_distinct long")


def approx_distinct(df: DataFrame, col: str, rsd: float = 0.02) -> Column:
    """Spark's native HyperLogLog++ for comparison/fallback — fully
    JVM-side, no Python round trip; rsd trades sketch size for error."""
    return F.approx_count_distinct(F.col(col), rsd)


def mg_partials(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Misra-Gries frequent-items partials: at most k (value, cnt)
    counters per partition, maintained with the mergeable-summaries
    batch reduction (Agarwal et al. 2012): add a batch's value counts,
    and while more than k counters remain subtract the smallest count
    that kills the excess and drop non-positive counters. Undercount is
    bounded by n_partition/(k+1); counts are EXACT when a partition
    holds <= k distinct values (no reduction ever fires).

    Values ride as strings (cast upstream) so one kernel serves every
    input type; at 100 TB the shuffle after this is O(partitions x k)
    rows regardless of input size."""
    import pandas as _pd  # noqa: F401 (worker-side)
    s = df.select(F.col(col).cast("string").alias("v")).na.drop()

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import numpy as np
        import pyarrow as pa
        counters: dict[str, int] = {}
        for batch in batches:
            if batch.num_rows == 0:
                continue
            vals, counts = np.unique(np.asarray(batch.column(0)),
                                     return_counts=True)
            for v, c in zip(vals.tolist(), counts.tolist()):
                counters[v] = counters.get(v, 0) + int(c)
            if len(counters) > k:
                cs = sorted(counters.values())
                d = cs[len(counters) - k - 1]   # kill the excess
                counters = {v: c - d for v, c in counters.items()
                            if c - d > 0}
        if counters:
            vs, cs2 = zip(*counters.items())
            yield pa.RecordBatch.from_arrays(
                [pa.array(vs, pa.string()), pa.array(cs2, pa.int64())],
                ["v", "cnt"])

    return s.mapInArrow(run, schema="v string, cnt long")


def mg_heavy_hitters(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """End-to-end frequent items: merge the per-partition partials
    (sum by value over O(partitions x k) rows, driver-side reduction
    back to k counters) and return (value, est_count) ordered by count
    desc then value. Guarantees: every item with true frequency
    > n/(k+1) appears; est_count undercounts by at most n/(k+1); exact
    when the column's distinct count is <= k everywhere."""
    spark = df.sparkSession
    merged = (mg_partials(df, col, k)
              .groupBy("v").agg(F.sum("cnt").alias("cnt")).collect())
    counters = {r["v"]: r["cnt"] for r in merged}
    if len(counters) > k:
        cs = sorted(counters.values())
        d = cs[len(counters) - k - 1]
        counters = {v: c - d for v, c in counters.items() if c - d > 0}
    rows = sorted(counters.items(), key=lambda t: (-t[1], t[0]))
    return spark.createDataFrame(
        [(v, int(c)) for v, c in rows], "value string, est_count long")


# --------------------------------------------------------------------------
# DDSketch-style relative-error quantiles (Masson, Rim & Lee, VLDB 2019)
# --------------------------------------------------------------------------

def dd_bucket(col: Column, gamma: float) -> Column:
    """DDSketch bucket index for a POSITIVE value: ceil(ln(x)/ln(gamma)).
    The divisor is a pinned double literal so any engine computing this
    expression lands in the identical bucket."""
    import math
    return (F.ceil(F.log(col) / F.lit(math.log(gamma)))).cast("int")


def dd_sketch(df: DataFrame, col: str, gamma: float = 1.02,
              group_cols: tuple[str, ...] = ()) -> DataFrame:
    """The mergeable sketch itself: (group..., bkt, cnt) bucket counts.

    Why this scales: the groupBy is map-side combined, so the shuffle
    carries O(partitions x buckets) rows — the bucket count is bounded by
    ln(max/min)/ln(gamma) (~1.1k buckets for a 1e9 dynamic range at
    gamma=1.02) regardless of input rows. Sketches merge by bucket-wise
    count addition (another groupBy.sum), and every quantile estimate is
    within relative error (gamma-1)/(gamma+1) of the true value.
    Deterministic (no randomness), so exactly reproducible in SQL."""
    b = dd_bucket(F.col(col), gamma)
    return (df.groupBy(*group_cols, b.alias("bkt"))
              .agg(F.count("*").alias("cnt")))


def dd_quantiles(df: DataFrame, col: str, qs: tuple[float, ...],
                 gamma: float = 1.02,
                 group_cols: tuple[str, ...] = ()) -> DataFrame:
    """Quantile estimates from the DDSketch: per group, the value
    2*gamma^j/(gamma+1) of the bucket j holding the rank-floor(q*(n-1))+1
    element. Output columns p<q*100> (rounded to 4 decimals).

    The rank walk runs over BUCKETS, not rows: a per-group window cumsum
    of at most ~1k bucket rows, then one aggregate — no global sort of
    the data, no per-row window. Requires a positive-valued column."""
    from pyspark.sql import Window
    sk = dd_sketch(df, col, gamma, group_cols)
    pg = (Window.partitionBy(*group_cols) if group_cols
          else Window.partitionBy(F.lit(1)))
    cum = (sk.withColumn("cum", F.sum("cnt").over(pg.orderBy("bkt")))
             .withColumn("n", F.sum("cnt").over(pg)))

    def label(q: float) -> str:
        return "p" + f"{q * 100:g}".replace(".", "_")

    aggs = []
    for q in qs:
        r = F.floor(F.lit(float(q)) * (F.col("n") - 1)) + 1
        aggs.append(F.min(F.when(F.col("cum") >= r, F.col("bkt")))
                    .alias("_b_" + label(q)))
    est = cum.groupBy(*group_cols).agg(*aggs)
    for q in qs:
        est = est.withColumn(
            label(q),
            F.round(F.lit(2.0) * F.pow(F.lit(float(gamma)), F.col("_b_" + label(q)))
                    / F.lit(float(gamma) + 1.0), 4)).drop("_b_" + label(q))
    return est


# --- HyperLogLog -----------------------------------------------------------
# (Flajolet et al. 2007). Unlike KMV's value list, the state is a fixed
# m-register table -- the sketch every engine can merge by pairwise MAX.
# Built entirely from codegen expressions on the portable md5 hash, so a
# SQL engine can replay the arithmetic bit-for-bit: bucket = h % m,
# rho = leading-zero rank of h div m computed via length(bin(x)) --
# string length, not floating log2, which rounds wrong near powers of
# two. portable_hash64 carries 60 hash bits (15 hex chars of md5).

_HLL_HASH_BITS = 60


def _hll_alpha(m: int) -> float:
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_registers(df: DataFrame, col: str,
                  group_cols: tuple[str, ...] = (),
                  b: int = 8) -> DataFrame:
    """Mergeable HLL state: (group..., bucket, mj) with mj = max rho
    per register. One m-bounded shuffle per group (partial MAX combines
    map-side); merging sketches from different tables/partitions is
    GROUP BY bucket MAX(mj) again -- exercised in pytest."""
    from supersonic_spark.text.analysis import portable_hash64
    if not (4 <= b <= 16):
        raise ValueError("b must be in [4, 16]")
    m = 1 << b
    rest_bits = _HLL_HASH_BITS - b
    h = portable_hash64(F.col(col).cast("string"))
    hashed = df.select(*group_cols, h.alias("_hv"))
    rest = F.expr(f"_hv div {m}")
    rho = (F.when(rest == 0, F.lit(rest_bits + 1))
            .otherwise(F.lit(rest_bits + 1) - F.length(F.bin(rest))))
    return (hashed.withColumn("bucket",
                              F.pmod(F.col("_hv"), F.lit(m)).cast("int"))
                  .withColumn("rho", rho.cast("int"))
                  .groupBy(*group_cols, "bucket")
                  .agg(F.max("rho").alias("mj")))


def hll_estimate(registers: DataFrame,
                 group_cols: tuple[str, ...] = (),
                 b: int = 8) -> DataFrame:
    """Distinct-count estimate from an HLL register table: the raw
    harmonic-mean estimator with the standard small-range (linear
    counting) correction; empty registers contribute 2^0 each. Adds
    ``est_distinct`` (rounded to 4)."""
    m = 1 << b
    alpha = _hll_alpha(m)
    agg = registers.groupBy(*group_cols).agg(
        F.count("*").alias("_nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("mj"))).alias("_s"))
    raw = (F.lit(alpha * m * m)
           / (F.col("_s") + (F.lit(m) - F.col("_nz"))))
    linear = F.lit(float(m)) * F.log(F.lit(float(m))
                                     / (F.lit(m) - F.col("_nz")))
    est = F.when((raw <= F.lit(2.5 * m)) & (F.col("_nz") < m), linear) \
           .otherwise(raw)
    return agg.select(*group_cols, F.round(est, 4).alias("est_distinct"))


def hll_distinct(df: DataFrame, col: str,
                 group_cols: tuple[str, ...] = (),
                 b: int = 8) -> DataFrame:
    """Per-group approximate distinct count via HLL (b register bits,
    m = 2^b registers; standard error ~1.04/sqrt(m))."""
    return hll_estimate(hll_registers(df, col, group_cols, b),
                        group_cols, b)


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005): d x w counter matrix;
# each key adds its weight to one counter per row (row i's bucket =
# hash_i(key) % w); a point estimate is the MIN over the d counters,
# always >= the true count, within eps*N with probability 1-delta for
# w = ceil(e/eps), d = ceil(ln 1/delta).
#
# Scale properties (why a 100 TB profiler carries this next to
# Misra-Gries): the shuffle after the explode is bounded by d*w rows per
# partition (partial SUM combines map-side), the register table is
# d*w rows total regardless of key cardinality, and sketches from
# different tables/days MERGE by cell-wise addition (GROUP BY
# (row, bucket) SUM) -- exercised in pytest. Misra-Gries answers "which
# keys are heavy"; CMS answers "how heavy is ANY key" without storing
# keys.
#
# Hashing is the engine-portable 60-bit md5 hash of (row_index || 0x1f
# || key), so a SQL engine replays the register table bit-for-bit;
# oracle parity in plans/oracles.py sketch_count_min.
# ---------------------------------------------------------------------------


def _cms_bucket(col: Column, row: int, w: int) -> Column:
    from supersonic_spark.text.analysis import portable_hash64
    h = portable_hash64(F.concat(F.lit(f"{row}\x1f"), col.cast("string")))
    return F.pmod(h, F.lit(w)).cast("int")


def cms_registers(df: DataFrame, col: str, weight: str | None = None,
                  d: int = 4, w: int = 512) -> DataFrame:
    """Build the CMS register table (row, bucket, cnt), rows with zero
    mass omitted. weight=None counts occurrences; a weight column sums
    it (negative weights = deletions, the CMS turnstile model)."""
    wt = F.col(weight).cast("long") if weight else F.lit(1).cast("long")
    cell = df.select(
        wt.alias("_w"),
        F.posexplode(F.array(*[
            _cms_bucket(F.col(col), i, w) for i in range(d)
        ])).alias("row", "bucket"))
    return (cell.groupBy("row", "bucket").agg(F.sum("_w").alias("cnt")))


def cms_point_estimates(registers: DataFrame, keys: DataFrame,
                        key_col: str, d: int = 4, w: int = 512) -> DataFrame:
    """Point-frequency estimates for a key table: min over the d probed
    counters (missing register cell = 0). One broadcast-sized join per
    probe batch: keys explode to d (row, bucket) probes, left-join the
    register table, MIN per key."""
    probes = keys.select(
        F.col(key_col).alias("key"),
        F.posexplode(F.array(*[
            _cms_bucket(F.col(key_col), i, w) for i in range(d)
        ])).alias("row", "bucket"))
    return (probes.join(registers, ["row", "bucket"], "left")
            .groupBy("key")
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                  .alias("est_count")))
