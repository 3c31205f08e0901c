"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exact baseline; LSH (random-hyperplane
sign buckets) as the scale path. Dot products stay JVM-side via
zip_with/aggregate — no Python UDFs.

Scale notes: brute force is a broadcast of the query vector + one scan
(embarrassingly parallel, no shuffle except the final top-k, which is
TakeOrderedAndProject). The LSH variant buckets vectors once (one
narrow scan) and probes only matching buckets — the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text.analysis import portable_hash64


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


# NOTE (r6, measured): do NOT "optimize" dot()/norm() into unrolled
# element_at chains — Spark 4's higher-order zip_with/aggregate beat a
# 64-term try_element_at/element_at/getItem expression 3-5x on 64-dim
# vectors (0.175 s vs 0.61-0.83 s over 64k rows, interleaved medians).
# The win that DOES hold is folding each vector's norm once per ROW
# instead of once per PAIR (see pairwise_cosine_pairs / knn_join_ivf).


def cosine_topk(df: DataFrame, query: list[float], k: int,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against a constant query vector. The literal
    array is broadcast inside the plan; Catalyst plans the limit as
    TakeOrderedAndProject (no full sort)."""
    import math
    q = F.array(*[F.lit(float(v)) for v in query])
    # query norm folded ONCE driver-side instead of 2*dim HOF steps per
    # row; Python's sequential sum matches Spark's aggregate fold
    # bit-for-bit (same IEEE adds in the same order), so cos_sim is
    # unchanged to the last ulp
    qn = math.sqrt(sum(float(v) * float(v) for v in query))
    v = F.col(vec_col).cast("array<double>")
    scored = df.select(
        F.col(id_col),
        F.round(dot(v, q) / (norm(v) * F.lit(qn)), 4).alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def pairwise_cosine_pairs(df: DataFrame, threshold: float,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          block_col: str | None = None,
                          allow_cross_join: bool = False) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold within blocks.

    block_col is REQUIRED: the blocked plan is an equi self-join, the
    unblocked one an all-pairs CartesianProduct — a scale-killer that
    silently works at toy sizes. Derive a block key with lsh_bucket /
    ivf_assign when the data has no natural one; pass
    allow_cross_join=True only for deliberately tiny exact sweeps."""
    if block_col is None and not allow_cross_join:
        raise ValueError(
            "pairwise_cosine_pairs without block_col plans an all-pairs "
            "cross join; block by lsh_bucket()/ivf_assign() output (or any "
            "natural key), or pass allow_cross_join=True for tiny inputs")
    # norms fold ONCE per vector in the projections (not per pair): a
    # pair evaluated m times per cell re-ran 2 full HOF norm folds each
    # time — precomputing cuts the per-pair HOF work 3x. norm() on the
    # same cast column is the same fold in the same order, and the
    # denominator keeps the norm(a)*norm(b) operand order, so cos_sim
    # is bit-identical to the inline form.
    nrm = norm(F.col(vec_col).cast("array<double>"))
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("va"),
                  nrm.alias("_na"),
                  *([F.col(block_col)] if block_col else []))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("vb"),
                  nrm.alias("_nb"),
                  *([F.col(block_col)] if block_col else []))
    on = [block_col] if block_col else None
    j = a.join(b, on=on) if on else a.crossJoin(b)
    return (j.filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos_sim", F.round(
                 dot(F.col("va"), F.col("vb"))
                 / (F.col("_na") * F.col("_nb")), 4))
             .filter(F.col("cos_sim") >= threshold)
             .select("id_a", "id_b", "cos_sim"))


def lsh_bucket(vec: Column, dim: int, n_planes: int = 16) -> Column:
    """Random-hyperplane sign bucket: plane weights are deterministic
    ±1 from the portable hash of (plane, component) — reproducible on
    any engine, no stored model. Returns a bucket id in [0, 2^n_planes)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        acc = F.lit(0.0)
        for j in range(dim):
            w = 1.0 if _plane_sign(p, j) else -1.0
            acc = acc + F.element_at(vec, j + 1) * F.lit(w)
        bucket = bucket + F.when(acc > 0,
                                 F.lit(1 << p).cast("long")).otherwise(0)
    return bucket


def _plane_sign(p: int, j: int) -> bool:
    import hashlib
    return int(hashlib.md5(f"{p}_{j}".encode()).hexdigest()[:15], 16) % 2 == 0


def multiprobe_buckets(q_bucket: int, n_planes: int,
                       hamming: int) -> list[int]:
    """The query bucket plus every bucket within Hamming distance <=
    `hamming` of it (flip 1..hamming plane signs). Standard multi-probe
    LSH: a near neighbor that falls on the wrong side of a few
    hyperplanes lands in an adjacent bucket; probing the Hamming ball
    recovers it for (sum_{i<=d} C(planes, i)) / 2^planes of the scanned
    fraction — still one scan + bucket-membership filter, no extra
    shuffle. hamming=0 is the classic single-bucket probe."""
    from itertools import combinations
    buckets = {q_bucket}
    for d in range(1, hamming + 1):
        for flips in combinations(range(n_planes), d):
            b = q_bucket
            for p in flips:
                b ^= 1 << p
            buckets.add(b)
    return sorted(buckets)


def lsh_topk(df: DataFrame, query: list[float], k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8, hamming: int = 0) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket —
    or, with hamming=d > 0, in every bucket within Hamming distance d
    (multi-probe; raises recall at a known extra scanned fraction).
    At scale the bucket assignment is precomputed/bucketed-by at write,
    so the probe set is a partition IN-list."""
    dim = len(query)
    probes = multiprobe_buckets(_py_bucket(query, n_planes), n_planes,
                                hamming)
    bucketed = df.withColumn(
        "_bucket", lsh_bucket(F.col(vec_col).cast("array<double>"), dim, n_planes))
    cand = bucketed.filter(F.col("_bucket").isin(probes))
    return cosine_topk(cand.drop("_bucket"), query, k, id_col, vec_col)


def _py_bucket(vec: list[float], n_planes: int) -> int:
    bucket = 0
    for p in range(n_planes):
        acc = 0.0
        for j, v in enumerate(vec):
            acc += v * (1.0 if _plane_sign(p, j) else -1.0)
        if acc > 0:
            bucket |= 1 << p
    return bucket


# --- IVF (inverted-file) variant ------------------------------------------

def ivf_assign(df: DataFrame, centroids: list[list[float]],
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (L2) — the coarse
    quantizer of an IVF index. Centroid list is a plan literal (broadcast);
    the argmin is a fold over per-centroid distance expressions, fully
    JVM-side. At scale the output is written bucketed by `ivf_cell` so
    probes read only matching buckets."""
    v = F.col(vec_col).cast("array<double>")

    def dist2(c: list[float]) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in c])
        d = F.zip_with(v, lit, lambda a, b: (a - b) * (a - b))
        return F.aggregate(d, F.lit(0.0), lambda acc, x: acc + x)

    best_cell = F.lit(0)
    best_d = dist2(centroids[0])
    for i, c in enumerate(centroids[1:], start=1):
        d = dist2(c)
        closer = d < best_d
        best_cell = F.when(closer, F.lit(i)).otherwise(best_cell)
        best_d = F.when(closer, d).otherwise(best_d)
    return df.withColumn("ivf_cell", best_cell)


def train_centroids(df: DataFrame, k: int, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    lloyd_iters: int = 2) -> list[list[float]]:
    """Deterministic coarse centroids: seeds are the k vectors with the
    smallest portable hash of their id (reproducible, no RNG), refined by
    `lloyd_iters` Lloyd iterations for IVF cell balance/recall. Each
    iteration is one scan: the Arrow quantizer kernel assigns cells and
    emits ONE (cell, vector-sum, count) partial per task (map-side
    combine), a tiny (tasks x k x dim)-row Spark agg folds the partials,
    and only k centroid rows reach the driver — no n-row collect, no
    n x dim explode shuffle. Empty cells keep their previous centroid.
    lloyd_iters=0 reproduces the round-3 hash-sample behavior."""
    from .text.analysis import portable_hash64
    rows = (df.select(vec_col,
                      portable_hash64(F.col(id_col).cast("string")).alias("h"))
              .orderBy("h").limit(k).collect())
    cents = [list(map(float, r[vec_col])) for r in rows]
    for _ in range(lloyd_iters):
        cents = _lloyd_step(df, cents, id_col, vec_col)
    return cents


def _lloyd_step(df: DataFrame, centroids: list[list[float]],
                id_col: str, vec_col: str) -> list[list[float]]:
    """One Lloyd iteration: nearest-centroid assign + per-cell mean."""
    import numpy as np
    c = np.asarray(centroids, dtype=np.float64)          # (k, dim)
    k, dim = c.shape
    c_sq = (c * c).sum(axis=1)

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        sums = np.zeros((k, dim))
        cnts = np.zeros(k, dtype=np.int64)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            m = _list_to_matrix(batch.column(0), dim)
            cells = (c_sq[None, :] - 2.0 * (m @ c.T)).argmin(axis=1)
            np.add.at(sums, cells, m)
            np.add.at(cnts, cells, 1)
        live = np.nonzero(cnts)[0]
        yield pa.RecordBatch.from_arrays(
            [pa.array(live.astype(np.int32), pa.int32()),
             pa.array(sums[live].tolist(), pa.list_(pa.float64())),
             pa.array(cnts[live], pa.int64())],
            ["cell", "psum", "cnt"])

    partials = (df.select(vec_col)
                  .mapInArrow(run, schema="cell int, psum array<double>, "
                                          "cnt long"))
    # ONE job over the quantizer scan: each partial row carries its cnt
    # once per exploded pos, so sum(cnt) per (cell, pos) IS the cell's
    # total count (identical for every pos of a cell). Folding it into
    # the same agg avoids a second full scan of the uncached mapInArrow
    # plan — and guarantees sums and counts come from the same pass.
    rows = (partials.select("cell", "cnt",
                            F.posexplode("psum").alias("pos", "v"))
            .groupBy("cell", "pos").agg(F.sum("v").alias("s"),
                                        F.sum("cnt").alias("n")).collect())
    new = np.array(c)                  # empty cells keep their seed
    for r in rows:
        new[r["cell"], r["pos"]] = r["s"] / int(r["n"])
    return [list(map(float, row)) for row in new]


# --- Arrow-batched kernels (the 100 TB hot path) ---------------------------
#
# The higher-order-function scorers above are interpreted per element and
# the literal-expansion bucket assigners build O(planes*dim) Catalyst
# expression trees — fine for oracle-checkable toy dims, hostile at real
# dims (768+). These mapInArrow kernels batch whole record batches through
# one numpy matmul; same math, same outputs, ~10-100x faster per element
# (see BENCH/ann_kernel.json).

def _list_to_matrix(col, dim: int):
    """Arrow list<float> column chunk -> (n, dim) float64 matrix."""
    import numpy as np
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(-1, dim)


def cosine_scores_arrow(df: DataFrame, query: list[float],
                        id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """(id, cos_sim) via one numpy matvec per Arrow batch. No shuffle —
    embarrassingly parallel scan; round/top-k are applied by callers in
    DataFrame land so rounding semantics match the expression path."""
    import numpy as np
    q = np.asarray(query, dtype=np.float64)
    dim = len(query)
    qn = float(np.sqrt((q * q).sum()))

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            m = _list_to_matrix(batch.column(1), dim)
            norms = np.sqrt((m * m).sum(axis=1))
            sims = (m @ q) / (norms * qn)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(sims, pa.float64())],
                [id_col, "cos_sim"])

    return (df.select(id_col, vec_col)
              .mapInArrow(run, schema=f"{id_col} long, cos_sim double"))


def cosine_topk_arrow(df: DataFrame, query: list[float], k: int,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k, Arrow-batched scorer + TakeOrderedAndProject."""
    s = cosine_scores_arrow(df, query, id_col, vec_col)
    return (s.select(id_col, F.round("cos_sim", 4).alias("cos_sim"))
             .orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k))


def cosine_topk_multi_arrow(df: DataFrame, queries: list[list[float]],
                            k: int, id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Top-k per query for a BATCH of query vectors in one scan: one
    (batch x queries) matmul per Arrow batch, map-side partial top-k per
    (batch, query), then an exact final top-k per query over the tiny
    candidate union (global top-k is a subset of per-batch top-k, so this
    is exact). This is the realistic ANN hot path — m queries cost one
    pass, not m expression passes. Output: (query_id, id, cos_sim)."""
    import numpy as np
    from pyspark.sql import Window
    qm = np.asarray(queries, dtype=np.float64)            # (m, dim)
    m, dim = qm.shape
    qn = np.sqrt((qm * qm).sum(axis=1))

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mat = _list_to_matrix(batch.column(1), dim)
            norms = np.sqrt((mat * mat).sum(axis=1))
            sims = (mat @ qm.T) / (norms[:, None] * qn[None, :])  # (n, m)
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            n = sims.shape[0]
            kk = min(k, n)
            # the per-batch cut MUST use the same (round(sim,4) desc,
            # id asc) order as the final window, or rounded-equal rows at
            # the boundary can drop the globally-correct low-id winners:
            # argpartition by rounded score to find the kth threshold,
            # keep ALL rows tying it, then lexsort that (small) candidate
            # set under the final order and emit exactly k per query.
            r = np.round(sims, 4)
            qid_out, row_out = [], []
            for qi in range(m):
                part = np.argpartition(-r[:, qi], kk - 1)[:kk]
                thr = r[part, qi].min()
                cand = np.nonzero(r[:, qi] >= thr)[0]
                order = cand[np.lexsort((ids[cand], -r[cand, qi]))][:kk]
                row_out.append(order)
                qid_out.append(np.full(kk, qi, dtype=np.int32))
            rows = np.concatenate(row_out)
            qid = np.concatenate(qid_out)
            yield pa.RecordBatch.from_arrays(
                [pa.array(qid, pa.int32()),
                 pa.array(ids[rows], pa.int64()),
                 pa.array(sims[rows, np.repeat(np.arange(m), kk)],
                          pa.float64())],
                ["query_id", id_col, "cos_sim"])

    cand = (df.select(id_col, vec_col)
              .mapInArrow(run, schema=f"query_id int, {id_col} long, "
                                      f"cos_sim double"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("cos_sim", 4).desc(), F.col(id_col))
    return (cand.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= k).drop("_rk")
                .select("query_id", id_col,
                        F.round("cos_sim", 4).alias("cos_sim")))


def plane_matrix(n_planes: int, dim: int):
    """The deterministic ±1 hyperplane weights as an (n_planes, dim)
    float64 matrix — same weights as lsh_bucket's literal expansion."""
    import numpy as np
    return np.array([[1.0 if _plane_sign(p, j) else -1.0
                      for j in range(dim)] for p in range(n_planes)])


def lsh_topk_arrow(df: DataFrame, query: list[float], k: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   n_planes: int = 8, hamming: int = 0) -> DataFrame:
    """Approximate top-k: one kernel computes bucket AND cosine per batch
    (single scan, no expression-tree explosion); only the probed buckets
    survive — the query's own bucket, plus its Hamming-<=d ball with
    hamming=d (multi-probe). At scale the bucket assignment is
    precomputed and the table written bucketed by it, so probes read the
    probed buckets' files.

    Recall guidance (measured, BENCH/ann_recall.json): on CLUSTERED
    embeddings random-hyperplane LSH reads 0.60 recall@20 at Hamming<=2
    / ~16% scanned, while IVF reads 0.98 at the same scanned fraction —
    for clustered data (the realistic case) prefer `ivf_topk_indexed`,
    the sanctioned high-recall indexed path; LSH remains the right tool
    for data with no cluster structure and for cheap dedup-style
    candidate generation."""
    import numpy as np
    dim = len(query)
    w = plane_matrix(n_planes, dim)
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    pw2 = (1 << np.arange(n_planes)).astype(np.int64)
    q_bucket = int(((w @ q > 0).astype(np.int64) * pw2).sum())
    probe_set = np.array(multiprobe_buckets(q_bucket, n_planes, hamming),
                         dtype=np.int64)

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            m = _list_to_matrix(batch.column(1), dim)
            buckets = (((m @ w.T) > 0).astype(np.int64) * pw2).sum(axis=1)
            keep = np.isin(buckets, probe_set)
            mk = m[keep]
            norms = np.sqrt((mk * mk).sum(axis=1))
            sims = (mk @ q) / (norms * qn)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0).filter(pa.array(keep)),
                 pa.array(sims, pa.float64())],
                [id_col, "cos_sim"])

    cand = (df.select(id_col, vec_col)
              .mapInArrow(run, schema=f"{id_col} long, cos_sim double"))
    return (cand.select(id_col, F.round("cos_sim", 4).alias("cos_sim"))
                .orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k))


def lsh_assign_arrow(df: DataFrame, dim: int, n_planes: int = 8,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Arrow-batched LSH bucket assignment: (id, vec, lsh_bucket) — the
    write-time twin of ivf_assign_arrow, for persisting tables bucketed
    by sign bucket so probes (single- or multi-probe Hamming ball) read
    only matching buckets. Same deterministic planes as lsh_bucket."""
    import numpy as np
    w = plane_matrix(n_planes, dim)
    pw2 = (1 << np.arange(n_planes)).astype(np.int64)

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            m = _list_to_matrix(batch.column(1), dim)
            buckets = (((m @ w.T) > 0).astype(np.int64) * pw2).sum(axis=1)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1),
                 pa.array(buckets, pa.int64())],
                [id_col, vec_col, "lsh_bucket"])

    out_schema = f"{id_col} long, {vec_col} array<float>, lsh_bucket long"
    return df.select(id_col, vec_col).mapInArrow(run, schema=out_schema)


def ivf_assign_arrow(df: DataFrame, centroids: list[list[float]],
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Arrow-batched coarse quantizer: one (batch x centroids) distance
    matmul per batch instead of per-centroid expression folds. Ties break
    to the lowest centroid index (numpy argmin), matching ivf_assign."""
    import numpy as np
    c = np.asarray(centroids, dtype=np.float64)          # (k, dim)
    dim = c.shape[1]
    c_sq = (c * c).sum(axis=1)

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            m = _list_to_matrix(batch.column(1), dim)
            # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
            d2 = c_sq[None, :] - 2.0 * (m @ c.T)
            cells = d2.argmin(axis=1).astype(np.int32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), batch.column(1),
                 pa.array(cells, pa.int32())],
                [id_col, vec_col, "ivf_cell"])

    out_schema = (f"{id_col} long, {vec_col} array<float>, ivf_cell int")
    return df.select(id_col, vec_col).mapInArrow(run, schema=out_schema)


def ivf_topk_arrow(df: DataFrame, query: list[float], k: int,
                   centroids: list[list[float]], n_probe: int = 2,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """IVF probe on the Arrow path: assign + cell filter + batched scorer.
    n_probe = len(centroids) is exact."""
    import math
    dists = [(i, math.dist(query, c)) for i, c in enumerate(centroids)]
    probe = {i for i, _ in sorted(dists, key=lambda t: t[1])[:n_probe]}
    assigned = ivf_assign_arrow(df, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("ivf_cell").isin(*probe)).drop("ivf_cell")
    return cosine_topk_arrow(cand, query, k, id_col, vec_col)


def build_ivf_index(spark, df: DataFrame, out_dir: str,
                    centroids: list[list[float]], id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """WRITE-TIME IVF index: assign cells with the Arrow quantizer and
    persist parquet PARTITIONED BY ivf_cell — the materialized form of
    the 'bucketed at write' scale path. A probe then reads ONLY the
    probed cells' directories via Spark partition pruning (the scan's
    PartitionFilters), so query cost is O(probed fraction) of the table
    instead of a full scan + filter. One shuffle-free pass to build;
    amortized over every query."""
    assigned = ivf_assign_arrow(df, centroids, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("ivf_cell") \
        .parquet(out_dir)
    return out_dir


def ivf_topk_indexed(spark, index_dir: str, query: list[float], k: int,
                     centroids: list[list[float]], n_probe: int = 2,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Probe a build_ivf_index layout: pick the n_probe nearest cells,
    read only their partitions (directory-level pruning — the plan's
    PartitionFilters carries the ivf_cell IN (...) predicate), then the
    exact Arrow-batched scorer over the candidates. n_probe =
    len(centroids) is exact."""
    import math
    dists = [(i, math.dist(query, c)) for i, c in enumerate(centroids)]
    probe = [i for i, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]
    cand = (spark.read.parquet(index_dir)
            .filter(F.col("ivf_cell").isin(probe))
            .select(id_col, vec_col))
    return cosine_topk_arrow(cand, query, k, id_col, vec_col)


def build_lsh_index(spark, df: DataFrame, out_dir: str, dim: int,
                    n_planes: int = 8, id_col: str = "vec_id",
                    vec_col: str = "embedding") -> str:
    """WRITE-TIME LSH index: assign sign buckets with the Arrow kernel
    (lsh_assign_arrow) and persist parquet PARTITIONED BY lsh_bucket —
    the sign-hash twin of build_ivf_index. A probe (single bucket or a
    Hamming ball, see lsh_topk_indexed) reads ONLY matching bucket
    directories via partition pruning, so query cost is the probed
    fraction of the table. Shuffle-free to build; deterministic planes,
    so probe-side bucket math needs no stored metadata."""
    assigned = lsh_assign_arrow(df, dim, n_planes, id_col, vec_col)
    assigned.write.mode("overwrite").partitionBy("lsh_bucket") \
        .parquet(out_dir)
    return out_dir


def lsh_topk_indexed(spark, index_dir: str, query: list[float], k: int,
                     n_planes: int = 8, hamming: int = 1,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Probe a build_lsh_index layout: compute the query bucket's
    Hamming-<=d ball (multi-probe), read only those bucket directories
    (the scan's PartitionFilters carries lsh_bucket IN (...)), then the
    exact Arrow scorer over the candidates. Scanned fraction ~=
    sum_{i<=d} C(planes, i) / 2^planes of the table."""
    probes = multiprobe_buckets(_py_bucket(query, n_planes), n_planes,
                                hamming)
    cand = (spark.read.parquet(index_dir)
            .filter(F.col("lsh_bucket").isin(probes))
            .select(id_col, vec_col))
    return cosine_topk_arrow(cand, query, k, id_col, vec_col)


def ivf_topk(df: DataFrame, query: list[float], k: int,
             centroids: list[list[float]], n_probe: int = 2,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: score only vectors in the n_probe cells nearest
    the query. Recall improves with n_probe; n_probe=len(centroids) is
    exact."""
    import math
    dists = [(i, math.dist(query, c)) for i, c in enumerate(centroids)]
    probe = {i for i, _ in sorted(dists, key=lambda t: t[1])[:n_probe]}
    assigned = ivf_assign(df, centroids, id_col, vec_col)
    cand = assigned.filter(F.col("ivf_cell").isin(*probe)).drop("ivf_cell")
    return cosine_topk(cand, query, k, id_col, vec_col)


def knn_join_ivf(df: DataFrame, centroids: list[list[float]], k: int,
                 id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Blocked k-NN self-join: every vector's top-k cosine neighbors
    searched WITHIN its IVF cell (the standard ANN kNN-join blocking —
    each quadratic is bounded per cell, like semantic_dedup). Returns
    (id, nbr_id, cos_sim, rk) with rk 1..k; vectors whose cell has
    fewer than k+1 members return fewer rows, and cross-cell true
    neighbors are missed by construction (raise the centroid count to
    shrink cells, or assign to n>1 nearest cells for higher recall).

    Scale: one equi self-join on ivf_cell (AQE skew-splittable) + one
    per-query-id window for the top-k cut — no global sort, no cross
    join. Cosine is rounded to 4 decimals BEFORE ranking so the
    (score desc, nbr_id asc) order is engine-portable.
    """
    assigned = ivf_assign_arrow(df, centroids, id_col, vec_col)
    # consumed by both join sides — materialize once (see
    # minhash_lsh_pairs for the localCheckpoint-vs-persist rationale)
    assigned = assigned.localCheckpoint(eager=True)
    # norms fold once per vector, not per pair (see
    # pairwise_cosine_pairs) — the in-cell quadratic re-ran both norm
    # folds per candidate pair; identical floats by fold-order identity
    nrm = norm(F.col(vec_col).cast("array<double>"))
    a = assigned.select(F.col(id_col).alias("_qid"),
                        F.col(vec_col).alias("_qv"),
                        nrm.alias("_qn"), "ivf_cell")
    b = assigned.select(F.col(id_col).alias("nbr_id"),
                        F.col(vec_col).alias("_nv"),
                        nrm.alias("_nn"), "ivf_cell")
    pairs = a.join(b, "ivf_cell").filter(F.col("_qid") != F.col("nbr_id"))
    sim = F.round(dot(F.col("_qv").cast("array<double>"),
                      F.col("_nv").cast("array<double>"))
                  / (F.col("_qn") * F.col("_nn")), 4)
    from pyspark.sql import Window
    w = (Window.partitionBy("_qid")
         .orderBy(F.col("cos_sim").desc(), F.col("nbr_id").asc()))
    return (pairs.withColumn("cos_sim", sim)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(F.col("_qid").alias(id_col), "nbr_id", "cos_sim", "rk"))


def toy_centroids(k: int, dim: int) -> list[list[float]]:
    """Pinned deterministic coarse centroids in [-1, 1) from md5 — for
    oracle-checkable gates where DuckDB must embed the exact same model
    as literals (trained centroids are data-derived and cannot be
    replicated in static SQL). Same trick as pq.toy_pq_codebooks."""
    import hashlib

    def val(i: int, j: int) -> float:
        h = int(hashlib.md5(f"cent_{i}_{j}".encode()).hexdigest()[:12], 16)
        return (h % 20000) / 10000.0 - 1.0

    return [[val(i, j) for j in range(dim)] for i in range(k)]


def semantic_dedup(df: DataFrame, centroids: list[list[float]],
                   threshold: float, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public): semantic
    near-duplicate removal over embeddings. Coarse-cluster with a k-means
    quantizer (the IVF cell assignment), connect pairs with cosine >=
    threshold INSIDE each cell only, and keep the lowest-id member of
    each connected component. Returns (id, rep_id): rep_id == id for
    kept rows; filter rep_id == id for the deduplicated corpus.

    Scale: the quadratic is bounded per cell (choose k ~ n / target cell
    size, as the paper does); pair generation is an equi self-join on
    ivf_cell (pairwise_cosine_pairs refuses the unblocked cross join),
    and components run O(diameter) min-label joins. Cross-cell
    near-duplicates are missed by construction — the paper's stated
    trade; raise threshold/k accordingly."""
    assigned = ivf_assign_arrow(df, centroids, id_col, vec_col)
    pairs = pairwise_cosine_pairs(assigned, threshold, id_col, vec_col,
                                  block_col="ivf_cell")
    from .operators.graph import connected_components
    comps = connected_components(pairs)
    return (df.select(F.col(id_col).alias("id"))
            .join(comps, "id", "left")
            .select("id", F.coalesce(F.col("cluster_id"), F.col("id"))
                    .alias("rep_id")))
