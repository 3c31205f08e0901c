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


def cosine_topk(df: DataFrame, query: list[float], k: int,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against a constant query vector. The literal
    array is broadcast inside the plan; Catalyst plans the limit as
    TakeOrderedAndProject (no full sort)."""
    q = F.array(*[F.lit(float(v)) for v in query])
    scored = df.select(
        F.col(id_col),
        F.round(cosine(F.col(vec_col).cast("array<double>"), q), 4)
        .alias("cos_sim"))
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k)


def pairwise_cosine_pairs(df: DataFrame, threshold: float,
                          id_col: str = "vec_id",
                          vec_col: str = "embedding",
                          block_col: str | None = None) -> DataFrame:
    """Embedding near-duplicate pairs: cosine >= threshold, optionally
    blocked by block_col (always block at scale)."""
    a = df.select(F.col(id_col).alias("id_a"),
                  F.col(vec_col).cast("array<double>").alias("va"),
                  *([F.col(block_col)] if block_col else []))
    b = df.select(F.col(id_col).alias("id_b"),
                  F.col(vec_col).cast("array<double>").alias("vb"),
                  *([F.col(block_col)] if block_col else []))
    on = [block_col] if block_col else None
    j = a.join(b, on=on) if on else a.crossJoin(b)
    return (j.filter(F.col("id_a") < F.col("id_b"))
             .withColumn("cos_sim", F.round(cosine(F.col("va"), F.col("vb")), 4))
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


def lsh_topk(df: DataFrame, query: list[float], k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             n_planes: int = 8) -> DataFrame:
    """Approximate top-k: score only vectors in the query's LSH bucket;
    fall back to exact if the bucket is tiny (caller checks count).
    At scale the bucket assignment is precomputed/bucketed-by at write."""
    dim = len(query)
    q_bucket = _py_bucket(query, n_planes)
    bucketed = df.withColumn(
        "_bucket", lsh_bucket(F.col(vec_col).cast("array<double>"), dim, n_planes))
    cand = bucketed.filter(F.col("_bucket") == q_bucket)
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
                    vec_col: str = "embedding") -> list[list[float]]:
    """Deterministic coarse centroids: the k vectors with the smallest
    portable hash of their id (a seeded sample, no iterative k-means —
    adequate as an IVF coarse quantizer and fully reproducible)."""
    from .text.analysis import portable_hash64
    rows = (df.select(vec_col,
                      portable_hash64(F.col(id_col).cast("string")).alias("h"))
              .orderBy("h").limit(k).collect())
    return [list(map(float, r[vec_col])) for r in rows]


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
