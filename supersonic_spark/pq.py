"""Product quantization (PQ) for embedding columns + IVF-PQ indexed search.

Jegou/Douze/Schmid, "Product Quantization for Nearest Neighbor Search"
(TPAMI 2011), the standard billion-vector ANN memory layout: split each
dim-d vector into m subvectors, vector-quantize each subspace against its
own ksub-entry codebook, and store ONE byte per subspace — d*4 bytes of
float32 become m bytes (32x at d=64, m=8). Queries run ADC (asymmetric
distance computation): one (m x ksub) lookup table built from the query,
after which every database vector scores as m table lookups + adds — the
database side is never decoded back to floats.

Why this matters at 100 TB: brute-force cosine must stream every float of
every vector past the ALU; IVF prunes to the probed cells' directories
(see ann.build_ivf_index) but still decodes floats. IVF-PQ does both —
directory pruning AND 32x less data per scanned row — which is the
difference between "scan 100 TB" and "scan ~0.2 TB of codes for the
probed tenth". The refine step re-ranks the tiny ADC shortlist against
the exact float vectors, so the output quality is set by the shortlist
recall, not the code resolution.

Layout of a codebook: list (m) of list (ksub) of list (dsub) floats.

Scale/plan notes:
- Training is distributed: seeds are the ksub smallest-id-hash vectors
  (deterministic, no RNG — same trick as ann.train_centroids), refined
  by Lloyd iterations that scan ONCE per iteration for ALL m subspaces
  (each task emits m*ksub (sub, cell, sum, count) partials; a tiny agg
  folds them; only m*ksub rows reach the driver).
- Assignment/ADC are mapInArrow kernels: one (batch x ksub) matmul per
  subspace per batch; codes cross the Arrow boundary as variable-width
  binary built straight from the (n, m) uint8 code matrix buffer — no
  per-row Python.
- The expression-path twins (pq_assign_expr) exist for oracle parity
  with DuckDB SQL at toy sizes, mirroring ann.ivf_assign vs
  ivf_assign_arrow.

Reference parity note: the reference engine (C++ — see SURVEY.md) has no
PQ operator; this extends the ANN section of the LLM-data-pipeline
surface (brief: dedup/similarity-search are first-class at 100 TB).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _toy_val(sub: int, idx: int, j: int) -> float:
    """Deterministic pseudo-random value in [-1, 1) from md5 — shared by
    the Spark gates and the DuckDB oracle generator so both sides embed
    the exact same codebook literals (repr round-trips doubles)."""
    h = int(hashlib.md5(f"pq_{sub}_{idx}_{j}".encode()).hexdigest()[:12], 16)
    return (h % 20000) / 10000.0 - 1.0


def toy_pq_codebooks(m: int, ksub: int, dsub: int) -> list:
    """Pinned deterministic codebooks for oracle-checkable gates (NOT
    trained — correctness gates need both engines to agree on the model
    bit-for-bit, so it is derived from md5, never from data)."""
    return [[[_toy_val(s, i, j) for j in range(dsub)]
             for i in range(ksub)]
            for s in range(m)]


def _codebook_matrix(codebooks: list):
    """(m, ksub, dsub) float64 array + per-entry squared norms (m, ksub)."""
    import numpy as np
    c = np.asarray(codebooks, dtype=np.float64)
    return c, (c * c).sum(axis=2)


def _assign_codes(mat, c, c_sq):
    """(n, dim) matrix -> (n, m) uint8 codes; argmin ties -> lowest idx."""
    import numpy as np
    m, ksub, dsub = c.shape
    codes = np.empty((mat.shape[0], m), dtype=np.uint8)
    for s in range(m):
        xs = mat[:, s * dsub:(s + 1) * dsub]
        # ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; ||x||^2 constant per row
        d2 = c_sq[s][None, :] - 2.0 * (xs @ c[s].T)
        codes[:, s] = d2.argmin(axis=1)
    return codes


def _codes_to_binary(codes):
    """(n, m) uint8 -> Arrow variable-width binary array, zero per-row
    Python: offsets are an arange, the data buffer IS the code matrix."""
    import numpy as np
    import pyarrow as pa
    n, m = codes.shape
    offsets = np.arange(0, (n + 1) * m, m, dtype=np.int32)
    return pa.BinaryArray.from_buffers(
        pa.binary(), n,
        [None, pa.py_buffer(offsets.tobytes()),
         pa.py_buffer(np.ascontiguousarray(codes).tobytes())])


def _binary_to_codes(col, m: int):
    """Arrow binary column (every value exactly m bytes) -> (n, m) uint8
    matrix via offset gathers — no per-row Python, valid for any chunk
    slicing/offset layout."""
    import numpy as np
    import pyarrow as pa
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    off = np.frombuffer(arr.buffers()[1], dtype=np.int32)[
        arr.offset:arr.offset + len(arr) + 1]
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[off[:-1][:, None] + np.arange(m)]


def train_pq_codebooks(df: DataFrame, dim: int, m: int, ksub: int = 16,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       lloyd_iters: int = 2) -> list:
    """Deterministic distributed PQ training: seed each subspace's
    codebook from the ksub vectors with the smallest portable id hash
    (reproducible, no RNG), then run `lloyd_iters` Lloyd iterations. Each
    iteration is ONE scan for all m subspaces: the kernel assigns every
    subvector to its nearest codeword and emits per-task
    (sub, cell, sum, count) partials (map-side combine); a (tasks x m x
    ksub)-row Spark agg folds them and only m*ksub codeword rows reach
    the driver. Empty cells keep their previous codeword."""
    import numpy as np
    from .text.analysis import portable_hash64
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    rows = (df.select(vec_col,
                      portable_hash64(F.col(id_col).cast("string")).alias("h"))
              .orderBy("h").limit(ksub).collect())
    seeds = np.asarray([list(map(float, r[vec_col])) for r in rows],
                       dtype=np.float64)
    books = [seeds[:, s * dsub:(s + 1) * dsub].copy() for s in range(m)]
    for _ in range(lloyd_iters):
        books = _pq_lloyd_step(df, books, vec_col, dim)
    return [b.tolist() for b in books]


def _pq_lloyd_step(df: DataFrame, books: list, vec_col: str,
                   dim: int) -> list:
    """One Lloyd iteration over ALL m subspaces in a single scan."""
    import numpy as np
    c = np.stack(books)                                   # (m, ksub, dsub)
    c_sq = (c * c).sum(axis=2)
    m, ksub, dsub = c.shape

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        sums = np.zeros((m, ksub, dsub))
        cnts = np.zeros((m, ksub), dtype=np.int64)
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mat = _flat_matrix(batch.column(0), dim)
            for s in range(m):
                xs = mat[:, s * dsub:(s + 1) * dsub]
                cells = (c_sq[s][None, :] - 2.0 * (xs @ c[s].T)).argmin(axis=1)
                np.add.at(sums[s], cells, xs)
                np.add.at(cnts[s], cells, 1)
            del mat
        sub_i, cell_i = np.nonzero(cnts)
        yield pa.RecordBatch.from_arrays(
            [pa.array(sub_i.astype(np.int32), pa.int32()),
             pa.array(cell_i.astype(np.int32), pa.int32()),
             pa.array(sums[sub_i, cell_i].tolist(), pa.list_(pa.float64())),
             pa.array(cnts[sub_i, cell_i], pa.int64())],
            ["sub", "cell", "psum", "cnt"])

    partials = (df.select(vec_col)
                  .mapInArrow(run, schema="sub int, cell int, "
                                          "psum array<double>, cnt long"))
    # one job over the scan: cnt rides along every exploded pos, so
    # sum(cnt) per (sub, cell, pos) IS the cell count (same pattern as
    # ann._lloyd_step — sums and counts provably from the same pass)
    rows = (partials.select("sub", "cell", "cnt",
                            F.posexplode("psum").alias("pos", "v"))
            .groupBy("sub", "cell", "pos")
            .agg(F.sum("v").alias("s"), F.sum("cnt").alias("n")).collect())
    new = [b.copy() for b in books]       # empty cells keep their codeword
    for r in rows:
        new[r["sub"]][r["cell"], r["pos"]] = r["s"] / int(r["n"])
    return new


def _flat_matrix(col, dim: int):
    """Arrow list<float> column chunk -> (n, dim) float64 matrix."""
    import numpy as np
    flat = np.asarray(col.flatten(), dtype=np.float64)
    return flat.reshape(-1, dim)


def pq_assign_arrow(df: DataFrame, codebooks: list,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    keep_vec: bool = False) -> DataFrame:
    """Encode every vector to its m-byte PQ code: (id, pq_code binary)
    [+ the float vector with keep_vec=True, for index builds that store
    both]. One (batch x ksub) matmul per subspace per batch; the code
    matrix crosses to the JVM as one binary buffer."""
    c, c_sq = _codebook_matrix(codebooks)
    m, ksub, dsub = c.shape
    dim = m * dsub

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            mat = _flat_matrix(batch.column(1), dim)
            codes = _assign_codes(mat, c, c_sq)
            cols = [batch.column(0), _codes_to_binary(codes)]
            names = [id_col, "pq_code"]
            if keep_vec:
                cols.append(batch.column(1))
                names.append(vec_col)
            yield pa.RecordBatch.from_arrays(cols, names)

    schema = f"{id_col} long, pq_code binary"
    if keep_vec:
        schema += f", {vec_col} array<float>"
    return df.select(id_col, vec_col).mapInArrow(run, schema=schema)


def _adc_luts(query: list, codebooks: list):
    """ADC lookup tables for approximate COSINE: per (sub, codeword) the
    inner product with the query subvector and the codeword's squared
    norm. approx_cos(x) = sum_s ip[s, code_s] /
    (||q|| * sqrt(sum_s n2[s, code_s])) — the PQ reconstruction's exact
    cosine, evaluated without reconstructing."""
    import numpy as np
    c, c_sq = _codebook_matrix(codebooks)
    m, ksub, dsub = c.shape
    q = np.asarray(query, dtype=np.float64)
    ip = np.stack([c[s] @ q[s * dsub:(s + 1) * dsub] for s in range(m)])
    qn = float(np.sqrt((q * q).sum()))
    return ip, c_sq, qn


def pq_adc_scores_arrow(codes_df: DataFrame, query: list, codebooks: list,
                        id_col: str = "vec_id") -> DataFrame:
    """(id, cos_sim) from PQ codes only — m uint8 gathers + adds per
    row, never touching database floats. Input is pq_assign_arrow (or
    build_ivfpq_index) output."""
    import numpy as np
    ip, n2, qn = _adc_luts(query, codebooks)
    m = ip.shape[0]
    srange = np.arange(m)

    def run(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import pyarrow as pa
        for batch in batches:
            if batch.num_rows == 0:
                continue
            codes = _binary_to_codes(batch.column(1), m)
            ips = ip[srange[None, :], codes].sum(axis=1)
            norms = np.sqrt(n2[srange[None, :], codes].sum(axis=1))
            yield pa.RecordBatch.from_arrays(
                [batch.column(0), pa.array(ips / (qn * norms), pa.float64())],
                [id_col, "cos_sim"])

    return (codes_df.select(id_col, "pq_code")
            .mapInArrow(run, schema=f"{id_col} long, cos_sim double"))


def pq_adc_topk_arrow(codes_df: DataFrame, query: list, codebooks: list,
                      k: int, id_col: str = "vec_id") -> DataFrame:
    """Approximate top-k over PQ codes (ADC), TakeOrderedAndProject cut."""
    s = pq_adc_scores_arrow(codes_df, query, codebooks, id_col)
    return (s.select(id_col, F.round("cos_sim", 4).alias("cos_sim"))
             .orderBy(F.col("cos_sim").desc(), F.col(id_col)).limit(k))


def pq_topk_refined(df: DataFrame, query: list, codebooks: list, k: int,
                    refine: int = 4, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    codes_df: DataFrame | None = None) -> DataFrame:
    """PQ search with exact re-rank: ADC shortlist of refine*k ids from
    the codes, then exact cosine over just those float vectors (broadcast
    semi-join — the shortlist is k*refine rows). Output quality is set by
    shortlist recall; the exact scan cost by refine, not table size.
    Pass codes_df to reuse precomputed codes (the realistic layout);
    otherwise codes are derived in-flight."""
    from .ann import cosine_topk_arrow
    codes = (codes_df if codes_df is not None
             else pq_assign_arrow(df, codebooks, id_col, vec_col))
    short = pq_adc_topk_arrow(codes, query, codebooks, k * refine, id_col)
    cand = df.join(F.broadcast(short.select(id_col)), id_col, "left_semi")
    return cosine_topk_arrow(cand, query, k, id_col, vec_col)


def pq_assign_expr(df: DataFrame, codebooks: list,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Expression-path twin of pq_assign_arrow for oracle parity: one int
    column per subspace (c0..c{m-1}), argmin over per-codeword literal
    distance folds — same shape as ann.ivf_assign, O(ksub*dsub) literal
    tree per subspace, toy sizes only (the Arrow kernel is the real
    path)."""
    v = F.col(vec_col).cast("array<double>")
    c, c_sq = _codebook_matrix(codebooks)
    m, ksub, dsub = c.shape
    out = [F.col(id_col)]
    for s in range(m):
        def score(i: int):
            # -2 x.c + ||c||^2 (||x||^2 is argmin-invariant)
            acc = F.lit(float(c_sq[s][i]))
            for j in range(dsub):
                acc = acc + F.element_at(v, s * dsub + j + 1) * F.lit(
                    -2.0 * float(c[s][i][j]))
            return acc
        best_i, best_d = F.lit(0), score(0)
        for i in range(1, ksub):
            d = score(i)
            closer = d < best_d
            best_i = F.when(closer, F.lit(i)).otherwise(best_i)
            best_d = F.when(closer, d).otherwise(best_d)
        out.append(best_i.alias(f"c{s}"))
    return df.select(*out)


def build_ivfpq_index(spark, df: DataFrame, out_dir: str,
                      centroids: list, codebooks: list,
                      id_col: str = "vec_id",
                      vec_col: str = "embedding") -> str:
    """WRITE-TIME IVF-PQ index: coarse-assign cells (Arrow quantizer),
    PQ-encode every vector, persist parquet PARTITIONED BY ivf_cell with
    (id, pq_code, vector). A probe reads only the probed cells'
    directories (PartitionFilters) AND, for the ADC phase, only the
    (id, pq_code) columns — parquet column pruning keeps the float
    vectors on disk until the refine step fetches the shortlist. At
    extreme scale the vector column can live in the base table instead;
    co-locating it here trades space for a single-layout probe."""
    from .ann import ivf_assign_arrow
    assigned = ivf_assign_arrow(df, centroids, id_col, vec_col)
    coded = pq_assign_arrow(assigned.select(id_col, vec_col), codebooks,
                            id_col, vec_col, keep_vec=True)
    out = coded.join(assigned.select(id_col, "ivf_cell"), id_col)
    out.write.mode("overwrite").partitionBy("ivf_cell").parquet(out_dir)
    return out_dir


def ivfpq_topk_indexed(spark, index_dir: str, query: list, k: int,
                       centroids: list, codebooks: list, n_probe: int = 2,
                       refine: int = 4, id_col: str = "vec_id",
                       vec_col: str = "embedding") -> DataFrame:
    """Probe a build_ivfpq_index layout: directory-pruned read of the
    n_probe nearest cells' (id, pq_code) columns, ADC shortlist of
    refine*k, then exact re-rank reading the shortlist's float vectors
    from the same pruned partitions. Scanned bytes ~= probed_fraction *
    m/(4*dim) of the table for phase 1 + refine*k vectors for phase 2."""
    import math
    from .ann import cosine_topk_arrow
    dists = [(i, math.dist(query, c)) for i, c in enumerate(centroids)]
    probe = [i for i, _ in sorted(dists, key=lambda t: t[1])[:n_probe]]
    cells = spark.read.parquet(index_dir).filter(F.col("ivf_cell").isin(probe))
    short = pq_adc_topk_arrow(cells.select(id_col, "pq_code"), query,
                              codebooks, k * refine, id_col)
    cand = (cells.select(id_col, vec_col)
            .join(F.broadcast(short.select(id_col)), id_col, "left_semi"))
    return cosine_topk_arrow(cand, query, k, id_col, vec_col)
