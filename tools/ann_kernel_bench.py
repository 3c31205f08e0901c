#!/usr/bin/env python
"""ANN kernel shoot-out: interpreted higher-order-function scorer vs the
Arrow-batched numpy-matmul kernel at a realistic embedding dim.

Writes BENCH/ann_kernel.json; bench.py attaches it to its JSON line.

Data is synthesized deterministically from the row id (hash-style
fract(sin) mix), so no files are written and partitioning doesn't matter.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("ANN_BENCH_N", 50_000))
DIM = int(os.environ.get("ANN_BENCH_DIM", 512))
N_QUERIES = int(os.environ.get("ANN_BENCH_QUERIES", 32))
# 8, not 16: ivf_assign's chained F.when duplicates best_d per level, so
# the expression tree grows ~2^k — 16 centroids at dim 512 is not even
# analyzable in reasonable time (that blow-up is exactly why the Arrow
# kernel exists; see VERDICT r1 #4)
N_CENTROIDS = 8


def synth_vectors(spark, n: int, dim: int):
    """Deterministic pseudo-random unit-scale vectors keyed by row id."""
    def gen(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        import numpy as np
        import pyarrow as pa
        j = np.arange(dim, dtype=np.float64)
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False).astype(np.float64)
            raw = np.sin(ids[:, None] * 12.9898 + j[None, :] * 78.233) * 43758.5453
            m = (raw - np.floor(raw) - 0.5).astype(np.float32)
            yield pa.RecordBatch.from_arrays(
                [batch.column(0),
                 pa.FixedSizeListArray.from_arrays(
                     pa.array(m.ravel(), pa.float32()), dim).cast(
                     pa.list_(pa.float32()))],
                ["vec_id", "embedding"])

    return (spark.range(n)
            .withColumnRenamed("id", "vec_id")
            .mapInArrow(gen, schema="vec_id long, embedding array<float>"))


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    from supersonic_spark.session import get_spark
    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    spark.sparkContext.setLogLevel("ERROR")

    from supersonic_spark.ann import (cosine, cosine_topk,
                                      cosine_topk_arrow,
                                      cosine_topk_multi_arrow,
                                      ivf_assign, ivf_assign_arrow)
    from pyspark.sql import Window, functions as F

    src_dir = f"/tmp/ss_ann_bench_{N}_{DIM}"
    if not os.path.exists(os.path.join(src_dir, "_SUCCESS")):
        synth_vectors(spark, N, DIM).write.mode("overwrite").parquet(src_dir)
    vecs = spark.read.parquet(src_dir)

    query = [((i * 37) % 101 - 50) / 50.0 for i in range(DIM)]
    queries = [[((i * 37 + qi * 11) % 101 - 50) / 50.0 for i in range(DIM)]
               for qi in range(N_QUERIES)]
    cents = [[((i * 17 + c * 53) % 89 - 44) / 44.0 for i in range(DIM)]
             for c in range(N_CENTROIDS)]

    def multi_hof():
        # fair one-pass expression formulation: m cosine columns in one
        # select, stack to (query_id, cos), partitioned-window top-k
        v = F.col("embedding").cast("array<double>")
        cols = []
        for qi, q in enumerate(queries):
            qlit = F.array(*[F.lit(float(x)) for x in q])
            cols.append(F.round(cosine(v, qlit), 4).alias(f"c{qi}"))
        scored = vecs.select("vec_id", *cols)
        stacked = scored.select(
            "vec_id",
            F.posexplode(F.array(*[F.col(f"c{qi}")
                                   for qi in range(N_QUERIES)]))
            .alias("query_id", "cos_sim"))
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("vec_id"))
        return (stacked.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= 20).drop("_rk"))

    out = {"n_vectors": N, "dim": DIM, "n_centroids": N_CENTROIDS,
           "n_queries": N_QUERIES}
    # three runs each, keep the min (this box has 1.5-3x run variance)
    for key, build, runs in [
        ("scorer_hof_sec", lambda: cosine_topk(vecs, query, 20), 3),
        ("scorer_arrow_sec", lambda: cosine_topk_arrow(vecs, query, 20), 3),
        ("multi32_hof_sec", multi_hof, 2),
        ("multi32_arrow_sec",
         lambda: cosine_topk_multi_arrow(vecs, queries, 20), 3),
        ("ivf_assign_expr_sec",
         lambda: ivf_assign(vecs, cents).select("vec_id", "ivf_cell"), 2),
        ("ivf_assign_arrow_sec",
         lambda: ivf_assign_arrow(vecs, cents).select("vec_id", "ivf_cell"),
         3),
    ]:
        out[key] = round(min(timed(build()) for _ in range(runs)), 3)

    out["scorer_speedup"] = round(out["scorer_hof_sec"]
                                  / out["scorer_arrow_sec"], 1)
    out["multi32_speedup"] = round(out["multi32_hof_sec"]
                                   / out["multi32_arrow_sec"], 1)
    out["ivf_assign_speedup"] = round(out["ivf_assign_expr_sec"]
                                      / out["ivf_assign_arrow_sec"], 1)

    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ann_kernel.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
