"""Measured recall@k for the approximate ANN paths vs exact brute force.

Approximate indexes trade recall for cost; this harness MEASURES that
trade instead of asserting it: for a sample of query vectors from the
embeddings table it computes recall@k of

  - lsh_topk_arrow  (random-hyperplane sign bucket, single probe)
  - ivf_topk_arrow  (coarse quantizer, n_probe sweep; n_probe = k_cells
    is exact by construction and must read 1.0)

against cosine_topk_arrow ground truth, plus the candidate-set fraction
each probe scanned (the cost side of the trade). Writes
BENCH/ann_recall.json.

Usage: python tools/ann_recall.py [--sf-dir /root/testdata/sf0.1]
           [--n-queries 16] [--k 20] [--cells 16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--planes", type=int, default=8)
    args = ap.parse_args()

    import pyarrow.parquet as pq
    from supersonic_spark.session import get_spark
    from supersonic_spark.ann import (cosine_topk_arrow, ivf_assign_arrow,
                                      ivf_topk_arrow, lsh_topk_arrow,
                                      train_centroids)

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    spark.sparkContext.setLogLevel("ERROR")
    path = os.path.join(args.sf_dir, "embeddings.parquet")
    emb = spark.read.parquet(path).localCheckpoint(eager=True)
    n_vecs = emb.count()
    qtbl = pq.read_table(path, columns=["vec_id", "embedding"])
    queries = [qtbl.column("embedding")[i].as_py()
               for i in range(args.n_queries)]

    cents = train_centroids(emb, k=args.cells)
    assigned = ivf_assign_arrow(emb, cents).localCheckpoint(eager=True)
    cell_sizes = {r["ivf_cell"]: r["n"] for r in
                  assigned.groupBy("ivf_cell").count()
                  .withColumnRenamed("count", "n").collect()}

    def ids(df):
        return [r["vec_id"] for r in df.collect()]

    import math
    results = {"n_vectors": n_vecs, "n_queries": args.n_queries,
               "k": args.k, "cells": args.cells, "planes": args.planes,
               "ivf": {}, "lsh": {}}
    truth = [set(ids(cosine_topk_arrow(emb, q, args.k))) for q in queries]

    for n_probe in sorted({1, 2, 4, args.cells // 2, args.cells}):
        if n_probe < 1:
            continue
        recalls, frac = [], []
        for qi, q in enumerate(queries):
            got = set(ids(ivf_topk_arrow(emb, q, args.k, cents,
                                         n_probe=n_probe)))
            recalls.append(len(got & truth[qi]) / args.k)
            dists = sorted(range(args.cells),
                           key=lambda c: math.dist(q, cents[c]))
            scanned = sum(cell_sizes.get(c, 0) for c in dists[:n_probe])
            frac.append(scanned / n_vecs)
        results["ivf"][str(n_probe)] = {
            "mean_recall": round(sum(recalls) / len(recalls), 4),
            "min_recall": round(min(recalls), 4),
            "mean_scanned_fraction": round(sum(frac) / len(frac), 4)}
        print(f"ivf n_probe={n_probe}: recall {results['ivf'][str(n_probe)]}",
              flush=True)

    recalls = []
    for qi, q in enumerate(queries):
        got = set(ids(lsh_topk_arrow(emb, q, args.k, n_planes=args.planes)))
        recalls.append(len(got & truth[qi]) / args.k)
    results["lsh"] = {"mean_recall": round(sum(recalls) / len(recalls), 4),
                      "min_recall": round(min(recalls), 4),
                      "expected_bucket_fraction": round(2 ** -args.planes, 6)}
    print(f"lsh planes={args.planes}: {results['lsh']}", flush=True)

    exact_probe = results["ivf"][str(args.cells)]
    assert exact_probe["mean_recall"] == 1.0, \
        "full probing must be exact — quantizer bug"

    dst = os.path.join(REPO, "BENCH", "ann_recall.json")
    with open(dst, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
