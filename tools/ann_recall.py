"""Measured recall@k for the approximate ANN paths vs exact brute force.

Approximate indexes trade recall for cost; this harness MEASURES that
trade instead of asserting it, on TWO distributions:

  - uniform: the driver-generated embeddings table (uniform vectors — the
    adversarial case where any partition-then-probe index's recall can
    only track its scanned fraction), and
  - clustered: a deterministic mixture-of-Gaussians table
    (datagen.generate_clustered_embeddings — the realistic case, where
    IVF recall must EXCEED its scanned fraction because near neighbors
    concentrate in the query's cell).

For a sample of query vectors it computes recall@k of

  - lsh_topk_arrow   (sign buckets; hamming=0,1,2 multi-probe sweep,
    with the MEASURED scanned fraction of each probe set)
  - ivf_topk_arrow   (coarse quantizer, n_probe sweep; n_probe = k_cells
    is exact by construction and must read 1.0)
  - pq_topk_refined  (trained product-quantization codebooks; refine
    sweep — recall is set by the ADC shortlist, scan bytes by the
    m-byte codes)

against cosine_topk_arrow ground truth. Writes BENCH/ann_recall.json.

Usage: python tools/ann_recall.py [--sf-dir /root/testdata/sf0.1]
           [--n-queries 16] [--k 20] [--cells 16] [--clustered-n 60000]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def measure(spark, emb, queries, args, label):
    from supersonic_spark.ann import (cosine_topk_arrow, ivf_assign_arrow,
                                      ivf_topk_arrow, lsh_assign_arrow,
                                      lsh_topk_arrow, multiprobe_buckets,
                                      plane_matrix, train_centroids)
    import numpy as np

    n_vecs = emb.count()
    cents = train_centroids(emb, k=args.cells)
    assigned = ivf_assign_arrow(emb, cents).localCheckpoint(eager=True)
    cell_sizes = {r["ivf_cell"]: r["n"] for r in
                  assigned.groupBy("ivf_cell").count()
                  .withColumnRenamed("count", "n").collect()}
    dim = len(queries[0])
    bucketed = lsh_assign_arrow(emb, dim, n_planes=args.planes)
    bucket_sizes = {r["lsh_bucket"]: r["n"] for r in
                    bucketed.groupBy("lsh_bucket").count()
                    .withColumnRenamed("count", "n").collect()}

    def ids(df):
        return [r["vec_id"] for r in df.collect()]

    results = {"n_vectors": n_vecs, "n_queries": len(queries),
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
        print(f"[{label}] ivf n_probe={n_probe}: "
              f"{results['ivf'][str(n_probe)]}", flush=True)

    w = plane_matrix(args.planes, dim)
    pw2 = (1 << np.arange(args.planes)).astype(np.int64)
    for hamming in (0, 1, 2):
        recalls, frac = [], []
        for qi, q in enumerate(queries):
            got = set(ids(lsh_topk_arrow(emb, q, args.k,
                                         n_planes=args.planes,
                                         hamming=hamming)))
            recalls.append(len(got & truth[qi]) / args.k)
            qv = np.asarray(q, dtype=np.float64)
            qb = int(((w @ qv > 0).astype(np.int64) * pw2).sum())
            probes = multiprobe_buckets(qb, args.planes, hamming)
            scanned = sum(bucket_sizes.get(b, 0) for b in probes)
            frac.append(scanned / n_vecs)
        results["lsh"][f"hamming{hamming}"] = {
            "mean_recall": round(sum(recalls) / len(recalls), 4),
            "min_recall": round(min(recalls), 4),
            "mean_scanned_fraction": round(sum(frac) / len(frac), 4)}
        print(f"[{label}] lsh hamming={hamming}: "
              f"{results['lsh'][f'hamming{hamming}']}", flush=True)

    # PQ: trained codebooks, ADC shortlist + exact re-rank; recall is set
    # by the shortlist (refine factor), scan cost by the m-byte codes
    from supersonic_spark.pq import (pq_assign_arrow, pq_topk_refined,
                                     train_pq_codebooks)
    books = train_pq_codebooks(emb, dim=dim, m=args.pq_m, ksub=16,
                               lloyd_iters=2)
    codes = pq_assign_arrow(emb, books).localCheckpoint(eager=True)
    results["pq"] = {"m": args.pq_m, "ksub": 16,
                     "bytes_per_vector": args.pq_m,
                     "code_compression_vs_float32":
                         round(dim * 4 / args.pq_m, 1),
                     "refine": {}}
    for refine in (1, 2, 4, 8):
        recalls = []
        for qi, q in enumerate(queries):
            got = set(ids(pq_topk_refined(emb, q, books, args.k,
                                          refine=refine, codes_df=codes)))
            recalls.append(len(got & truth[qi]) / args.k)
        results["pq"]["refine"][str(refine)] = {
            "mean_recall": round(sum(recalls) / len(recalls), 4),
            "min_recall": round(min(recalls), 4)}
        print(f"[{label}] pq refine={refine}: "
              f"{results['pq']['refine'][str(refine)]}", flush=True)

    exact_probe = results["ivf"][str(args.cells)]
    assert exact_probe["mean_recall"] == 1.0, \
        "full probing must be exact — quantizer bug"
    return results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--n-queries", type=int, default=16)
    ap.add_argument("--k", type=int, default=20)
    ap.add_argument("--cells", type=int, default=16)
    ap.add_argument("--planes", type=int, default=8)
    ap.add_argument("--pq-m", type=int, default=8)
    ap.add_argument("--clustered-n", type=int, default=60000)
    ap.add_argument("--skip-uniform", action="store_true")
    ap.add_argument("--skip-clustered", action="store_true")
    args = ap.parse_args()

    import pyarrow.parquet as pq
    from supersonic_spark.session import get_spark
    from supersonic_spark.datagen import generate_clustered_embeddings

    spark = get_spark(cores=int(os.environ.get("SPARK_GRAFT_CPUS", 8)))
    spark.sparkContext.setLogLevel("ERROR")

    dst = os.path.join(REPO, "BENCH", "ann_recall.json")
    out = {}
    if os.path.exists(dst):
        with open(dst) as f:
            prev = json.load(f)
        # preserve whichever section this invocation skips
        out = {k: prev[k] for k in ("uniform", "clustered") if k in prev}

    if not args.skip_uniform:
        path = os.path.join(args.sf_dir, "embeddings.parquet")
        emb = spark.read.parquet(path).localCheckpoint(eager=True)
        qtbl = pq.read_table(path, columns=["vec_id", "embedding"])
        queries = [qtbl.column("embedding")[i].as_py()
                   for i in range(args.n_queries)]
        out["uniform"] = measure(spark, emb, queries, args, "uniform")

    if not args.skip_clustered:
        emb_c = generate_clustered_embeddings(
            spark, args.clustered_n, dim=64, n_clusters=args.cells,
            seed=99).localCheckpoint(eager=True)
        # queries are themselves clustered points (held-in distribution)
        rows = emb_c.limit(args.n_queries).collect()
        queries = [r["embedding"] for r in rows]
        out["clustered"] = measure(spark, emb_c, queries, args, "clustered")
        # headline claim check: at n_probe=1 on clustered data, recall
        # must clearly exceed the scanned fraction
        p1 = out["clustered"]["ivf"]["1"]
        print(f"clustered ivf n_probe=1: recall {p1['mean_recall']} vs "
              f"scanned {p1['mean_scanned_fraction']}", flush=True)

    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: {"ivf_1": v["ivf"].get("1"),
                          "lsh": v["lsh"]} for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
