#!/usr/bin/env python
"""Headline benchmark: encode throughput on synthetic transcripts (the
north-star metric) + representative operator queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "encode": {turns_per_sec, bytes_per_turn, compression_ratio, ...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "group_agg_pricing_summary",
    "hash_join_inner",
    "lookup_index_multimatch",
    "multi_distinct_rewrite",
    "sort_topk",
    "stateful_running_sum",
    "window_rank",
    "dedup_exact",
    "dedup_minhash_sig",
    "ngram_jaccard",
    "text_quality",
    "ann_topk",
    "codec_roundtrip_docs",
]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.1


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    sf = _sf_of(sf_dir)

    from supersonic_spark.session import get_spark
    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    # warm the session once (JIT, python workers, parquet footers) so the
    # per-query numbers measure steady-state, as on long-lived executors
    import pyarrow as pa_

    def _noopmap(bs):
        yield from bs
    (spark.range(100_000).repartition(cpus)
         .mapInArrow(_noopmap, schema="id long").write
         .format("noop").mode("overwrite").save())
    qs["group_agg_pricing_summary"](spark, sf_dir).write \
        .format("noop").mode("overwrite").save()

    query_secs: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        query_secs[name] = round(time.perf_counter() - t0, 3)
        # isolation: no query's cached/checkpointed state bleeds into the
        # next measurement
        spark.catalog.clearCache()

    # --- encode throughput on deterministic synthetic transcripts ----------
    from supersonic_spark.datagen import generate_transcripts
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table,
                                           roundtrip_mismatch_count)
    from pyspark.sql import functions as F

    n_convs = max(int(330_000 * sf), 500)
    cache_dir = f"/tmp/ss_bench_transcripts_c{n_convs}"
    if not os.path.exists(os.path.join(cache_dir, "_SUCCESS")):
        generate_transcripts(spark, n_convs=n_convs, seed=42) \
            .write.mode("overwrite").parquet(cache_dir)
    src = spark.read.parquet(cache_dir)
    n_turns = src.count()

    enc_dir = f"/tmp/ss_bench_enc_{os.getpid()}"
    cfg = EncodeConfig(n_partitions=2 * cpus)
    t0 = time.perf_counter()
    man = encode_table(spark, src, enc_dir, cfg, fingerprint=f"bench-{sf}")
    tot = man.agg(F.sum("bytes_in").alias("bi"),
                  F.sum("bytes_out").alias("bo")).collect()[0]
    encode_sec = time.perf_counter() - t0

    t0 = time.perf_counter()
    dec = decode_table(spark, enc_dir)
    mismatches = roundtrip_mismatch_count(src, dec)
    decode_verify_sec = time.perf_counter() - t0
    shutil.rmtree(enc_dir, ignore_errors=True)

    encode_stats = {
        "n_turns": n_turns,
        "encode_sec": round(encode_sec, 3),
        "turns_per_sec": round(n_turns / encode_sec, 1),
        "bytes_per_turn": round(tot.bo / max(n_turns, 1), 2),
        "compression_ratio": round(tot.bo / max(tot.bi, 1), 4),
        "roundtrip_mismatches": mismatches,
        "decode_verify_sec": round(decode_verify_sec, 3),
        "cores": cpus,
    }
    query_secs["encode_transcripts"] = encode_stats["encode_sec"]

    # --- shuffle-free encode over the bucketed layout (the Iceberg
    # bucket(conv_id) physical layout the north-rule table would carry;
    # see BENCH/BASELINE.md round-4) — reported inside encode stats so
    # the headline total stays comparable across rounds -----------------
    from supersonic_spark.pipeline import (bucketize_table,
                                           encode_table_prebucketed)
    bdir = f"{cache_dir}_b64"
    if not os.path.exists(os.path.join(bdir, "_SUCCESS")):
        bucketize_table(spark, src, bdir, n_buckets=64)
    enc_pb = f"/tmp/ss_bench_encpb_{os.getpid()}"
    t0 = time.perf_counter()
    man_pb = encode_table_prebucketed(spark, bdir, enc_pb, EncodeConfig(),
                                      fingerprint=f"bench-pb-{sf}")
    tot_pb = man_pb.agg(F.sum("bytes_in").alias("bi"),
                        F.sum("bytes_out").alias("bo")).collect()[0]
    pb_sec = time.perf_counter() - t0
    shutil.rmtree(enc_pb, ignore_errors=True)
    encode_stats["prebucketed"] = {
        "encode_sec": round(pb_sec, 3),
        "turns_per_sec": round(n_turns / pb_sec, 1),
        "bytes_per_turn": round(tot_pb.bo / max(n_turns, 1), 2),
        "compression_ratio": round(tot_pb.bo / max(tot_pb.bi, 1), 4),
    }

    total = round(sum(query_secs.values()), 3)
    scaling = None
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "BENCH", "scaling.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            s = json.load(f)
        scaling = {k: s[k] for k in ("scaling_efficiency",
                                     "median_pair_efficiency_all_2v8",
                                     "best_pair_efficiency_2v8",
                                     "scaling_efficiency_1v4",
                                     "kernel_only_median_pair",
                                     "median_turns_per_sec_low",
                                     "median_turns_per_sec_high",
                                     "cores_low", "cores_high") if k in s}
    ann_kernel = None
    ann_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "ann_kernel.json")
    if os.path.exists(ann_path):
        with open(ann_path) as f:
            ann_kernel = json.load(f)

    print(json.dumps({
        "metric": "headline suite wall-clock (queries + transcript encode)",
        "value": total,
        "unit": "sec",
        "queries": query_secs,
        "sf": sf,
        "encode": encode_stats,
        "scaling": scaling,
        "ann_kernel": ann_kernel,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
