#!/usr/bin/env python
"""Per-query isolation bench (guide §1.1/§1.4): times each headline query's
noop-sink write R times inside one warmed session and captures
.explain("formatted") for plan evidence. Does NOT replace bench.py (frozen
for driver measurement) — this is the optimization-loop instrument.

Usage:
  SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
      [--queries a,b,c] [--repeats 3] [--plans-dir plans/r06] \
      [--suffix before] [--encode] [--json out.json]

Prints per-query all samples + min/median; optionally writes plan files
<plans-dir>/<query>_<suffix>.txt.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import statistics
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DEFAULT_QUERIES = [
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


def capture_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--plans-dir", default=None)
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--encode", action="store_true",
                    help="also time encode_transcripts like bench.py")
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))

    from supersonic_spark.runtime import external_busy_cores
    ext0 = external_busy_cores()

    from supersonic_spark.session import get_spark
    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()

    # same warmup as bench.py
    def _noopmap(bs):
        yield from bs
    (spark.range(100_000).repartition(cpus)
         .mapInArrow(_noopmap, schema="id long").write
         .format("noop").mode("overwrite").save())
    qs["group_agg_pricing_summary"](spark, sf_dir).write \
        .format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    names = [q for q in args.queries.split(",") if q]
    results: dict[str, dict] = {}
    # interleave rounds (round-robin over queries) so a throttle window
    # poisons one sample of many queries, not all samples of one query
    samples: dict[str, list[float]] = {n: [] for n in names}
    for r in range(args.repeats):
        for name in names:
            spark.sparkContext.setJobDescription(f"{name} [r{r}]")
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            samples[name].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)

    if args.plans_dir:
        os.makedirs(args.plans_dir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            path = os.path.join(args.plans_dir,
                                f"{name}_{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(capture_plan(df))

    for name in names:
        ss = samples[name]
        results[name] = {"samples": ss, "min": min(ss),
                         "median": round(statistics.median(ss), 3)}

    if args.encode:
        import shutil
        from pyspark.sql import functions as F
        from supersonic_spark.datagen import generate_transcripts
        from supersonic_spark.pipeline import EncodeConfig, encode_table
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
                   or 0.1)
        n_convs = max(int(330_000 * sf), 500)
        cache_dir = f"/tmp/ss_bench_transcripts_c{n_convs}"
        if not os.path.exists(os.path.join(cache_dir, "_SUCCESS")):
            generate_transcripts(spark, n_convs=n_convs, seed=42) \
                .write.mode("overwrite").parquet(cache_dir)
        src = spark.read.parquet(cache_dir)
        ss = []
        for r in range(args.repeats):
            enc_dir = f"/tmp/ss_bx_enc_{os.getpid()}_{r}"
            spark.sparkContext.setJobDescription(f"encode_transcripts [r{r}]")
            t0 = time.perf_counter()
            man = encode_table(spark, src, enc_dir,
                               EncodeConfig(n_partitions=2 * cpus),
                               fingerprint=f"bx-{sf}-{r}")
            man.agg(F.sum("bytes_in"), F.sum("bytes_out")).collect()
            ss.append(round(time.perf_counter() - t0, 3))
            shutil.rmtree(enc_dir, ignore_errors=True)
        results["encode_transcripts"] = {
            "samples": ss, "min": min(ss),
            "median": round(statistics.median(ss), 3)}

    ext1 = external_busy_cores()
    out = {"sf_dir": sf_dir, "cpus": cpus, "ext_before": ext0,
           "ext_after": ext1, "queries": results}
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
