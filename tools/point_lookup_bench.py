"""Wall-clock evidence for the point-lookup path at full scale:
"fetch ONE conversation out of 16.46M turns" against encoded blocks.

Encodes the scaling-campaign input (bloom on conv_id — the shuffle
layout sorts by xxhash64(conv_id), so chunk min/max on the LEXICAL
conv_id spans nearly everything and zone maps alone prune little; the
bloom is what makes the lookup cheap), then times:

  full_decode      — all rows, all columns
  projected_decode — (conv_id, turn_idx) only
  point_lookup     — one conversation, all columns (bloom + residual)
  point_projected  — one conversation, (conv_id, turn_idx, text)

Writes BENCH/point_lookup.json. Interleaved repeats; medians reported
(this box throttles — see BENCH/BASELINE.md method notes).

Usage: python tools/point_lookup_bench.py [--input DIR] [--runs 3]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/ss_scaling/transcripts_c1056000")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--workdir", default="/tmp/ss_pointlookup")
    args = ap.parse_args()

    from pyspark.sql import functions as F
    from supersonic_spark.session import get_spark
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table)

    spark = get_spark(cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    src = spark.read.parquet(args.input)
    n_turns = src.count()
    target = src.select("conv_id").offset(n_turns // 2).limit(1) \
        .collect()[0][0]
    n_target = src.filter(F.col("conv_id") == target).count()

    enc = os.path.join(args.workdir, "enc_bloom")
    cfg = EncodeConfig(n_partitions=2 * args.cores,
                       bloom_cols=("conv_id",))
    t0 = time.perf_counter()
    encode_table(spark, src, enc, cfg, fingerprint="pl-bench")
    enc_sec = time.perf_counter() - t0

    def timed(fn):
        t0 = time.perf_counter()
        n = fn().count()
        return round(time.perf_counter() - t0, 3), n

    cases = {
        "full_decode": lambda: decode_table(spark, enc),
        "projected_decode": lambda: decode_table(
            spark, enc, columns=["conv_id", "turn_idx"]),
        "point_lookup": lambda: decode_table(
            spark, enc, predicate=("conv_id", target, target)),
        "point_projected": lambda: decode_table(
            spark, enc, columns=["conv_id", "turn_idx", "text"],
            predicate=("conv_id", target, target)),
    }
    results = {k: [] for k in cases}
    counts = {}
    for _ in range(args.runs):          # interleaved rounds
        for name, fn in cases.items():
            sec, n = timed(fn)
            results[name].append(sec)
            counts[name] = n
            print(f"{name}: {sec}s ({n} rows)", flush=True)

    assert counts["point_lookup"] == n_target
    assert counts["point_projected"] == n_target
    med = {k: statistics.median(v) for k, v in results.items()}
    out = {
        "n_turns": n_turns, "cores": args.cores,
        "encode_sec_with_blooms": round(enc_sec, 3),
        "target_conv_rows": n_target,
        "median_sec": med, "all_runs": results,
        "speedup_vs_full": {k: round(med["full_decode"] / med[k], 1)
                            for k in med if k != "full_decode"},
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "point_lookup.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
