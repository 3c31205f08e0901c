"""Kernel-only scaling ceiling: encode the SAME sorted transcript chunks
through the raw codec stack (selector + encode_block, no Spark, no
shuffle, no IPC) at two pinned process counts. This is the upper bound
any pipeline can reach on this box — if the Spark job's N-vs-4N
efficiency matches this number, the orchestration (shuffle, sort, Arrow
transfer) adds no scaling loss of its own and the residual gap to linear
is the shared memory bus, which a real cluster multiplies per executor.

Usage:
  python tools/kernel_scaling.py [--input /tmp/ss_scaling/transcripts_c1056000]
      [--runs 3] [--low 2] [--high 8] [--chunk-rows 262144]
Writes BENCH/kernel_scaling.json.
"""

from __future__ import annotations

import argparse
import glob
import json
import multiprocessing as mp
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKDIR = "/tmp/ss_kernel_scaling"


def prepare_chunks(input_dir: str, chunk_rows: int) -> list[str]:
    """One-time: read the parquet input, sort by (conv_id, turn_idx) —
    the same order the pipeline's shuffle+sort produces — and write
    fixed-size Arrow IPC chunk files the workers stream back."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    os.makedirs(WORKDIR, exist_ok=True)
    marker = os.path.join(WORKDIR, f"ready_{chunk_rows}")
    if os.path.exists(marker):
        return sorted(glob.glob(os.path.join(WORKDIR, "chunk_*.arrow")))
    tbl = pq.read_table(input_dir)
    tbl = tbl.sort_by([("conv_id", "ascending"), ("turn_idx", "ascending")])
    paths = []
    for i, off in enumerate(range(0, tbl.num_rows, chunk_rows)):
        chunk = tbl.slice(off, chunk_rows).combine_chunks()
        p = os.path.join(WORKDIR, f"chunk_{i:05d}.arrow")
        with pa.OSFile(p, "wb") as f:
            with pa.ipc.new_file(f, chunk.schema) as w:
                w.write_table(chunk)
        paths.append(p)
    with open(marker, "w") as f:
        f.write(str(len(paths)))
    return paths


def _init(cores: int):
    os.sched_setaffinity(0, set(range(cores)))
    import pyarrow as pa
    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)
    try:
        from threadpoolctl import threadpool_limits
        threadpool_limits(1)
    except ImportError:
        pass


def _encode_one(path: str) -> int:
    import pyarrow as pa
    from supersonic_spark.selector import choose_codecs
    from supersonic_spark.codecs import encode_block
    with pa.memory_map(path) as f:
        tbl = pa.ipc.open_file(f).read_all()
    buf = encode_block(tbl, choose_codecs(tbl, entropy="lz4"), entropy="lz4")
    return len(buf)


def run_level(paths: list[str], cores: int) -> dict:
    os.sched_setaffinity(0, set(range(cores)))
    t0 = time.perf_counter()
    with mp.get_context("spawn").Pool(cores, _init, (cores,)) as pool:
        sizes = pool.map(_encode_one, paths, chunksize=1)
    dt = time.perf_counter() - t0
    n_rows = 16456066 if len(paths) > 60 else None
    return {"cores": cores, "sec": round(dt, 3),
            "bytes_out": int(sum(sizes)),
            "chunks": len(paths),
            "chunks_per_sec": round(len(paths) / dt, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/tmp/ss_scaling/transcripts_c1056000")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--low", type=int, default=2)
    ap.add_argument("--high", type=int, default=8)
    ap.add_argument("--chunk-rows", type=int, default=262144)
    args = ap.parse_args()

    paths = prepare_chunks(args.input, args.chunk_rows)
    # warm page cache + imports once
    run_level(paths[:4], args.high)

    results = {args.low: [], args.high: []}
    for _ in range(args.runs):
        for cores in (args.low, args.high):
            results[cores].append(run_level(paths, cores))
            print(f"cores={cores}: {results[cores][-1]['sec']}s", flush=True)

    ratio = args.high / args.low
    pairs = [round((lo["sec"] / hi["sec"]) / ratio, 3)
             for lo, hi in zip(results[args.low], results[args.high])]
    med = {c: statistics.median(x["sec"] for x in rs)
           for c, rs in results.items()}
    best = {c: min(x["sec"] for x in rs) for c, rs in results.items()}
    out = {
        "what": "raw codec kernel (selector+encode_block), no Spark — "
                "box compute/bus scaling ceiling",
        "chunks": len(paths), "chunk_rows": args.chunk_rows,
        "cores_low": args.low, "cores_high": args.high, "runs": args.runs,
        "all_runs": {str(c): rs for c, rs in results.items()},
        "median_sec": med, "best_sec": best,
        "per_pair_efficiency": pairs,
        "median_pair_efficiency": round(statistics.median(pairs), 3),
        "best_pair_efficiency": round(
            (best[args.low] / best[args.high]) / ratio, 3),
    }
    dst = os.path.join(REPO, "BENCH", "kernel_scaling.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, default=str)
    print(json.dumps({k: out[k] for k in
                      ("per_pair_efficiency", "median_pair_efficiency",
                       "best_pair_efficiency", "median_sec")}, default=str))


if __name__ == "__main__":
    main()
