"""Tests for as-of/range joins, job-spec seam, spy, and the custom
stateful streaming operator."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from supersonic_spark.operators.asof import as_of_join, range_join
from supersonic_spark.operators.spy import spy
from supersonic_spark.plans.jobspec import build_job


def rows(df, *cols):
    sel = df.select(*cols) if cols else df
    return [tuple(r) for r in sel.collect()]


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 7, "d")],
        "k int, t long, tag string")
    right = spark.createDataFrame(
        [(1, 10, 100), (1, 15, 150), (2, 99, 990)], "k int, t long, v int")
    out = as_of_join(left, right, key="k", on="t", value_cols=["v"])
    got = {r["tag"]: r["v"] for r in out.collect()}
    assert got == {"a": 100,   # tie: <= includes equal ts
                   "b": 150,   # latest preceding
                   "c": None,  # nothing before -> left-outer null
                   "d": None}  # right exists but only later


def test_range_join(spark):
    pts = spark.createDataFrame([(1, 5), (1, 25), (2, 5)], "k int, x int")
    ivs = spark.createDataFrame([(1, 0, 10, "lo"), (1, 20, 30, "hi")],
                                "k int, lo int, hi int, band string")
    out = range_join(pts, ivs, "k", "x", "lo", "hi")
    got = sorted((r["x"], r["band"]) for r in out.collect())
    assert got == [(5, "lo"), (25, "hi")]


def test_jobspec_build_and_errors(spark):
    spec = {"table": "/root/testdata/sf0.001/orders.parquet",
            "filter": "o_orderstatus = 'F'",
            "group_by": ["o_orderpriority"],
            "aggregations": {"n": "count(*)"},
            "sort": [{"column": "n", "order": "desc"}], "limit": 2}
    out = build_job(spark, spec)
    assert out.count() == 2
    with pytest.raises(ValueError, match="unknown job-spec keys"):
        build_job(spark, {"table": "x", "bogus": 1})
    with pytest.raises(ValueError, match="unknown columns"):
        build_job(spark, {"table": "/root/testdata/sf0.001/orders.parquet",
                          "columns": ["nope"]})


def test_spy_observation(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "i int")
    wired, obs = spy(df.filter(F.col("i") >= 4), "tap",
                     extra={"sum_i": F.sum("i")})
    assert wired.count() == 6
    assert obs.get["rows"] == 6 and obs.get["sum_i"] == 39


def test_stateful_streaming_conv_stats(spark, tmp_path):
    """State persists across micro-batches (maxFilesPerTrigger=1 makes
    each input file its own batch)."""
    from supersonic_spark.streaming.stateful import running_conv_stats
    base = dt.datetime(2024, 1, 1)
    batch1 = [("c1", 0, "system", base), ("c1", 1, "user", base.replace(minute=1))]
    batch2 = [("c1", 2, "assistant", base.replace(minute=2)),
              ("c2", 0, "system", base)]
    schema = "conv_id string, turn_idx int, role string, ts timestamp"
    src = tmp_path / "stream_src"
    spark.createDataFrame(batch1, schema).coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f1"))
    spark.createDataFrame(batch2, schema).coalesce(1) \
        .write.mode("append").parquet(str(src / "f2"))

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src) + "/*"))
    out_dir = str(tmp_path / "out")
    q = (running_conv_stats(stream).writeStream
         .format("memory").queryName("conv_stats")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM conv_stats").collect()
    # last update per conversation wins
    final = {}
    for r in got:
        final[r["conv_id"]] = max(final.get(r["conv_id"], 0), r["n_turns"])
    assert final["c1"] == 3, f"state did not accumulate: {got}"
    assert final["c2"] == 1
    by_conv = {r["conv_id"]: r for r in got if r["n_turns"] == final[r["conv_id"]]}
    assert by_conv["c1"]["max_turn_idx"] == 2
    assert by_conv["c1"]["last_role"] == "assistant"


def test_streaming_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with watermark: a row older than
    (max event time - watermark) arriving in a later batch is dropped."""
    import datetime as dt
    from supersonic_spark.streaming import windowed_event_counts

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    schema = "ts timestamp, event_type string, value double"
    src = tmp_path / "wm_src"
    import time
    # Spark filters late input against the PREVIOUS batch's watermark and
    # evicts state with the updated one, so the late row must arrive two
    # batches after the event-time advance to be provably dropped.
    batches = [
        [(base, "a", 1.0), (base.replace(minute=5), "a", 1.0)],  # window rows
        [(base.replace(hour=2), "a", 1.0)],   # advance -> wm 01:30 next batch
        [(base.replace(hour=3), "a", 1.0)],   # wm 01:30 now active for filter
        [(base.replace(minute=1), "a", 1.0)],  # 89min late -> dropped
    ]
    for i, b in enumerate(batches):
        spark.createDataFrame(b, schema).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
        time.sleep(1.5)  # file source orders batches by mtime

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(str(src) + "/*"))
    out = windowed_event_counts(stream, window="10 minutes",
                                watermark="30 minutes")
    q = (out.writeStream.format("memory").queryName("wm_counts")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = {(r["win_start"], r["n"]) for r in
           spark.sql("SELECT * FROM wm_counts").collect()}
    # the first window finalized with 2 rows; the late row did not bump it
    assert (base, 2) in got, f"expected finalized window with n=2, got {got}"
    assert (base, 3) not in got
    dropped = sum(p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
                  for p in q.recentProgress)
    assert dropped >= 1, "late row was not dropped by the watermark"


def test_table_fingerprint_changes_with_content(spark, tmp_path):
    from supersonic_spark.sources import table_fingerprint, load_table, write_table
    p = str(tmp_path / "fp_tbl")
    df = spark.createDataFrame([(1, "a")], "i int, s string")
    write_table(df, p)
    fp1 = table_fingerprint(spark, p)
    assert load_table(spark, p).count() == 1
    import time
    time.sleep(1.1)  # mtime resolution
    write_table(spark.createDataFrame([(2, "b")], "i int, s string"), p)
    fp2 = table_fingerprint(spark, p)
    assert fp1 != fp2, "fingerprint must change when the input changes"


def test_ivf_topk_recall(spark):
    """IVF with full probing is exact; with partial probing the query's
    own cell always contains the query vector."""
    import numpy as np
    from supersonic_spark.ann import (cosine_topk, ivf_topk, train_centroids)
    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 8)).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(200)],
        "vec_id long, embedding array<float>")
    cents = train_centroids(df, k=4)
    assert len(cents) == 4 and len(cents[0]) == 8
    q = [float(x) for x in vecs[17]]
    exact = [r["vec_id"] for r in cosine_topk(df, q, 5).collect()]
    approx_full = [r["vec_id"] for r in
                   ivf_topk(df, q, 5, cents, n_probe=4).collect()]
    assert approx_full == exact, "full-probe IVF must equal exact"
    approx = [r["vec_id"] for r in ivf_topk(df, q, 5, cents, n_probe=2).collect()]
    assert 17 in approx, "query's own vector must be found"
