"""Batch-vs-streaming equivalence: the same input rows through the same
windowed aggregations must produce identical results whether read as a
static DataFrame or replayed through Structured Streaming (availableNow
micro-batches + memory sink). This anchors the streaming claims to a
correctness oracle (the batch plan) beyond unit shape tests.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _event_rows():
    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    for i in range(400):
        # irregular gaps so session windows split; several users and types
        gap = (i * 7) % 23
        rows.append((base + dt.timedelta(minutes=i * 3 + gap, seconds=i % 50),
                     i % 5, ["view", "click", "buy"][i % 3],
                     round((i * 13 % 97) / 7, 2)))
    return rows


_SCHEMA = "ts timestamp, user_id int, event_type string, value double"


def _write_src(spark, tmp_path):
    src = str(tmp_path / "events_src")
    spark.createDataFrame(_event_rows(), _SCHEMA) \
         .repartition(4).write.mode("overwrite").parquet(src)
    return src


def _run_stream(spark, stream_df, name):
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _sorted_rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from supersonic_spark.streaming import windowed_event_counts
    src = _write_src(spark, tmp_path)
    schema = spark.read.parquet(src).schema

    batch = windowed_event_counts(spark.read.parquet(src),
                                  window="10 minutes")
    stream = windowed_event_counts(
        spark.readStream.schema(schema).parquet(src), window="10 minutes")
    got = _run_stream(spark, stream, "wec_equiv")

    assert _sorted_rows(got) == _sorted_rows(batch)


def test_session_windows_stream_equals_batch(spark, tmp_path):
    src = _write_src(spark, tmp_path)
    schema = spark.read.parquet(src).schema

    def sessionize(df, watermark=None):
        if watermark:
            df = df.withWatermark("ts", watermark)
        return (df.groupBy(F.session_window("ts", "10 minutes").alias("sw"),
                           "user_id")
                .agg(F.count("*").alias("n"),
                     F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                     .alias("sum_cents"))
                .select("user_id", F.col("sw.start").alias("sess_start"),
                        F.col("sw.end").alias("sess_end"), "n", "sum_cents"))

    batch = sessionize(spark.read.parquet(src))
    stream = sessionize(spark.readStream.schema(schema).parquet(src),
                        watermark="2 hours")
    got = _run_stream(spark, stream, "sess_equiv")

    assert _sorted_rows(got) == _sorted_rows(batch)
