"""Structured Streaming jobs: windowed aggregation with watermarks, and a
streaming encode sink (foreachBatch -> the same codec pipeline).

The reference has no streaming at all; its closest notion is stateful
running expressions over one ordered pass (stateful_expressions.h:17-21).
Here those semantics extend naturally: event-time windows + watermark for
late data, and per-micro-batch encoding for a continuously-appended
transcript table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def windowed_event_counts(events: DataFrame,
                          window: str = "10 minutes",
                          slide: str | None = None,
                          watermark: str = "30 minutes") -> DataFrame:
    """Tumbling/sliding window counts with late-data handling.
    events needs (ts timestamp, event_type string, value double)."""
    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (events.withWatermark("ts", watermark)
            .groupBy(w.alias("win"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.round(F.col("value") * 100, 0).cast("long"))
                 .alias("sum_cents"))
            .select(F.col("win.start").alias("win_start"),
                    F.col("win.end").alias("win_end"),
                    "event_type", "n", "sum_cents"))


def streaming_encode_sink(spark: SparkSession, stream: DataFrame,
                          out_dir: str, checkpoint_dir: str,
                          conv_key: str = "conv_id"):
    """writeStream.foreachBatch sink that runs each micro-batch through
    the codec encode pipeline — encoded block files accrete per batch,
    each batch checkpointed by Structured Streaming itself (exactly-once
    per epoch id)."""
    from ..pipeline import EncodeConfig, encode_table

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cfg = EncodeConfig(n_partitions=max(
            batch_df.sparkSession.sparkContext.defaultParallelism, 2))
        encode_table(batch_df.sparkSession, batch_df,
                     f"{out_dir}/epoch={epoch_id}", cfg,
                     fingerprint=f"epoch-{epoch_id}")

    return (stream.writeStream
            .foreachBatch(sink)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True))
