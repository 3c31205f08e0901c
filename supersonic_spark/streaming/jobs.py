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


def decode_stream(spark: SparkSession, out_dir: str,
                  schema=None) -> DataFrame:
    """Streaming DECODE source — the reader half of
    streaming_encode_sink: watch `out_dir` (recursively, e.g. the
    sink's epoch=N/blocks dirs) for new .ssb block files and decode
    each exactly once as it lands. Built on the binaryFile file source,
    so Structured Streaming's own file tracking provides the
    exactly-once-per-file guarantee; decoding stays in the same Arrow
    kernel as batch decode_table. Pass `schema` (StructType or DDL) or
    let it load from the first epoch's meta.json."""
    import glob as _glob
    import json as _json
    import os as _os
    from pyspark.sql.types import StructType
    if schema is None:
        metas = sorted(_glob.glob(_os.path.join(out_dir, "**", "meta.json"),
                                  recursive=True))
        if not metas:
            raise ValueError("no meta.json under out_dir yet; pass schema=")
        with open(metas[0]) as f:
            schema = StructType.fromJson(_json.load(f)["spark_schema"])

    src = (spark.readStream.format("binaryFile")
           # file streaming sources demand an explicit schema; binaryFile's
           # is fixed by the format
           .schema("path string, modificationTime timestamp, "
                   "length long, content binary")
           .option("pathGlobFilter", "*.ssb")
           .option("recursiveFileLookup", "true")
           .load(out_dir))

    def dec(batches):
        from ..runtime import pin_worker_threads
        pin_worker_threads()
        from ..codecs import decode_block as _db
        for batch in batches:
            for blob in batch.column(0):
                buf = blob.as_py()
                off = 0
                while off < len(buf):
                    t, used = _db(buf, off)
                    off += used
                    yield from t.to_batches()

    return src.select("content").mapInArrow(dec, schema=schema)
