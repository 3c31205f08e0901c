"""Operator-semantics tests on hand-built golden frames — the analogue of
the reference's OperationTest golden-data fixtures
(supersonic/testing/operation_testing.h:36-66)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, Window
from pyspark.sql import functions as F

from supersonic_spark.operators import (coalesce_zip, extended_sort,
                                        foreign_filter,
                                        group_aggregate_with_limit,
                                        hash_join, limit_offset,
                                        merge_union_all, rowid_merge_join)
from supersonic_spark.functions import (changed, running_min_with_flush,
                                        running_sum, smudge, smudge_if)


def rows(df, *cols):
    sel = df.select(*cols) if cols else df
    return [tuple(r) for r in sel.collect()]


def test_hash_join_inner_and_left(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (3, 30.0), (3, 31.0)], "k int, w double")
    inner = hash_join(left, right, ["k"], "inner")
    assert sorted(rows(inner)) == [(1, "a", 10.0), (3, "c", 30.0), (3, "c", 31.0)]
    left_j = hash_join(left, right, ["k"], "left")
    assert sorted(rows(left_j), key=str) == sorted(
        [(1, "a", 10.0), (2, "b", None), (3, "c", 30.0), (3, "c", 31.0)], key=str)
    with pytest.raises(ValueError):
        hash_join(left, right, ["k"], "full")  # reference supports 2 types


def test_hash_join_rhs_unique_broadcast_plan(spark):
    left = spark.createDataFrame([(1, "a")], "k int, v string")
    right = spark.createDataFrame([(1, 10.0), (1, 10.0)], "k int, w double")
    j = hash_join(left, right, ["k"], "inner", rhs_unique=True)
    assert rows(j) == [(1, "a", 10.0)]  # deduped build side
    assert "BroadcastHashJoin" in j._jdf.queryExecution().executedPlan().toString()


def test_foreign_filter_semi_semantics(spark):
    fact = spark.createDataFrame([(1,), (2,), (2,), (9,)], "fk int")
    keys = spark.createDataFrame([(2,), (9,), (9,)], "k int")
    out = foreign_filter(fact, keys, "fk", "k")
    assert sorted(rows(out)) == [(2,), (2,), (9,)]  # no duplication from keys


def test_rowid_merge_join(spark):
    left = spark.createDataFrame([(0,), (2,), (2,)], "fk int")
    right = spark.createDataFrame([("x",), ("y",), ("z",)], "name string")
    out = rowid_merge_join(left, right, "fk", ["name"])
    assert sorted(rows(out)) == [(0, "x"), (2, "z"), (2, "z")]


def test_coalesce_zip(spark):
    a = spark.createDataFrame([(1, "a"), (2, "b")], "i int, s string")
    b = spark.createDataFrame([(10.0,), (20.0,)], "d double")
    out = coalesce_zip(a, b)
    assert sorted(rows(out)) == [(1, "a", 10.0), (2, "b", 20.0)]


def test_extended_sort_nulls_first_and_ci_topk(spark):
    df = spark.createDataFrame(
        [(None, 1), ("B", 2), ("a", 3), ("A", 4)], "s string, i int")
    out = extended_sort(df, [("s", "asc"), ("i", "asc")], case_sensitive=False)
    got = rows(out)
    assert got[0] == (None, 1)          # NULLs smaller than everything
    assert {got[1][0], got[2][0]} == {"a", "A"}  # CI groups a/A together
    top = extended_sort(df, [("i", "desc")], limit=2)
    assert rows(top, "i") == [(4,), (3,)]


def test_limit_offset(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], "i int")
    out = limit_offset(df, limit=3, offset=4, order=["i"])
    assert rows(out) == [(4,), (5,), (6,)]


def test_merge_union_all_keeps_duplicates(spark):
    a = spark.createDataFrame([(1,), (2,)], "i int")
    b = spark.createDataFrame([(2,), (3,)], "i int")
    assert sorted(rows(merge_union_all([a, b]))) == [(1,), (2,), (2,), (3,)]


def test_group_aggregate_with_limit(spark):
    data = [("k%d" % (i % 7), 1) for i in range(70)] + [("big", 1000)]
    df = spark.createDataFrame(data, "key string, v long")
    out = group_aggregate_with_limit(df, "key", "v", 2)
    got = {r[0]: (r[1], r[2]) for r in rows(out)}
    assert got["big"] == (1000, 1)
    assert "__other__" in got
    assert sum(v[1] for v in got.values()) == 71  # all rows accounted for


def test_stateful_expressions(spark):
    df = spark.createDataFrame(
        [(1, 1, 5, False), (1, 2, None, False), (1, 3, 3, True),
         (1, 4, 9, False), (2, 1, 7, False)],
        "g int, o int, v int, flush boolean")
    w = Window.partitionBy("g").orderBy("o")
    out = df.select(
        "g", "o",
        changed(F.col("v"), w).alias("chg"),
        running_sum(F.col("v"), w).alias("rsum"),
        smudge(F.col("v"), w).alias("locf"),
        running_min_with_flush(F.col("v"), F.col("flush"),
                               [F.col("g")], [F.col("o")]).alias("rmin"),
        smudge_if(F.col("v"), F.col("v").isNull(), w).alias("fillna"),
    ).orderBy("g", "o")
    got = rows(out)
    # g=1: v = 5, NULL, 3, 9
    assert [r[3] for r in got[:4]] == [5, 5, 8, 17]          # rsum skips NULL
    assert [r[4] for r in got[:4]] == [5, 5, 3, 9]           # LOCF
    assert [r[5] for r in got[:4]] == [5, 5, 3, 3]           # min reset at flush
    assert [r[6] for r in got[:4]] == [5, 5, 3, 9]           # smudge_if fills null
    assert got[4][2] is True                                  # first row changed


def test_multimodal_meta(spark):
    from supersonic_spark.multimodal import extract_media_meta
    df = spark.createDataFrame(
        [(1, b"\x89PNG0123"), (2, None), (3, b"")],
        "id long, payload binary")
    out = {r["id"]: r for r in extract_media_meta(df, "id", "payload").collect()}
    assert out[1]["n_bytes"] == 8 and out[1]["crc32"] is not None
    assert out[1]["width"] >= 64 and out[1]["fake_mean"] > 0
    assert out[2]["n_bytes"] is None and out[3]["n_bytes"] is None


def test_windowed_event_counts_batch_semantics(spark):
    from supersonic_spark.streaming import windowed_event_counts
    import datetime as dt
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows_in = [(base + dt.timedelta(minutes=m), "a", 1.0) for m in range(25)]
    df = spark.createDataFrame(rows_in, "ts timestamp, event_type string, value double")
    # watermark is a no-op on batch frames; windows still apply
    out = windowed_event_counts(df, window="10 minutes").orderBy("win_start")
    got = rows(out, "n")
    assert [r[0] for r in got] == [10, 10, 5]


def test_streaming_encode_sink(spark, tmp_path):
    from supersonic_spark.datagen import generate_transcripts
    from supersonic_spark.streaming import streaming_encode_sink
    from supersonic_spark.pipeline import decode_table

    src_dir = str(tmp_path / "src")
    generate_transcripts(spark, n_convs=50, seed=1, mega_every=0) \
        .write.mode("overwrite").parquet(src_dir)
    n_src = spark.read.parquet(src_dir).count()

    stream = (spark.readStream.schema(spark.read.parquet(src_dir).schema)
              .parquet(src_dir))
    q = streaming_encode_sink(spark, stream, str(tmp_path / "enc"),
                              str(tmp_path / "ckpt")).start()
    q.awaitTermination(120)
    epochs = [p for p in (tmp_path / "enc").iterdir() if p.name.startswith("epoch=")]
    assert epochs, "no epochs written"
    total = 0
    for e in epochs:
        total += decode_table(spark, str(e)).count()
    assert total == n_src


def test_ann_exact(spark):
    from supersonic_spark.ann import cosine_topk, lsh_topk
    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.9, 0.1]), (4, [-1.0, 0.0])],
        "vec_id long, embedding array<float>")
    top = cosine_topk(df, [1.0, 0.0], 2)
    assert [r["vec_id"] for r in top.collect()] == [1, 3]
    # lsh bucket of the query always contains the query vector itself
    approx = lsh_topk(df, [1.0, 0.0], 2, n_planes=4)
    ids = [r["vec_id"] for r in approx.collect()]
    assert 1 in ids
