"""Round-5 wave 3: stats operators (z-score, bucketize, EWMA,
interpolation), lexical retrieval (TF-IDF, BM25, feature hashing),
PageRank, and the salted skew join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# --- EWMA ------------------------------------------------------------------

def test_ewma_hand_computed(spark):
    from supersonic_spark.operators.analytics import ewma
    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0), (2, 1, 5.0)],
        "k long, t long, x double")
    rows = {(r.k, r.t): r.ewma
            for r in ewma(df, "k", ["t"], "x", alpha=0.5).collect()}
    assert rows[(1, 1)] == 10.0
    assert rows[(1, 2)] == pytest.approx(15.0)   # 0.5*10 + 0.5*20
    assert rows[(1, 3)] == pytest.approx(22.5)   # 0.5*15 + 0.5*30
    assert rows[(2, 1)] == 5.0                   # groups independent


def test_ewma_order_is_by_order_cols_not_input_order(spark):
    from supersonic_spark.operators.analytics import ewma
    # rows delivered out of order; the kernel must sort by t first
    df = spark.createDataFrame(
        [(1, 3, 30.0), (1, 1, 10.0), (1, 2, 20.0)],
        "k long, t long, x double").repartition(3)
    rows = {r.t: r.ewma
            for r in ewma(df, "k", ["t"], "x", alpha=0.5).collect()}
    assert rows[1] == 10.0 and rows[2] == 15.0 and rows[3] == 22.5


# --- linear interpolation resample ----------------------------------------

def test_resample_interpolate_midpoints(spark):
    from supersonic_spark.operators.analytics import resample_interpolate
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:30:00", 100),
         (1, "2024-01-01 03:10:00", 400)],
        "k long, ts string, v long").withColumn(
        "ts", F.to_timestamp("ts"))
    rows = {r.h.hour: r.v
            for r in resample_interpolate(df, "k", "ts", "v").collect()}
    # observed hours carry the observation; the 2-hour gap splits 1/3 2/3
    assert rows[0] == 100.0 and rows[3] == 400.0
    assert rows[1] == pytest.approx(200.0)
    assert rows[2] == pytest.approx(300.0)


def test_resample_interpolate_observed_hours_not_interpolated(spark):
    from supersonic_spark.operators.analytics import resample_interpolate
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 10),
         (1, "2024-01-01 01:00:00", 99),
         (1, "2024-01-01 02:00:00", 20)],
        "k long, ts string, v long").withColumn(
        "ts", F.to_timestamp("ts"))
    rows = {r.h.hour: r.v
            for r in resample_interpolate(df, "k", "ts", "v").collect()}
    assert rows[1] == 99.0  # observed, NOT the 15.0 midpoint


# --- z-score flag ----------------------------------------------------------

def test_zscore_flag_hand_computed(spark):
    from supersonic_spark.operators.analytics import zscore_flag
    # group mean 20, population std 8.1650 over (10, 20, 30)
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0)], "g string, x double")
    rows = sorted(r.z for r in
                  zscore_flag(df, "x", "g", threshold=1.0).collect())
    assert rows[0] == pytest.approx(-1.2247, abs=1e-4)
    assert rows[1] == 0.0
    assert rows[2] == pytest.approx(1.2247, abs=1e-4)
    flags = {r.x: r.is_anomaly
             for r in zscore_flag(df, "x", "g", threshold=1.0).collect()}
    assert flags[10.0] and flags[30.0] and not flags[20.0]


def test_zscore_flag_broadcasts_stats(spark):
    from supersonic_spark.operators.analytics import zscore_flag
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, x double")
    plan = _plan(zscore_flag(df, "x", "g"))
    assert "BroadcastHashJoin" in plan  # fact rows never shuffle


# --- quantile bucketize ----------------------------------------------------

def test_quantile_bucketize_equal_frequency(spark):
    from supersonic_spark.operators.analytics import quantile_bucketize
    df = spark.createDataFrame([(i,) for i in range(1, 101)], "x long")
    rows = {r.bucket: r for r in
            quantile_bucketize(df, "x", 10).collect()}
    assert len(rows) == 10
    assert all(rows[b].n == 10 for b in rows)
    assert rows[1].min_val == 1 and rows[10].max_val == 100
    # buckets tile the domain in order
    assert all(rows[b].max_val < rows[b + 1].min_val for b in range(1, 10))


def test_quantile_bucketize_no_global_sort_window(spark):
    from supersonic_spark.operators.analytics import quantile_bucketize
    df = spark.createDataFrame([(i,) for i in range(1000)], "x long")
    plan = _plan(quantile_bucketize(df, "x", 10))
    # the whole point vs ntile(): no Window, no global Sort stage
    assert "Window" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# --- TF-IDF ----------------------------------------------------------------

def test_tfidf_unique_term_ranks_first(spark):
    from supersonic_spark.text.retrieval import tfidf_topk
    docs = spark.createDataFrame(
        [(1, "common zebra"),
         (2, "common common common"),
         (3, "common other other")],
        "doc_id long, text string")
    top = {r.doc_id: r.token
           for r in tfidf_topk(docs, k=1).collect()}
    # at equal tf, the doc-unique rare token beats the corpus-wide one
    assert top[1] == "zebra"
    assert top[3] == "other"


def test_tfidf_df_and_tf_counts(spark):
    from supersonic_spark.text.retrieval import tfidf_topk
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a c")], "doc_id long, text string")
    rows = {(r.doc_id, r.token): r
            for r in tfidf_topk(docs, k=5).collect()}
    assert rows[(1, "a")].tf == 2 and rows[(1, "a")].df_docs == 2
    assert rows[(1, "b")].tf == 1 and rows[(1, "b")].df_docs == 1
    assert rows[(2, "c")].df_docs == 1


# --- BM25 ------------------------------------------------------------------

def test_bm25_matches_only_and_ranks_by_relevance(spark):
    from supersonic_spark.text.retrieval import bm25_topk
    docs = spark.createDataFrame(
        [(1, "spark spark spark pad pad"),
         (2, "spark pad pad pad pad"),
         (3, "pad pad pad pad pad"),
         (4, "spark hash pad pad pad")],
        "doc_id long, text string")
    rows = bm25_topk(docs, ["spark", "hash"], k=10).collect()
    ids = [r.doc_id for r in rows]
    assert 3 not in ids                      # no query term -> absent
    assert ids[0] == 4                       # two distinct terms win
    scores = {r.doc_id: r.score for r in rows}
    assert scores[1] > scores[2]             # higher tf, same length


def test_bm25_length_normalization(spark):
    from supersonic_spark.text.retrieval import bm25_topk
    docs = spark.createDataFrame(
        [(1, "spark pad"),
         (2, "spark pad pad pad pad pad pad pad")],
        "doc_id long, text string")
    scores = {r.doc_id: r.score
              for r in bm25_topk(docs, ["spark"], k=10).collect()}
    assert scores[1] > scores[2]  # same tf, shorter doc scores higher


# --- feature hashing -------------------------------------------------------

def test_feature_hash_deterministic_and_bounded(spark):
    from supersonic_spark.text.retrieval import feature_hash
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "a")], "doc_id long, text string")
    rows = feature_hash(docs, n_features=64).collect()
    feats = {(r.doc_id, r.feature): r.cnt for r in rows}
    assert all(0 <= f < 64 for (_, f) in feats)
    # same token -> same feature id in every doc; counts aggregate
    fa1 = [f for (d, f), c in feats.items() if d == 1 and c == 2]
    fa2 = [f for (d, f), c in feats.items() if d == 2 and c == 1]
    assert len(fa1) == 1 and fa1 == fa2


# --- PageRank --------------------------------------------------------------

def test_pagerank_symmetric_pair_is_uniform(spark):
    from supersonic_spark.operators.graph import pagerank
    edges = spark.createDataFrame(
        [(1, 2), (2, 1)], "src long, dst long")
    rows = {r.id: r.pr_scaled for r in pagerank(edges).collect()}
    assert rows[1] == pytest.approx(1.0) and rows[2] == pytest.approx(1.0)


def test_pagerank_star_center_dominates(spark):
    from supersonic_spark.operators.graph import pagerank
    und = [(0, i) for i in (1, 2, 3)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long")
    rows = {r.id: r.pr_scaled for r in pagerank(edges).collect()}
    assert rows[0] > rows[1]
    assert rows[1] == rows[2] == rows[3]
    # total rank mass is conserved (sums to N after scaling)
    assert sum(rows.values()) == pytest.approx(4.0, abs=1e-3)


# --- salted join -----------------------------------------------------------

def test_salted_join_equals_plain_join_on_skew(spark):
    from supersonic_spark.operators.core import salted_join
    # one mega-key (90% of fact rows) + a tail
    fact = spark.createDataFrame(
        [(1 if i < 90 else i, i) for i in range(100)], "k long, fid long")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "k long, label string")
    got = sorted((r.k, r.fid, r.label) for r in salted_join(
        fact, dim, ["k"], F.xxhash64("fid"), n_salt=8).collect())
    want = sorted((r.k, r.fid, r.label)
                  for r in fact.join(dim, "k").collect())
    assert got == want


def test_salted_join_validates_n_salt(spark):
    from supersonic_spark.operators.core import salted_join
    df = spark.createDataFrame([(1, 1)], "k long, v long")
    with pytest.raises(ValueError):
        salted_join(df, df, ["k"], F.xxhash64("v"), n_salt=0)


def test_salted_join_joins_on_salt(spark):
    from supersonic_spark.operators.core import salted_join
    fact = spark.createDataFrame([(1, 1)], "k long, fid long")
    dim = spark.createDataFrame([(1, "x")], "k long, label string")
    out = salted_join(fact, dim, ["k"], F.xxhash64("fid"), n_salt=4)
    plan = _plan(out)
    assert "_salt" in plan          # the join key actually carries salt
    assert "_salt" not in out.columns  # and is dropped from the result


# --- merge_bucketized ------------------------------------------------------

def _mk_bucketized(spark, tmp_path, rows, n_buckets=2):
    from supersonic_spark.pipeline import bucketize_table
    df = spark.createDataFrame(rows, "conv_id long, turn_idx long, v string")
    d = str(tmp_path / "bkt")
    bucketize_table(spark, df, d, n_buckets=n_buckets, conv_key="conv_id")
    return d


def _read_sorted(spark, d):
    return sorted((r.conv_id, r.turn_idx, r.v)
                  for r in spark.read.parquet(d).collect())


def test_merge_both_ops_one_pass(spark, tmp_path):
    from supersonic_spark.pipeline import merge_bucketized
    d = _mk_bucketized(spark, tmp_path,
                       [(1, 0, "a"), (1, 1, "b"), (2, 0, "c"), (3, 0, "d")],
                       n_buckets=1)  # everything in one bucket: both ops
    changes = spark.createDataFrame(
        [(1, None, None, "delete"),          # delete conv 1
         (2, 0, "C2", "upsert"),             # replace conv 2
         (9, 0, "new", "upsert")],           # insert conv 9
        "conv_id long, turn_idx long, v string, _op string")
    affected = merge_bucketized(spark, changes, d)
    assert affected == [0]
    assert _read_sorted(spark, d) == [(2, 0, "C2"), (3, 0, "d"),
                                      (9, 0, "new")]


def test_merge_untouched_buckets_not_rewritten(spark, tmp_path):
    import os
    from pyspark.sql import functions as F
    from supersonic_spark.pipeline import merge_bucketized
    rows = [(c, 0, f"v{c}") for c in range(40)]
    d = _mk_bucketized(spark, tmp_path, rows, n_buckets=8)
    before = set(os.listdir(d))
    # one conv -> exactly one bucket affected
    changes = spark.createDataFrame([(7, 0, "V7", "upsert")],
                                    "conv_id long, turn_idx long, "
                                    "v string, _op string")
    affected = merge_bucketized(spark, changes, d)
    assert len(affected) == 1
    after = set(os.listdir(d))
    # exactly one part file replaced; the other 7 byte-untouched
    assert len(before - after) == 1 and len(after - before) == 1
    got = _read_sorted(spark, d)
    assert (7, 0, "V7") in got and (7, 0, "v7") not in got
    assert len(got) == 40


def test_merge_emptied_bucket_keeps_positional_file(spark, tmp_path):
    from supersonic_spark.pipeline import merge_bucketized
    # n_buckets=2: delete every conv in one bucket
    rows = [(c, 0, f"v{c}") for c in range(10)]
    d = _mk_bucketized(spark, tmp_path, rows, n_buckets=2)
    from pyspark.sql import functions as F
    df = spark.read.parquet(d)
    b0 = [r.conv_id for r in
          df.select("conv_id")
            .filter(F.pmod(F.hash("conv_id"), F.lit(2)) == 0).collect()]
    changes = spark.createDataFrame(
        [(c, None, None, "delete") for c in b0],
        "conv_id long, turn_idx long, v string, _op string")
    merge_bucketized(spark, changes, d)
    import os
    import re
    parts = sorted(p for p in os.listdir(d)
                   if re.match(r"part-\d{5}-", p))
    assert len(parts) == 2  # empty bucket file survives positionally
    got = _read_sorted(spark, d)
    assert len(got) == 10 - len(b0)
    assert all(c not in b0 for c, _, _ in got)


def test_merge_rejects_unknown_op(spark, tmp_path):
    from supersonic_spark.pipeline import merge_bucketized
    d = _mk_bucketized(spark, tmp_path, [(1, 0, "a")])
    changes = spark.createDataFrame(
        [(1, 0, "x", "update")],
        "conv_id long, turn_idx long, v string, _op string")
    with pytest.raises(ValueError, match="unknown merge op"):
        merge_bucketized(spark, changes, d)


def test_merge_delete_of_absent_key_is_noop(spark, tmp_path):
    from supersonic_spark.pipeline import merge_bucketized
    d = _mk_bucketized(spark, tmp_path, [(1, 0, "a"), (2, 0, "b")])
    changes = spark.createDataFrame(
        [(999, None, None, "delete")],
        "conv_id long, turn_idx long, v string, _op string")
    before = _read_sorted(spark, d)
    merge_bucketized(spark, changes, d)
    assert _read_sorted(spark, d) == before


# --- HyperLogLog -----------------------------------------------------------

def test_hll_accuracy_within_error_bound(spark):
    from supersonic_spark.functions.sketches import hll_distinct
    n = 20000
    df = spark.range(n).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v", b=8).collect()[0].est_distinct
    # standard error 1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(est - n) / n < 0.26


def test_hll_small_range_linear_counting_is_tight(spark):
    from supersonic_spark.functions.sketches import hll_distinct
    df = spark.range(30).select(F.col("id").alias("v"))
    est = hll_distinct(df, "v", b=8).collect()[0].est_distinct
    # linear counting regime: very tight at n << m
    assert abs(est - 30) <= 3


def test_hll_registers_merge_by_max(spark):
    from supersonic_spark.functions.sketches import (hll_estimate,
                                                     hll_registers)
    a = spark.range(0, 5000).select(F.col("id").alias("v"))
    b_ = spark.range(2500, 7500).select(F.col("id").alias("v"))
    both = a.unionAll(b_)
    direct = hll_registers(both, "v").collect()
    merged = (hll_registers(a, "v").unionAll(hll_registers(b_, "v"))
              .groupBy("bucket").agg(F.max("mj").alias("mj")).collect())
    assert sorted((r.bucket, r.mj) for r in direct) == \
           sorted((r.bucket, r.mj) for r in merged)
    # and therefore identical estimates
    e1 = hll_estimate(hll_registers(both, "v")).collect()[0].est_distinct
    reg = (hll_registers(a, "v").unionAll(hll_registers(b_, "v"))
           .groupBy("bucket").agg(F.max("mj").alias("mj")))
    e2 = hll_estimate(reg).collect()[0].est_distinct
    assert e1 == e2


def test_hll_insensitive_to_duplication_and_partitioning(spark):
    from supersonic_spark.functions.sketches import hll_distinct
    df = spark.range(1000).select(F.col("id").alias("v"))
    dup = df.unionAll(df).unionAll(df).repartition(13)
    e1 = hll_distinct(df, "v", b=8).collect()[0].est_distinct
    e2 = hll_distinct(dup, "v", b=8).collect()[0].est_distinct
    assert e1 == e2


def test_hll_validates_b(spark):
    from supersonic_spark.functions.sketches import hll_registers
    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError):
        hll_registers(df, "v", b=2)


# --- streaming MERGE sink --------------------------------------------------

def test_merge_stream_sink_applies_microbatches(spark, tmp_path):
    from supersonic_spark.pipeline import bucketize_table
    from supersonic_spark.streaming.jobs import merge_stream_sink
    base = [(c, 0, f"v{c}") for c in range(20)]
    d = str(tmp_path / "bkt")
    bucketize_table(spark,
                    spark.createDataFrame(
                        base, "conv_id long, turn_idx long, v string"),
                    d, n_buckets=4, conv_key="conv_id")
    # change files (disjoint keys so micro-batch order is irrelevant):
    # delete 0..4, replace 10..12, insert 100..101
    src = str(tmp_path / "changes")
    ch = ([(c, None, None, "delete") for c in range(5)]
          + [(c, 0, f"UP{c}", "upsert") for c in (10, 11, 12)]
          + [(c, 0, "new", "upsert") for c in (100, 101)])
    spark.createDataFrame(
        ch, "conv_id long, turn_idx long, v string, _op string") \
        .repartition(3).write.parquet(src)
    stream = (spark.readStream
              .schema("conv_id long, turn_idx long, v string, _op string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = merge_stream_sink(stream, d,
                          checkpoint=str(tmp_path / "ckpt")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {(r.conv_id): r.v for r in spark.read.parquet(d).collect()}
    assert all(c not in got for c in range(5))
    assert all(got[c] == f"UP{c}" for c in (10, 11, 12))
    assert got[100] == "new" and got[101] == "new"
    assert len(got) == 20 - 5 + 2


def test_merge_stream_sink_replay_is_idempotent(spark, tmp_path):
    from supersonic_spark.pipeline import bucketize_table, merge_bucketized
    d = str(tmp_path / "bkt")
    bucketize_table(spark,
                    spark.createDataFrame(
                        [(1, 0, "a"), (2, 0, "b")],
                        "conv_id long, turn_idx long, v string"),
                    d, n_buckets=2, conv_key="conv_id")
    ch = spark.createDataFrame(
        [(1, None, None, "delete"), (2, 0, "B", "upsert")],
        "conv_id long, turn_idx long, v string, _op string")
    merge_bucketized(spark, ch, d)   # the batch
    once = sorted((r.conv_id, r.v)
                  for r in spark.read.parquet(d).collect())
    merge_bucketized(spark, ch, d)   # its at-least-once replay
    twice = sorted((r.conv_id, r.v)
                   for r in spark.read.parquet(d).collect())
    assert once == twice == [(2, "B")]


def test_merge_stream_sink_whole_conversations_per_batch(spark, tmp_path):
    # the sink contract: multi-row conversations survive when change
    # files are conversation-aligned (repartition by conv_id)
    from supersonic_spark.pipeline import bucketize_table
    from supersonic_spark.streaming.jobs import merge_stream_sink
    d = str(tmp_path / "bkt")
    bucketize_table(spark,
                    spark.createDataFrame(
                        [(1, 0, "a"), (2, 0, "b")],
                        "conv_id long, turn_idx long, v string"),
                    d, n_buckets=2, conv_key="conv_id")
    # conv 1 replaced by a 5-turn conversation
    ch = [(1, t, f"T{t}", "upsert") for t in range(5)]
    src = str(tmp_path / "chg")
    spark.createDataFrame(
        ch, "conv_id long, turn_idx long, v string, _op string") \
        .repartition(2, "conv_id").write.parquet(src)
    stream = (spark.readStream
              .schema("conv_id long, turn_idx long, v string, _op string")
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = merge_stream_sink(stream, d,
                          checkpoint=str(tmp_path / "ck")) \
        .trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = sorted((r.conv_id, r.turn_idx, r.v)
                 for r in spark.read.parquet(d).collect())
    assert got == [(1, t, f"T{t}") for t in range(5)] + [(2, 0, "b")]


# --- as-of join directions -------------------------------------------------

def _asof_frames(spark):
    left = spark.createDataFrame(
        [(1, 10, "l10"), (1, 20, "l20"), (1, 35, "l35")],
        "k long, t long, lv string")
    right = spark.createDataFrame(
        [(1, 8, "r8"), (1, 20, "r20"), (1, 30, "r30")],
        "k long, t long, rv string")
    return left, right


def test_asof_forward_earliest_at_or_after(spark):
    from supersonic_spark.operators.asof import as_of_join
    left, right = _asof_frames(spark)
    got = {r.t: r.rv for r in as_of_join(
        left, right, "k", "t", ["rv"], direction="forward").collect()}
    assert got == {10: "r20", 20: "r20", 35: None}  # ties match; none after 30


def test_asof_nearest_picks_closer_side(spark):
    from supersonic_spark.operators.asof import as_of_join
    left, right = _asof_frames(spark)
    got = {r.t: r.rv for r in as_of_join(
        left, right, "k", "t", ["rv"], direction="nearest").collect()}
    assert got[10] == "r8"    # |10-8|=2 < |20-10|=10
    assert got[20] == "r20"   # exact match, delta 0
    assert got[35] == "r30"   # nothing after -> backward
    # equidistant resolves backward
    l2 = spark.createDataFrame([(1, 19, "x")], "k long, t long, lv string")
    r2 = spark.createDataFrame([(1, 17, "lo"), (1, 21, "hi")],
                               "k long, t long, rv string")
    got2 = as_of_join(l2, r2, "k", "t", ["rv"],
                      direction="nearest").collect()[0].rv
    assert got2 == "lo"


def test_asof_nearest_timestamp_subsecond(spark):
    import datetime as dt
    from supersonic_spark.operators.asof import as_of_join
    b = dt.datetime(2024, 1, 1, 12, 0, 0)
    us = dt.timedelta(microseconds=1)
    left = spark.createDataFrame([(1, b, "l")], "k long, t timestamp, lv string")
    right = spark.createDataFrame(
        [(1, b - 3 * us, "before"), (1, b + 2 * us, "after")],
        "k long, t timestamp, rv string")
    got = as_of_join(left, right, "k", "t", ["rv"],
                     direction="nearest").collect()[0].rv
    assert got == "after"  # 2us forward beats 3us backward


def test_asof_rejects_unknown_direction(spark):
    from supersonic_spark.operators.asof import as_of_join
    left, right = _asof_frames(spark)
    with pytest.raises(ValueError, match="direction"):
        as_of_join(left, right, "k", "t", ["rv"], direction="sideways")
