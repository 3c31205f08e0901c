"""Round-5 wave 5f: conversation integrity auditing, count-min sketch,
text normalization, bloom runtime-filter semi join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _ts(minute):
    return dt.datetime(2024, 1, 1, 12, minute)


CONV_SCHEMA = "conv_id string, turn_idx int, role string, text string, " \
              "ts timestamp_ntz"


def _audit(spark, rows):
    from supersonic_spark.conversations import integrity_report
    df = spark.createDataFrame(rows, CONV_SCHEMA)
    return {r["check"]: r["violations"]
            for r in integrity_report(df).collect()}


# --- integrity audit ---------------------------------------------------------

def test_integrity_clean_conversation_all_zero(spark):
    rows = [("c1", 0, "user", "hi", _ts(0)),
            ("c1", 1, "assistant", "hello", _ts(1)),
            ("c1", 2, "user", "bye", _ts(2))]
    assert _audit(spark, rows) == {
        "turn_gap": 0, "role_repeat": 0, "ts_regression": 0,
        "empty_text": 0, "first_turn": 0}


def test_integrity_each_violation_counted(spark):
    rows = [
        # c1: gap between 0 and 2, ts regression at turn 2, blank turn 2
        ("c1", 0, "user", "hi", _ts(5)),
        ("c1", 2, "assistant", "  ", _ts(3)),
        # c2: starts at turn 1 (bad first), role repeat user->user
        ("c2", 1, "user", "a", _ts(0)),
        ("c2", 2, "user", "b", _ts(1)),
        # c3: first role is assistant (bad first), NULL text counts empty
        ("c3", 0, "assistant", None, _ts(0)),
    ]
    assert _audit(spark, rows) == {
        "turn_gap": 1,        # c1 0->2 (c2's 1->2 pair is consecutive)
        "role_repeat": 1,
        "ts_regression": 1,
        "empty_text": 2,      # c1 blank + c3 NULL
        "first_turn": 2,      # c2 starts at 1, c3 starts with assistant
    }


def test_integrity_tool_runs_are_exempt_from_alternation(spark):
    rows = [("c1", 0, "user", "q", _ts(0)),
            ("c1", 1, "tool", "r1", _ts(1)),
            ("c1", 2, "tool", "r2", _ts(2)),
            ("c1", 3, "assistant", "a", _ts(3))]
    rep = _audit(spark, rows)
    assert rep["role_repeat"] == 0


def test_conversation_stats_exact(spark):
    from supersonic_spark.conversations import conversation_stats
    rows = [("c1", 0, "user", "one two three", _ts(0)),
            ("c1", 1, "assistant", "four", _ts(2)),
            ("c1", 2, "tool", "", _ts(2)),
            ("c2", 0, "user", "x", _ts(0))]
    df = spark.createDataFrame(rows, CONV_SCHEMA)
    got = {r["conv_id"]: r.asDict() for r in conversation_stats(df).collect()}
    assert got["c1"] == {"conv_id": "c1", "n_turns": 3, "n_user": 1,
                         "n_assistant": 1, "n_tool": 1, "n_tokens": 4,
                         "span_sec": 120}
    assert got["c2"]["n_turns"] == 1 and got["c2"]["span_sec"] == 0


def test_conversation_stats_subsecond_span_floors(spark):
    from supersonic_spark.conversations import conversation_stats
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0, 600_000)
    t1 = dt.datetime(2024, 1, 1, 12, 0, 2, 100_000)   # span 1.5s -> 1
    df = spark.createDataFrame(
        [("c1", 0, "user", "a", t0), ("c1", 1, "assistant", "b", t1)],
        CONV_SCHEMA)
    assert conversation_stats(df).collect()[0]["span_sec"] == 1


# --- count-min sketch --------------------------------------------------------

def _freqs(spark, values):
    return spark.createDataFrame([(v,) for v in values], "k string")


def test_cms_estimates_upper_bound_and_exact_when_sparse(spark):
    from supersonic_spark.functions.sketches import (cms_point_estimates,
                                                     cms_registers)
    vals = ["a"] * 50 + ["b"] * 20 + ["c"] * 5
    df = _freqs(spark, vals)
    reg = cms_registers(df, "k", d=4, w=512)
    keys = df.select("k").distinct()
    est = {r["key"]: r["est_count"]
           for r in cms_point_estimates(reg, keys, "k", d=4, w=512).collect()}
    true = {"a": 50, "b": 20, "c": 5}
    for k, t in true.items():
        assert est[k] >= t                    # CMS never underestimates
    # 3 keys in 4x512 cells: collisions essentially impossible -> exact
    assert est == true


def test_cms_overestimates_under_forced_collisions(spark):
    from supersonic_spark.functions.sketches import (cms_point_estimates,
                                                     cms_registers)
    vals = [f"k{i}" for i in range(200) for _ in range(3)]
    df = _freqs(spark, vals)
    reg = cms_registers(df, "k", d=2, w=8)    # 200 keys into 16 cells
    keys = df.select("k").distinct()
    est = cms_point_estimates(reg, keys, "k", d=2, w=8).collect()
    assert all(r["est_count"] >= 3 for r in est)
    assert any(r["est_count"] > 3 for r in est)


def test_cms_registers_merge_cellwise(spark):
    from supersonic_spark.functions.sketches import cms_registers
    a = _freqs(spark, ["x"] * 7 + ["y"] * 2)
    b = _freqs(spark, ["x"] * 3 + ["z"] * 4)
    full = _freqs(spark, ["x"] * 10 + ["y"] * 2 + ["z"] * 4)
    merged = (cms_registers(a, "k", d=3, w=64)
              .unionAll(cms_registers(b, "k", d=3, w=64))
              .groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt")))
    want = {(r["row"], r["bucket"]): r["cnt"]
            for r in cms_registers(full, "k", d=3, w=64).collect()}
    got = {(r["row"], r["bucket"]): r["cnt"] for r in merged.collect()}
    assert got == want


def test_cms_weighted_and_turnstile_deletion(spark):
    from supersonic_spark.functions.sketches import (cms_point_estimates,
                                                     cms_registers)
    df = spark.createDataFrame(
        [("a", 10), ("a", 5), ("a", -3), ("b", 2)], "k string, w int")
    reg = cms_registers(df, "k", weight="w", d=4, w=128)
    est = {r["key"]: r["est_count"] for r in cms_point_estimates(
        reg, df.select("k").distinct(), "k", d=4, w=128).collect()}
    assert est == {"a": 12, "b": 2}


# --- text normalization ------------------------------------------------------

def test_normalize_text_cases(spark):
    from supersonic_spark.text.analysis import normalize_text
    rows = [("a​b\tc\x01d  e",),   # zwsp deleted, tab/ctrl -> space
            ("  clean text  ",),
            ("﻿BOM start",),
            ("",)]
    df = spark.createDataFrame(rows, "t string")
    out = [r[0] for r in
           df.select(normalize_text(F.col("t")).alias("n")).collect()]
    assert out == ["ab c d e", "clean text", "BOM start", ""]


def test_normalize_text_idempotent_and_lowercase(spark):
    from supersonic_spark.text.analysis import normalize_text
    df = spark.createDataFrame([("A‌\tB  C\n",)], "t string")
    once = df.select(normalize_text(F.col("t")).alias("n"))
    twice = once.select(normalize_text(F.col("n")).alias("n"))
    assert once.collect() == twice.collect()
    low = df.select(normalize_text(F.col("t"), lowercase=True).alias("n"))
    assert low.collect()[0]["n"] == "a b c"


# --- bloom runtime-filter join -----------------------------------------------

def test_bloom_semi_join_matches_plain_semi_join(spark):
    from supersonic_spark.operators.runtime_filter import (
        bloom_prefilter_semi_join)
    probe = spark.range(0, 5000).select(
        (F.col("id") % 997).alias("key"), F.col("id").alias("v"))
    build = spark.createDataFrame([(i * 13,) for i in range(40)], "bk long")
    got = bloom_prefilter_semi_join(probe, build, "key", "bk",
                                    n_bits=1 << 12)
    want = probe.join(build.select(F.col("bk").alias("key")).distinct(),
                      "key", "left_semi")
    assert sorted(got.collect()) == sorted(want.collect())


def test_bloom_prefilter_actually_prunes(spark):
    from supersonic_spark.operators.runtime_filter import (
        bloom_probe_expr, bloom_words)
    keys = [str(i) for i in range(50)]
    words = bloom_words(keys, n_bits=1 << 12, k=2)
    probe = spark.range(0, 20000).select(F.col("id").cast("string")
                                         .alias("key"))
    kept = probe.filter(bloom_probe_expr(F.col("key"), words,
                                         1 << 12, 2)).count()
    assert kept >= 50                 # no false negatives, ever
    assert kept < 2000                # and the filter really cuts rows


def test_bloom_words_probe_agree_bit_for_bit(spark):
    """Every inserted key must pass the in-plan probe (zero false
    negatives is a correctness property, not a tuning one)."""
    from supersonic_spark.operators.runtime_filter import (
        bloom_probe_expr, bloom_words)
    keys = [f"conv-{i}" for i in range(257)]
    words = bloom_words(keys, n_bits=1 << 13, k=3)
    df = spark.createDataFrame([(k,) for k in keys], "key string")
    assert df.filter(bloom_probe_expr(F.col("key"), words,
                                      1 << 13, 3)).count() == len(keys)


def test_bloom_semi_join_rejects_oversized_build(spark, monkeypatch):
    from supersonic_spark.operators import runtime_filter as RT
    monkeypatch.setattr(RT, "_MAX_BUILD_KEYS", 10)
    probe = spark.range(0, 100).select(F.col("id").alias("key"))
    build = spark.range(0, 50).select(F.col("id").alias("bk"))
    with pytest.raises(ValueError, match="distinct keys"):
        RT.bloom_prefilter_semi_join(probe, build, "key", "bk")


def test_bloom_semi_join_plan_has_filter_before_join(spark):
    from supersonic_spark.operators.runtime_filter import (
        bloom_prefilter_semi_join)
    probe = spark.range(0, 1000).select(F.col("id").alias("key"))
    build = spark.createDataFrame([(3,), (7,)], "bk long")
    plan = bloom_prefilter_semi_join(
        probe, build, "key", "bk")._jdf.queryExecution().executedPlan() \
        .toString()
    assert "LeftSemi" in plan
    assert "Filter" in plan and "CartesianProduct" not in plan
