"""Round-5 wave 5j: Markov role transitions, unpivot melt, exact
grouped percentiles."""

from __future__ import annotations

from pyspark.sql import functions as F


# --- role transition matrix -------------------------------------------------

def _conv(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string")


def test_role_transitions_counts_and_probs(spark):
    from supersonic_spark.conversations import role_transitions
    # c1: user -> assistant -> tool -> assistant
    # c2: user -> assistant -> user  (turn order shuffled in input)
    rows = [("c1", 0, "user"), ("c1", 1, "assistant"),
            ("c1", 2, "tool"), ("c1", 3, "assistant"),
            ("c2", 2, "user"), ("c2", 0, "user"), ("c2", 1, "assistant")]
    got = {(r["role"], r["next_role"]): (r["n"], r["p"])
           for r in role_transitions(_conv(spark, rows)).collect()}
    assert got[("user", "assistant")] == (2, 1.0)
    assert got[("assistant", "tool")] == (1, 0.5)
    assert got[("assistant", "user")] == (1, 0.5)
    # c1 turn 3 assistant has no successor; c2's does (turn 1 -> 2)
    assert ("tool", "assistant") in got and got[("tool", "assistant")][0] == 1
    # per-source probabilities sum to 1
    import collections
    by_src = collections.defaultdict(float)
    for (src, _), (_, p) in got.items():
        by_src[src] += p
    for src, tot in by_src.items():
        assert abs(tot - 1.0) < 1e-6, (src, tot)


def test_role_transitions_crosses_conversations_never(spark):
    from supersonic_spark.conversations import role_transitions
    # last turn of c1 is 'tool', first of c2 is 'user' — a cross-conv
    # leak would fabricate a (tool -> user) pair
    rows = [("c1", 0, "user"), ("c1", 1, "tool"),
            ("c2", 0, "user"), ("c2", 1, "assistant")]
    got = {(r["role"], r["next_role"]) for r in
           role_transitions(_conv(spark, rows)).collect()}
    assert ("tool", "user") not in got
    assert got == {("user", "tool"), ("user", "assistant")}


# --- unpivot melt -------------------------------------------------------------

def test_unpivot_is_exact_inverse_of_wide(spark):
    wide = spark.createDataFrame(
        [("A", 3, 100, 60), ("B", 1, 40, 40)],
        "k string, n_orders long, sum_cents long, max_cents long")
    out = wide.unpivot("k", ["n_orders", "sum_cents", "max_cents"],
                       "metric", "value").collect()
    got = {(r["k"], r["metric"]): r["value"] for r in out}
    assert len(out) == 6
    assert got[("A", "n_orders")] == 3 and got[("A", "sum_cents")] == 100
    assert got[("B", "max_cents")] == 40


def test_unpivot_plan_is_single_expand_no_union(spark):
    wide = spark.createDataFrame(
        [("A", 1, 2, 3)], "k string, a long, b long, c long")
    plan = (wide.unpivot("k", ["a", "b", "c"], "metric", "value")
            ._jdf.queryExecution().executedPlan().toString())
    assert "Expand" in plan and "Union" not in plan


# --- exact grouped percentiles -------------------------------------------------

def test_percentile_matches_numpy_linear_interpolation(spark):
    import numpy as np
    vals = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, cents long")
    row = (df.groupBy("g")
           .agg(F.round(F.percentile("cents", F.lit(0.5)), 4).alias("p50"),
                F.round(F.percentile("cents", F.lit(0.9)), 4).alias("p90"))
           .collect()[0])
    assert row["p50"] == round(float(np.percentile(vals, 50)), 4)
    assert row["p90"] == round(float(np.percentile(vals, 90)), 4)


# --- wave 5k: tool-run islands -------------------------------------------------

def test_longest_tool_runs_islands(spark):
    from supersonic_spark.conversations import longest_tool_runs
    # c1 roles: user tool tool tool assistant tool user -> runs 3, 1
    # c2: no tool turns -> absent from output
    rows = ([("c1", i, r) for i, r in enumerate(
        ["user", "tool", "tool", "tool", "assistant", "tool", "user"])]
        + [("c2", 0, "user"), ("c2", 1, "assistant")])
    out = {r["conv_id"]: r.asDict() for r in
           longest_tool_runs(_conv(spark, rows)).collect()}
    assert set(out) == {"c1"}
    assert out["c1"]["max_tool_run"] == 3
    assert out["c1"]["n_tool_runs"] == 2
    assert out["c1"]["n_tool_turns"] == 4


def test_longest_tool_runs_survives_turn_idx_gaps(spark):
    from supersonic_spark.conversations import longest_tool_runs
    # turn indices 0,5,9 are CONSECUTIVE turns (gaps from upstream
    # filtering) — the island id uses row numbers, not turn_idx deltas
    rows = [("c1", 0, "tool"), ("c1", 5, "tool"), ("c1", 9, "tool")]
    out = longest_tool_runs(_conv(spark, rows)).collect()[0]
    assert out["max_tool_run"] == 3 and out["n_tool_runs"] == 1


def test_longest_tool_runs_single_window_exchange(spark):
    from supersonic_spark.conversations import longest_tool_runs
    df = longest_tool_runs(_conv(spark, [("c1", 0, "tool")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # both row_numbers ride one conv_id sort: exactly one hashpartition
    # exchange on conv_id before the aggregates
    assert plan.count("Window") >= 1 and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning(conv_id") == 1, plan


# --- wave 5k: edit-distance verify ---------------------------------------------

def test_editdist_verify_exact_distances_and_threshold(spark):
    from supersonic_spark.text.dedup import editdist_verify_pairs
    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "zzzzzzzzzz")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): (r["edit_dist"], r["confirmed"])
           for r in editdist_verify_pairs(docs, pairs, "text",
                                          "doc_id").collect()}
    assert got[(1, 2)] == (1, True)     # 1 edit * 5 <= 10
    assert got[(1, 3)] == (10, False)   # 10 edits * 5 > 10


# --- wave 5l: turn coalescing / char entropy -----------------------------------

def test_merge_consecutive_turns_exact(spark):
    from supersonic_spark.conversations import merge_consecutive_turns
    rows = [("c1", 0, "user", "hi"), ("c1", 1, "user", "there"),
            ("c1", 2, "assistant", "yo"), ("c1", 3, "user", "bye"),
            ("c2", 0, "tool", "a"), ("c2", 1, "tool", "b"),
            ("c2", 2, "tool", "c")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = {(r["conv_id"], r["turn_idx"]): r.asDict()
           for r in merge_consecutive_turns(df).collect()}
    assert out[("c1", 0)]["text"] == "hi\nthere"
    assert out[("c1", 0)]["n_merged"] == 2
    assert out[("c1", 2)]["text"] == "yo" and out[("c1", 2)]["n_merged"] == 1
    assert out[("c1", 3)]["role"] == "user"     # same role, NOT adjacent
    assert out[("c2", 0)]["text"] == "a\nb\nc"
    assert len(out) == 4


def test_merge_consecutive_turns_order_under_repartition(spark):
    from supersonic_spark.conversations import merge_consecutive_turns
    rows = [("c1", i, "user", f"t{i}") for i in range(20)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string"
    ).repartition(8)
    out = merge_consecutive_turns(df).collect()
    assert len(out) == 1
    assert out[0]["text"] == "\n".join(f"t{i}" for i in range(20))


def test_char_entropy_known_values(spark):
    import math
    from supersonic_spark.text.analysis import char_entropy
    df = spark.createDataFrame([(1, "aaaa"), (2, "ab"), (3, "aabb")],
                               "doc_id long, text string")
    got = {r["doc_id"]: (r["n_chars"], r["entropy"])
           for r in char_entropy(df).collect()}
    assert got[1] == (4, 0.0)           # single symbol: zero entropy
    assert got[2] == (2, 1.0)           # two equiprobable symbols: 1 bit
    assert got[3] == (4, 1.0)
