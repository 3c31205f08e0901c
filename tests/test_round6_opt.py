"""Round-6 optimization round: focused tests for operator-internal
changes (results must be identical to the pre-optimization forms)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from supersonic_spark.session import get_spark
    s = get_spark(cores=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


def test_merge_consecutive_turns_null_role_is_its_own_run(spark):
    # ADVICE r5: a NULL-role row must NOT merge into the neighboring
    # non-null run (IS DISTINCT FROM semantics, like the oracle)
    from supersonic_spark.conversations import merge_consecutive_turns
    rows = [("c1", 0, "user", "a"), ("c1", 1, None, "b"),
            ("c1", 2, None, "c"), ("c1", 3, "user", "d")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = {r["turn_idx"]: r for r in
           merge_consecutive_turns(df).collect()}
    assert sorted(out) == [0, 1, 3]
    assert out[0]["role"] == "user" and out[0]["n_merged"] == 1
    assert out[1]["role"] is None and out[1]["n_merged"] == 2
    assert out[1]["text"] == "b\nc"
    assert out[3]["role"] == "user" and out[3]["n_merged"] == 1


def test_merge_consecutive_turns_first_row_null_role(spark):
    from supersonic_spark.conversations import merge_consecutive_turns
    rows = [("c1", 0, None, "x"), ("c1", 1, "user", "y")]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string")
    out = sorted(merge_consecutive_turns(df).collect(),
                 key=lambda r: r["turn_idx"])
    assert [r["role"] for r in out] == [None, "user"]
    assert [r["n_merged"] for r in out] == [1, 1]


def test_editdist_verify_no_text_exchange_and_same_results(spark):
    from supersonic_spark.text.dedup import editdist_verify_pairs
    docs = spark.createDataFrame(
        [(i, f"document number {i} padding text") for i in range(50)]
        + [(100, "nearly identical text"), (101, "nearly identicaX text")],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(100, 101), (1, 100)], "id_a long, id_b long")
    out = editdist_verify_pairs(docs, pairs, "text", "doc_id")
    rows = {(r["id_a"], r["id_b"]): r for r in out.collect()}
    assert rows[(100, 101)]["edit_dist"] == 1
    assert rows[(100, 101)]["confirmed"]
    assert not rows[(1, 100)]["confirmed"]
    # broadcast attach: the candidate-filtered text projection must join
    # via BroadcastHashJoin, never shuffle full text to an SMJ/SHJ
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # fallback path: identical rows
    out2 = editdist_verify_pairs(docs, pairs, "text", "doc_id",
                                 broadcast_texts=False)
    assert sorted(map(tuple, out2.collect())) == sorted(
        map(tuple, out.collect()))


def test_bm25_corpus_stats_path_matches_self_contained(spark):
    from supersonic_spark.text.retrieval import bm25_corpus_stats, bm25_topk
    docs = spark.createDataFrame(
        [(i, f"spark window hash term{i % 7} filler words {i}")
         for i in range(200)],
        "doc_id long, text string")
    base = bm25_topk(docs, ["spark", "term3"], k=10).collect()
    stats = bm25_corpus_stats(docs).localCheckpoint(eager=True)
    via_stats = bm25_topk(docs, ["spark", "term3"], k=10,
                          corpus_stats=stats).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, via_stats))


def test_multi_distinct_split_matches_expand(spark):
    # the entry rewrite: 3 single-distinct aggregates joined on the
    # group key == the Expand-based multi-distinct, row for row
    df = spark.createDataFrame(
        [(chr(65 + i % 3), i % 11, i % 5, i % 7) for i in range(500)],
        "g string, a int, b int, c int")
    expand = df.groupBy("g").agg(
        F.countDistinct("a").alias("da"),
        F.countDistinct("b").alias("db"),
        F.countDistinct("c").alias("dc"))
    sa = df.groupBy("g").agg(F.countDistinct("a").alias("da"))
    sb = df.groupBy("g").agg(F.countDistinct("b").alias("db"))
    sc_ = df.groupBy("g").agg(F.countDistinct("c").alias("dc"))
    split = sa.join(sb, "g").join(sc_, "g").select("g", "da", "db", "dc")
    assert sorted(map(tuple, expand.collect())) == sorted(
        map(tuple, split.collect()))
