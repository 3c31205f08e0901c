"""Round-5 wave 5g: bigram-LM perplexity filter, exact stratified
sampling (largest remainder), 2-D skyline."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


# --- LM cross-entropy --------------------------------------------------------

def test_lm_cross_entropy_exact_formula(spark):
    from supersonic_spark.text.lm import lm_cross_entropy
    docs = [("a", "x y x y"), ("b", "x y z"), ("c", "z")]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    got = {r["doc_id"]: r.asDict()
           for r in lm_cross_entropy(df, k=0.5).collect()}
    # corpus bigrams: a: xy yx xy; b: xy yz; c: none (1 token -> dropped)
    # c_bg: (x,y)=3 (y,x)=1 (y,z)=1 ; c_w1: x=3 y=2 ; V=2 contexts
    k, V = 0.5, 2

    def p(cbg, cw1):
        return math.log((cbg + k) / (cw1 + k * V))

    xent_a = -(p(3, 3) + p(1, 2) + p(3, 3)) / 3
    xent_b = -(p(3, 3) + p(1, 2)) / 2
    assert "c" not in got                       # no bigrams, no row
    assert got["a"]["n_bigrams"] == 3
    assert got["a"]["xent"] == round(xent_a, 4)
    assert got["b"]["xent"] == round(xent_b, 4)


def test_lm_kept_flag_thresholds(spark):
    from supersonic_spark.text.lm import lm_cross_entropy
    df = spark.createDataFrame(
        [("rep", "a a a a a a a a"), ("rare", "q w e r t y u i")],
        "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           lm_cross_entropy(df, k=0.5, max_xent=1.0).collect()}
    # the repetitive doc's bigram (a,a) dominates the corpus -> low xent
    assert out["rep"]["xent"] < out["rare"]["xent"]
    assert out["rep"]["kept"] == 1 and out["rare"]["kept"] == 0


# --- exact stratified sampling -----------------------------------------------

def _strata_df(spark, sizes):
    rows = [(f"{s}-{i}", s) for s, n in sizes.items() for i in range(n)]
    return spark.createDataFrame(rows, "doc_id string, source string")


def test_stratified_sample_exact_total_and_proportions(spark):
    from supersonic_spark.text.curate import stratified_sample_exact
    df = _strata_df(spark, {"a": 700, "b": 200, "c": 100})
    out = stratified_sample_exact(df, "source", "doc_id", total=50)
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == 50
    assert by == {"a": 35, "b": 10, "c": 5}     # exactly proportional


def test_stratified_sample_largest_remainder_breaks_ties(spark):
    from supersonic_spark.text.curate import stratified_sample_exact
    # 3 strata of 100 each, total 10: floors are 3,3,3; one leftover
    # goes to the lexicographically first stratum (rem all equal)
    df = _strata_df(spark, {"a": 100, "b": 100, "c": 100})
    out = stratified_sample_exact(df, "source", "doc_id", total=10)
    by = {r["source"]: r["n"] for r in
          out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert sum(by.values()) == 10
    assert by == {"a": 4, "b": 3, "c": 3}


def test_stratified_sample_deterministic(spark):
    from supersonic_spark.text.curate import stratified_sample_exact
    df = _strata_df(spark, {"a": 37, "b": 13}).repartition(8)
    pick = lambda: sorted(r["doc_id"] for r in stratified_sample_exact(
        df, "source", "doc_id", total=9).collect())
    assert pick() == pick()


# --- skyline -----------------------------------------------------------------

def _brute_skyline(points):
    out = []
    for p in points:
        dominated = any(
            (q[1] >= p[1] and q[2] <= p[2])
            and (q[1] > p[1] or q[2] < p[2])
            for q in points)
        if not dominated:
            out.append(p)
    return sorted(out)


def test_skyline_matches_brute_force(spark):
    from supersonic_spark.operators.analytics import skyline2d
    import random
    rng = random.Random(7)
    pts = [(i, rng.randint(0, 20), rng.randint(0, 1000))
           for i in range(300)]
    df = spark.createDataFrame(pts, "id long, size int, cost long")
    got = sorted(tuple(r) for r in skyline2d(df, "size", "cost").collect())
    assert got == _brute_skyline(pts)


def test_skyline_keeps_duplicate_optimal_points(spark):
    from supersonic_spark.operators.analytics import skyline2d
    pts = [(1, 10, 5), (2, 10, 5), (3, 10, 6), (4, 9, 4), (5, 8, 4)]
    df = spark.createDataFrame(pts, "id long, size int, cost long")
    ids = sorted(r["id"] for r in skyline2d(df, "size", "cost").collect())
    assert ids == [1, 2, 4]   # dup optima both live; (3) and (5) dominated


def test_skyline_plan_no_cartesian_no_global_data_window(spark):
    from supersonic_spark.operators.analytics import skyline2d
    df = spark.range(0, 10000).select(
        F.col("id"), (F.col("id") % 37).cast("int").alias("size"),
        (F.col("id") % 997).alias("cost"))
    plan = skyline2d(df, "size", "cost")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


# --- analytic window variants -------------------------------------------------

def test_window_variants_tiny_exact(spark):
    from pyspark.sql import Window
    df = spark.createDataFrame(
        [("u", i, 10 * i) for i in range(1, 5)], "k string, o int, v int")
    w = Window.partitionBy("k").orderBy("o")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = {r["o"]: r.asDict() for r in df.select(
        "o",
        F.ntile(2).over(w).alias("t"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
        F.nth_value("v", 3).over(run).alias("nv")).collect()}
    assert [got[i]["t"] for i in range(1, 5)] == [1, 1, 2, 2]
    assert [got[i]["pr"] for i in range(1, 5)] == [
        0.0, round(1 / 3, 6), round(2 / 3, 6), 1.0]
    assert [got[i]["cd"] for i in range(1, 5)] == [0.25, 0.5, 0.75, 1.0]
    assert [got[i]["nv"] for i in range(1, 5)] == [None, None, 30, 30]
