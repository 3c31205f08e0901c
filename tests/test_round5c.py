"""Round-5c additions: repetition quality filters, benchmark
decontamination, KMV distinct sketch, shuffle-free bucket evolution."""

from __future__ import annotations

import os
import re

import pytest
from pyspark.sql import functions as F


# --- repetition metrics ----------------------------------------------------

def _metrics(spark, texts):
    from supersonic_spark.text.repetition import repetition_metrics
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    rows = repetition_metrics(df).collect()
    return {r["doc_id"]: r for r in rows}


def test_repetition_hand_computed(spark):
    m = _metrics(spark, ["aaa bbb\naaa bbb\nccc"])[0]
    assert m["dup_line_frac"] == pytest.approx(0.3333)
    assert m["dup_line_char_frac"] == pytest.approx(round(7 / 17, 4))
    assert m["top_2gram_char_frac"] == pytest.approx(round(14 / 19, 4))
    assert m["dup_3gram_char_frac"] == 0.0
    assert m["repetitive"] is True


def test_repetition_top2gram_tie_breaks_greatest(spark):
    # "x y" and "a b" both occur twice; the lexicographically greatest
    # gram wins, so covered chars = 2 * len("x y") = 6 over len 15
    m = _metrics(spark, ["x y x y a b a b"])[0]
    assert m["top_2gram_char_frac"] == pytest.approx(0.4)


def test_repetition_dup3gram(spark):
    # "a b c" appears twice among the 3-grams
    text = "a b c a b c"          # grams3: "a b c","b c a","c a b","a b c"
    m = _metrics(spark, [text])[0]
    assert m["dup_3gram_char_frac"] == pytest.approx(
        round(min(2 * 5 / len(text), 1.0), 4))


def test_repetition_degenerate_inputs(spark):
    out = _metrics(spark, ["", "   ", "\n\n\n", "one"])
    for i in range(4):
        r = out[i]
        assert r["dup_line_frac"] == 0.0
        assert r["dup_line_char_frac"] == 0.0
        assert r["top_2gram_char_frac"] == 0.0
        assert r["dup_3gram_char_frac"] == 0.0
        assert r["repetitive"] is False


def test_repetition_plan_has_no_exchange(spark):
    from supersonic_spark.text.repetition import repetition_metrics
    df = spark.createDataFrame([(1, "a b a b")], "doc_id long, text string")
    plan = repetition_metrics(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# --- decontamination -------------------------------------------------------

def test_decontaminate_flags_overlap(spark):
    from supersonic_spark.text.decontaminate import decontaminate
    docs = spark.createDataFrame(
        [(1, "two three four five six"),
         (2, "totally unrelated words here now"),
         (3, "one two three four five")],
        "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 3)
    got = {r["doc_id"]: r for r in decontaminate(docs, bench, n=4).collect()}
    assert got[1]["n_overlap"] == 1 and got[1]["contaminated"] is True
    assert got[2]["n_overlap"] == 0 and got[2]["contaminated"] is False
    # the benchmark doc itself fully overlaps (its own two 4-grams)
    assert got[3]["n_overlap"] == 2 and got[3]["contaminated"] is True


def test_decontaminate_counts_distinct_grams_once(spark):
    from supersonic_spark.text.decontaminate import decontaminate
    # the shared 4-gram occurs twice in doc 1 but counts once
    docs = spark.createDataFrame(
        [(1, "p q r s p q r s"), (2, "p q r s")],
        "doc_id long, text string")
    bench = docs.filter(F.col("doc_id") == 2)
    got = {r["doc_id"]: r["n_overlap"]
           for r in decontaminate(docs, bench, n=4).collect()}
    assert got[1] == 1


# --- KMV distinct sketch ---------------------------------------------------

def test_kmv_exact_below_k(spark):
    from supersonic_spark.functions.sketches import kmv_distinct_count
    df = spark.range(10_000).select((F.col("id") % 300).alias("v"))
    assert kmv_distinct_count(df, "v", k=512) == 300


def test_kmv_estimate_accuracy_above_k(spark):
    from supersonic_spark.functions.sketches import kmv_distinct_count
    df = spark.range(50_000).select(
        F.concat(F.lit("u"), F.col("id")).alias("v"))
    est = kmv_distinct_count(df, "v", k=1024)
    # KMV relative error ~ 1/sqrt(k) ~ 3.1%; allow 4 sigma
    assert abs(est - 50_000) / 50_000 < 0.125


def test_kmv_partials_bounded(spark):
    from supersonic_spark.functions.sketches import kmv_partials
    df = spark.range(20_000).repartition(8)
    n = kmv_partials(df, "id", k=16).count()
    assert n <= 16 * 8


# --- shuffle-free bucket evolution -----------------------------------------

def _bucket_files(d):
    return sorted(p for p in os.listdir(d)
                  if re.match(r"part-\d{5}-.*\.parquet$", p))


def test_rebucket_preserves_rows_and_hash_classes(spark, tmp_path):
    from supersonic_spark.pipeline import bucketize_table, rebucket_table
    df = spark.createDataFrame(
        [(i % 200, i, i * 3) for i in range(2000)],
        "conv_id long, turn_idx long, v long")
    bdir, rdir = str(tmp_path / "b"), str(tmp_path / "r")
    bucketize_table(spark, df, bdir, n_buckets=5)
    rebucket_table(spark, bdir, rdir, factor=2)

    import json
    with open(os.path.join(rdir, "_buckets.json")) as f:
        meta = json.load(f)
    assert meta["n_buckets"] == 10 and meta["conv_key"] == "conv_id"

    # every file holds exactly its pmod(hash, 10) class
    for p in _bucket_files(rdir):
        b = int(p.split("-")[1])
        got = (spark.read.parquet(os.path.join(rdir, p))
               .select(F.pmod(F.hash("conv_id"), F.lit(10)).alias("nb"))
               .distinct().collect())
        assert {r["nb"] for r in got} <= {b}

    # content identical to the source table
    before = sorted((r["conv_id"], r["turn_idx"], r["v"])
                    for r in df.collect())
    after = sorted((r["conv_id"], r["turn_idx"], r["v"])
                   for r in spark.read.parquet(rdir).collect())
    assert after == before


def test_rebucket_plan_has_no_exchange(spark, tmp_path):
    """The evolution job is scan -> dynamic-partition write: no shuffle.
    Asserted on the equivalent write plan (same expressions rebucket
    runs), since the write itself leaves no inspectable DataFrame."""
    from supersonic_spark.pipeline import bucketize_table
    df = spark.createDataFrame([(i, i) for i in range(100)],
                               "conv_id long, v long")
    bdir = str(tmp_path / "b")
    bucketize_table(spark, df, bdir, n_buckets=2)
    staged = (spark.read.parquet(bdir)
              .withColumn("__nb", F.pmod(F.hash("conv_id"), F.lit(4))))
    plan = staged._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_rebucket_then_upsert_routes_correctly(spark, tmp_path):
    from supersonic_spark.pipeline import (bucketize_table, rebucket_table,
                                           upsert_bucketized)
    df = spark.createDataFrame(
        [(i % 50, i, 0) for i in range(500)],
        "conv_id long, turn_idx long, v long")
    bdir, rdir = str(tmp_path / "b"), str(tmp_path / "r")
    bucketize_table(spark, df, bdir, n_buckets=3)
    rebucket_table(spark, bdir, rdir, factor=3)
    upd = spark.createDataFrame(
        [(7, 999, 42)], "conv_id long, turn_idx long, v long")
    upsert_bucketized(spark, upd, rdir)
    got = spark.read.parquet(rdir).filter(F.col("conv_id") == 7).collect()
    assert [(r["turn_idx"], r["v"]) for r in got] == [(999, 42)]
    n_other = spark.read.parquet(rdir).filter(F.col("conv_id") != 7).count()
    assert n_other == 490


def test_rebucket_validates_factor(spark, tmp_path):
    from supersonic_spark.pipeline import bucketize_table, rebucket_table
    df = spark.createDataFrame([(1, 1)], "conv_id long, v long")
    bdir = str(tmp_path / "b")
    bucketize_table(spark, df, bdir, n_buckets=2)
    with pytest.raises(ValueError):
        rebucket_table(spark, bdir, str(tmp_path / "r"), factor=1)


# --- stream-stream interval join -------------------------------------------

def test_interval_join_stream_equals_batch(spark, tmp_path):
    """The same interval_join call over readStream inputs (availableNow
    replay, append memory sink) must equal its batch twin."""
    import datetime as dt
    from supersonic_spark.streaming import interval_join

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    views = [(i % 4, base + dt.timedelta(minutes=3 * i), 1000 + i)
             for i in range(60)]
    buys = [(i % 4, base + dt.timedelta(minutes=3 * i + (i * 7) % 45),
             2000 + i) for i in range(60)]
    vdir, bdir = str(tmp_path / "v"), str(tmp_path / "b")
    spark.createDataFrame(views, "user_id int, l_ts timestamp, l_id int") \
         .repartition(3).write.parquet(vdir)
    spark.createDataFrame(buys, "r_user int, r_ts timestamp, r_id int") \
         .repartition(3).write.parquet(bdir)

    def join(l, r):
        return interval_join(l, r, "user_id", "r_user", "l_ts", "r_ts",
                             lower_seconds=0, upper_seconds=1800,
                             watermark_delay="5 minutes") \
            .select("user_id", "l_id", "r_id")

    batch = join(spark.read.parquet(vdir), spark.read.parquet(bdir))
    vs = spark.read.parquet(vdir).schema
    bs = spark.read.parquet(bdir).schema
    stream = join(spark.readStream.schema(vs).parquet(vdir),
                  spark.readStream.schema(bs).parquet(bdir))
    q = (stream.writeStream.format("memory").queryName("ij_equiv")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ij_equiv")

    key = lambda rows: sorted((r["user_id"], r["l_id"], r["r_id"])
                              for r in rows)
    assert key(got.collect()) == key(batch.collect())
    assert len(key(batch.collect())) > 0


def test_interval_join_rejects_ambiguous_columns(spark):
    import pytest as _pytest
    from supersonic_spark.streaming import interval_join
    df = spark.createDataFrame([(1,)], "user_id int") \
              .withColumn("ts", F.current_timestamp())
    with _pytest.raises(ValueError):
        interval_join(df, df, "user_id", "user_id", "ts", "ts", 0, 10)


# --- Misra-Gries heavy hitters ---------------------------------------------

def test_mg_exact_below_k(spark):
    from supersonic_spark.functions.sketches import mg_heavy_hitters
    df = spark.range(9_000).select((F.col("id") % 9).cast("string").alias("v"))
    got = {r["value"]: r["est_count"]
           for r in mg_heavy_hitters(df, "v", k=32).collect()}
    assert got == {str(i): 1000 for i in range(9)}


def test_mg_guarantee_on_skewed_data(spark):
    from supersonic_spark.functions.sketches import mg_heavy_hitters
    # 30k rows of "hot" + 70k distinct cold values; k=16 forces reductions
    hot = spark.range(30_000).select(F.lit("hot").alias("v"))
    cold = spark.range(70_000).select(
        F.concat(F.lit("c"), F.col("id")).alias("v"))
    df = hot.unionAll(cold).repartition(8)
    got = {r["value"]: r["est_count"]
           for r in mg_heavy_hitters(df, "v", k=16).collect()}
    n = 100_000
    # every item with freq > n/(k+1) must surface; undercount <= n/(k+1)
    assert "hot" in got
    assert 30_000 - n // 17 <= got["hot"] <= 30_000


# --- deterministic train/val/test split ------------------------------------

def test_split_fractions_and_determinism(spark):
    from supersonic_spark.text.curate import train_val_test_split
    df = spark.range(20_000).select(F.col("id").alias("doc_id"))
    out = train_val_test_split(df, (0.8, 0.1, 0.1))
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["val"] / 20_000 - 0.1) < 0.01
    assert abs(counts["test"] / 20_000 - 0.1) < 0.01
    # partition-independent: same labels after a reshuffle
    a = {r["doc_id"]: r["split"] for r in out.collect()}
    b = {r["doc_id"]: r["split"] for r in
         train_val_test_split(df.repartition(13), (0.8, 0.1, 0.1)).collect()}
    assert a == b


def test_split_validates_fractions(spark):
    from supersonic_spark.text.curate import train_val_test_split
    df = spark.range(10).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError):
        train_val_test_split(df, (0.5, 0.2, 0.2))


# --- paragraph-level exact dedup --------------------------------------------

def test_paragraph_dedup_keeps_first_occurrence(spark):
    from supersonic_spark.text.paradedup import paragraph_dedup
    df = spark.createDataFrame(
        [(1, "shared line\nunique one"),
         (2, "shared line\nunique two\nshared line"),
         (3, "unique three")],
        ["doc_id", "text"])
    got = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}
    # doc 1 is the global first occurrence of "shared line" -> intact
    assert got[1]["text_dedup"] == "shared line\nunique one"
    assert (got[1]["n_kept"], got[1]["n_total"]) == (2, 2)
    # doc 2 loses BOTH copies (cross-doc and its own repeat)
    assert got[2]["text_dedup"] == "unique two"
    assert (got[2]["n_kept"], got[2]["n_total"]) == (1, 3)
    assert got[3]["text_dedup"] == "unique three"


def test_paragraph_dedup_drops_fully_duplicate_docs(spark):
    from supersonic_spark.text.paradedup import paragraph_dedup
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "a\nb"), (3, "  \n\nb")],
        ["doc_id", "text"])
    out = paragraph_dedup(df).collect()
    ids = {r["doc_id"] for r in out}
    # docs 2 and 3 consist entirely of losing paragraphs -> absent
    assert ids == {1}
    # whitespace-only lines never count toward totals (doc 3 had only "b")
    row = next(r for r in out if r["doc_id"] == 1)
    assert (row["n_kept"], row["n_total"]) == (2, 2)


def test_paragraph_dedup_order_preserved(spark):
    from supersonic_spark.text.paradedup import paragraph_dedup
    # surviving lines must reassemble in original positional order even
    # when the duplicate sits in the middle
    df = spark.createDataFrame(
        [(1, "dup"), (2, "z9\ndup\na1")], ["doc_id", "text"])
    got = {r["doc_id"]: r["text_dedup"]
           for r in paragraph_dedup(df).collect()}
    assert got[2] == "z9\na1"


# --- blocked k-NN self-join --------------------------------------------------

def test_knn_join_ivf_blocks_and_ranks(spark):
    from supersonic_spark.ann import knn_join_ivf
    # two well-separated cells on the x axis; dim-2 vectors
    cents = [[1.0, 0.0], [-1.0, 0.0]]
    rows = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.9, -0.2]),   # cell 0
        (3, [-1.0, 0.0]), (4, [-0.9, 0.05]),                  # cell 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"]).select(
        "vec_id", F.col("embedding").cast("array<float>").alias("embedding"))
    out = knn_join_ivf(df, cents, k=2).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["vec_id"], []).append(r)
    # no cross-cell neighbor pairs ever appear
    cell = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}
    for r in out:
        assert cell[r["vec_id"]] == cell[r["nbr_id"]]
        assert r["vec_id"] != r["nbr_id"]
    # cell 1 has only one possible neighbor each
    assert [x["nbr_id"] for x in by_q[3]] == [4]
    assert [x["nbr_id"] for x in by_q[4]] == [3]
    # vec 0's nearest in-cell neighbor by cosine is 1 (then 2), ranked
    got0 = sorted(by_q[0], key=lambda r: r["rk"])
    assert [x["nbr_id"] for x in got0] == [1, 2]
    assert got0[0]["cos_sim"] > got0[1]["cos_sim"]
    # k bounds the neighbor count
    assert all(len(v) <= 2 for v in by_q.values())


# --- DDSketch quantiles -------------------------------------------------------

def test_dd_quantiles_relative_error_bound(spark):
    from supersonic_spark.functions.sketches import dd_quantiles
    import math
    gamma = 1.02
    # log-uniform-ish positive values with a long tail, exact answers known
    vals = [math.exp(((i * 2654435761) % 10_000) / 1000.0) for i in range(5000)]
    df = spark.createDataFrame([(v,) for v in vals], ["x"])
    got = dd_quantiles(df, "x", (0.5, 0.99), gamma=gamma).collect()[0]
    bound = (gamma - 1) / (gamma + 1)
    s = sorted(vals)
    for q, col in ((0.5, "p50"), (0.99, "p99")):
        exact = s[math.floor(q * (len(s) - 1))]
        assert abs(got[col] - exact) / exact <= bound * 1.001, (q, got[col], exact)


def test_dd_sketch_merges_by_bucket_sum(spark):
    from supersonic_spark.functions.sketches import dd_sketch, dd_quantiles
    import pyspark.sql.functions as F2
    a = spark.range(1, 3001).select((F2.col("id") * 1.5).alias("x"))
    b = spark.range(3001, 6001).select((F2.col("id") * 1.5).alias("x"))
    # sketch each half, merge by bucket-wise count addition
    merged = (dd_sketch(a, "x").unionAll(dd_sketch(b, "x"))
              .groupBy("bkt").agg(F2.sum("cnt").alias("cnt")))
    whole = dd_sketch(a.unionAll(b), "x")
    m = {r["bkt"]: r["cnt"] for r in merged.collect()}
    w = {r["bkt"]: r["cnt"] for r in whole.collect()}
    assert m == w
    # and the union's quantile is computable from the merged buckets
    direct = dd_quantiles(a.unionAll(b), "x", (0.9,)).collect()[0]["p90"]
    assert direct is not None


# --- funnel / cohort / weighted sample ---------------------------------------

def test_funnel_requires_strict_order(spark):
    from supersonic_spark.operators.analytics import funnel
    import datetime as dt
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    rows = [
        # user 1: full ordered chain
        (1, t(0), "signup"), (1, t(1), "view"), (1, t(2), "purchase"),
        # user 2: purchase BEFORE view -> reaches step 2 only
        (2, t(0), "signup"), (2, t(2), "view"), (2, t(1), "purchase"),
        # user 3: no signup -> reaches nothing
        (3, t(0), "view"), (3, t(1), "purchase"),
        # user 4: signup only
        (4, t(5), "signup"),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["step"]: r["n_users"]
           for r in funnel(df, ["signup", "view", "purchase"]).collect()}
    assert got == {1: 3, 2: 2, 3: 1}


def test_funnel_uses_earliest_chain(spark):
    from supersonic_spark.operators.analytics import funnel
    import datetime as dt
    t = lambda m: dt.datetime(2024, 1, 1, 0, m)
    # view at minute 1 AND 10; purchase at minute 5: only the earliest
    # view admits the purchase — greedy-earliest must find it
    rows = [(1, t(0), "signup"), (1, t(1), "view"), (1, t(10), "view"),
            (1, t(5), "purchase")]
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_type"])
    got = {r["step"]: r["n_users"]
           for r in funnel(df, ["signup", "view", "purchase"]).collect()}
    assert got[3] == 1


def test_weighted_sample_proportional_and_deterministic(spark):
    from supersonic_spark.text.curate import weighted_sample
    # 500 heavy (w=50) + 500 light (w=1): heavy ids must dominate the
    # sample, and the draw must be partition-count independent
    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < 500, 50.0).otherwise(1.0).alias("w"))
    got = weighted_sample(df, "w", 100).collect()
    heavy = sum(1 for r in got if r["doc_id"] < 500)
    assert heavy > 80           # expectation ~98; far above the 50 of uniform
    again = weighted_sample(df.repartition(17), "w", 100).collect()
    assert {r["doc_id"] for r in got} == {r["doc_id"] for r in again}


# --- incremental view maintenance --------------------------------------------

def test_apply_changes_retracts_and_drops_empty_groups(spark):
    from supersonic_spark.operators.ivm import apply_changes
    import pytest as _pt
    agg = lambda rows: spark.createDataFrame(
        rows, "k string, s long, n long")
    base = agg([("a", 100, 3), ("b", 50, 1), ("c", 7, 2)])
    ins = agg([("a", 10, 1), ("d", 5, 1)])
    dels = agg([("b", 50, 1), ("c", 3, 1)])
    got = {r["k"]: (r["s"], r["n"])
           for r in apply_changes(base, ins, dels, ["k"],
                                  sums=("s",), counts=("n",)).collect()}
    # b emptied -> gone; a grew; c shrank; d appeared
    assert got == {"a": (110, 4), "c": (4, 1), "d": (5, 1)}
    with _pt.raises(ValueError):
        apply_changes(base, ins, dels, ["k"], sums=("s",), counts=())


# --- resample + forward fill --------------------------------------------------

def test_resample_ffill_fills_gaps_per_key(spark):
    from supersonic_spark.operators.analytics import resample_ffill
    import datetime as dt
    t = lambda h, m=0: dt.datetime(2024, 1, 1, h, m)
    rows = [
        (1, t(0, 5), 10), (1, t(0, 40), 30),   # hour 0: max 30
        (1, t(3, 1), 7),                        # hours 1-2 are gaps
        (2, t(5, 0), 99),                       # single-hour key
    ]
    df = spark.createDataFrame(rows, ["k", "ts", "v"])
    got = {(r["k"], r["h"].hour): r["v"]
           for r in resample_ffill(df, "k", "ts", "v").collect()}
    assert got == {(1, 0): 30, (1, 1): 30, (1, 2): 30, (1, 3): 7,
                   (2, 5): 99}


# --- plan assertions for the analytics wave ----------------------------------

def test_winsorize_broadcasts_percentiles_no_fact_shuffle(spark):
    from supersonic_spark.operators.analytics import winsorize
    df = spark.range(10_000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 97).cast("long").alias("v"))
    plan = (winsorize(df, "v", "g")
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan
    # the only exchanges allowed are the percentile agg + broadcast —
    # the fact side must not hash-repartition
    assert plan.count("Exchange hashpartitioning") <= 1


def test_fuzzy_join_blocked_has_no_cartesian(spark):
    from supersonic_spark.text.dedup import fuzzy_join_blocked
    df = spark.createDataFrame([("alpha",), ("beta",)], ["s"])
    d2 = spark.createDataFrame([("alphx",), ("betz",)], ["t"])
    out = fuzzy_join_blocked(df, d2, "s", "t", max_dist=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
    got = {(r["s"], r["t"]) for r in out.collect()}
    assert got == {("alpha", "alphx"), ("beta", "betz")}


def test_dd_sketch_is_map_side_combined(spark):
    from supersonic_spark.functions.sketches import dd_sketch
    df = spark.range(10_000).select((F.col("id") + 1.0).alias("x"))
    plan = dd_sketch(df, "x")._jdf.queryExecution().executedPlan().toString()
    # partial+final HashAggregate pair around one exchange
    assert plan.count("HashAggregate") >= 2
    assert plan.count("Exchange hashpartitioning") == 1
