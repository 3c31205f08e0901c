"""Round-5 wave 5e: data-quality expectations audit, inverted index,
winnowing fingerprints, prefix-filtering Jaccard join."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# --- expectations audit ------------------------------------------------------

def _report(df, rules):
    from supersonic_spark.validate import expectations_report
    return {r["rule"]: r["violations"]
            for r in expectations_report(df, rules).collect()}


def test_expectations_clean_table_all_zero(spark):
    from supersonic_spark import validate as V
    df = spark.createDataFrame(
        [(1, 10.0, "O"), (2, 20.0, "F"), (3, 30.0, "O")],
        "id long, price double, status string")
    rep = _report(df, [
        V.not_null("nn", "status"),
        V.in_range("rng", "price", 0.0, 100.0),
        V.accepted("acc", "status", ["O", "F"]),
        V.unique("uq", "id"),
    ])
    assert rep == {"nn": 0, "rng": 0, "acc": 0, "uq": 0}


def test_expectations_exact_violation_counts(spark):
    from supersonic_spark import validate as V
    df = spark.createDataFrame(
        [(1, None, "O"), (1, 5.0, "X"), (2, 500.0, None), (1, -1.0, "F")],
        "id long, price double, status string")
    rep = _report(df, [
        V.not_null("price_nn", "price"),     # one NULL price
        V.in_range("rng", "price", 0.0, 100.0),   # 500.0 and -1.0
        V.accepted("acc", "status", ["O", "F"]),  # 'X'; NULL passes
        V.unique("uq", "id"),                # id=1 x3 -> 2 duplicate rows
        V.expr_rule("custom", F.col("price") > F.lit(400.0)),  # 500.0
    ])
    assert rep == {"price_nn": 1, "rng": 2, "acc": 1, "uq": 2, "custom": 1}


def test_expectations_foreign_key_and_null_fk_passes(spark):
    from supersonic_spark import validate as V
    fact = spark.createDataFrame(
        [(1, 10), (2, 99), (3, None), (4, 99)], "id long, fk int")
    dim = spark.createDataFrame([(10,), (20,)], "k int")
    rep = _report(fact, [V.foreign_key("fk", "fk", dim, "k")])
    assert rep == {"fk": 2}          # two 99s; the NULL fk is not a violation


def test_expectations_single_scan_plan(spark):
    """All scan-level rules (incl. unique) must share ONE aggregate scan."""
    from supersonic_spark import validate as V
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m"))
    rep = V.expectations_report(df, [
        V.not_null("nn", "m"),
        V.in_range("rng", "id", 0, 1000),
        V.unique("uq", "m"),
    ])
    plan = rep._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("range (0, 100") == 1


# --- inverted index ----------------------------------------------------------

def test_inverted_index_postings_sorted_and_counted(spark):
    from supersonic_spark.text.retrieval import inverted_index
    docs = spark.createDataFrame(
        [(3, "b a b"), (1, "a b"), (2, "a a a")],
        "doc_id long, text string")
    rows = {r.token: (r.df_docs, r.postings)
            for r in inverted_index(docs).collect()}
    assert rows["a"] == (3, "1:1,2:3,3:1")
    assert rows["b"] == (2, "1:1,3:2")


def test_inverted_index_df_bounds(spark):
    from supersonic_spark.text.retrieval import inverted_index
    docs = spark.createDataFrame(
        [(1, "a b hapax"), (2, "a b"), (3, "a")],
        "doc_id long, text string")
    toks = {r.token
            for r in inverted_index(docs, min_df=2, max_df=2).collect()}
    assert toks == {"b"}             # hapax pruned by min_df, 'a' by max_df


# --- winnowing fingerprints --------------------------------------------------

def _fps(spark, rows, k=3, w=4):
    from supersonic_spark.text.winnow import winnow_fingerprints
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return winnow_fingerprints(docs, k=k, w=w).collect()


def test_winnow_shared_substring_guarantee(spark):
    # any shared substring of >= w + k - 1 = 6 tokens must yield an
    # identical selected fingerprint hash in both documents
    shared = "q w e r t y"
    rows = [(1, "a b c " + shared + " x z"),
            (2, shared + " m n o p"),
            (3, "completely different words here indeed truly")]
    out = _fps(spark, rows)
    h1 = {r.fp_hash for r in out if r.doc_id == 1}
    h2 = {r.fp_hash for r in out if r.doc_id == 2}
    h3 = {r.fp_hash for r in out if r.doc_id == 3}
    assert h1 & h2
    assert not (h1 & h3) and not (h2 & h3)


def test_winnow_short_doc_single_fingerprint(spark):
    # 4 tokens -> 2 positional 3-grams < w: exactly one global-min fp
    out = _fps(spark, [(1, "a b c d")])
    assert len(out) == 1 and out[0].fp_pos in (0, 1)


def test_winnow_positions_are_gram_positions(spark):
    # identical docs select identical (pos, hash) pairs
    out = _fps(spark, [(1, "a b c d e f g h"), (2, "a b c d e f g h")])
    sel = {d: sorted((r.fp_pos, r.fp_hash) for r in out if r.doc_id == d)
           for d in (1, 2)}
    assert sel[1] == sel[2] and len(sel[1]) >= 1
    n_grams = 6                       # 8 tokens, k=3
    assert all(0 <= p < n_grams for p, _ in sel[1])


def test_winnow_density(spark):
    # expected selected fraction ~ 2/(w+1); allow a loose band
    import random
    rng = random.Random(7)
    words = [f"w{rng.randrange(50)}" for _ in range(400)]
    out = _fps(spark, [(1, " ".join(words))], k=3, w=4)
    frac = len(out) / (400 - 2)
    assert 0.2 < frac < 0.6


# --- prefix-filtering Jaccard join ------------------------------------------

def test_prefix_join_equals_exact_pairs(spark):
    from supersonic_spark.text.dedup import (jaccard_prefix_pairs,
                                             ngram_jaccard_pairs)
    rows = [
        (1, "apple banana cherry date"),
        (2, "apple banana cherry elderberry"),          # J=3/5 with 1
        (3, "apple banana"),                            # J=2/4 with 1
        (4, "zebra yak xerus walrus vole unau"),
        (5, "zebra yak xerus walrus vole tapir"),       # J=5/7 with 4
        (6, "the the the common common words"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.jaccard
           for r in jaccard_prefix_pairs(docs, "text", "doc_id",
                                         n=1, threshold=0.5).collect()}
    exact = {(r.id_a, r.id_b): r.jaccard
             for r in ngram_jaccard_pairs(docs, "text", "doc_id",
                                          n=1, threshold=0.5,
                                          df_cap=None).collect()}
    assert got == exact
    assert (1, 2) in got and got[(1, 2)] == pytest.approx(0.6)
    assert (4, 5) in got and got[(4, 5)] == pytest.approx(0.7143)
    assert (1, 3) in got and got[(1, 3)] == pytest.approx(0.5)


def test_prefix_join_hot_gram_never_joins(spark):
    """A gram shared by every doc must not appear as a candidate key:
    prefixes are the RAREST grams, so 'hot' sorts out of every prefix
    once docs have enough rarer grams."""
    from supersonic_spark.text.dedup import jaccard_prefix_pairs
    rows = [(i, f"hot u{i}a u{i}b u{i}c") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = jaccard_prefix_pairs(docs, "text", "doc_id",
                               n=1, threshold=0.5).collect()
    assert out == []                  # J = 1/7 < 0.5 for every pair
