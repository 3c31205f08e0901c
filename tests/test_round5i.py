"""Round-5 wave 5i: reciprocal-rank fusion, anti-entropy bucket diff."""

from __future__ import annotations

from pyspark.sql import functions as F


# --- RRF ----------------------------------------------------------------------

def _ranked(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, score double")


def test_rrf_exact_values_and_order(spark):
    from supersonic_spark.text.retrieval import rrf_fuse
    # list A ranks: d1=1 d2=2 d3=3 ; list B ranks: d3=1 d1=2
    a = _ranked(spark, [(1, 0.9), (2, 0.8), (3, 0.7)])
    b = _ranked(spark, [(3, 5.0), (1, 1.0)])
    got = {r["doc_id"]: r.asDict()
           for r in rrf_fuse([a, b], k0=60, k=10).collect()}
    assert got[1]["rrf"] == round(1 / 61 + 1 / 62, 6)
    assert got[3]["rrf"] == round(1 / 63 + 1 / 61, 6)
    assert got[2]["rrf"] == round(1 / 62, 6)       # absent from B
    assert got[2]["n_lists"] == 1 and got[1]["n_lists"] == 2
    order = [r["doc_id"] for r in rrf_fuse([a, b], k0=60, k=10).collect()]
    assert order == [1, 3, 2]      # d1 beats d3: 1/61+1/62 > 1/61+1/63


def test_rrf_ties_break_by_id_and_k_cuts(spark):
    from supersonic_spark.text.retrieval import rrf_fuse
    a = _ranked(spark, [(7, 1.0), (5, 1.0), (9, 0.5)])
    out = rrf_fuse([a], k0=60, k=2).collect()
    # equal scores rank by id: d5 rank1, d7 rank2; k=2 drops d9
    assert [(r["doc_id"], r["rrf"]) for r in out] == [
        (5, round(1 / 61, 6)), (7, round(1 / 62, 6))]


# --- anti-entropy diff --------------------------------------------------------

def _docs(spark, rows):
    return spark.createDataFrame(rows, "id long, text string, tag string")


def test_antientropy_equal_tables_empty_diff(spark):
    from supersonic_spark.validate import table_diff_buckets
    a = _docs(spark, [(i, f"t{i}", "x") for i in range(200)])
    b = _docs(spark, [(i, f"t{i}", "x") for i in range(200)]).repartition(7)
    assert table_diff_buckets(a, b, "id", ["text", "tag"],
                              n_buckets=256).count() == 0


def test_antientropy_statuses(spark):
    from supersonic_spark.validate import table_diff_buckets
    base = [(i, f"t{i}", "x") for i in range(50)]
    a = _docs(spark, base + [(999, "gone", "x")])
    b_rows = [(i, ("EDITED" if i == 7 else f"t{i}"), "x")
              for i in range(50)] + [(1000, "new", "x")]
    b = _docs(spark, b_rows)
    diff = table_diff_buckets(a, b, "id", ["text", "tag"],
                              n_buckets=1 << 20)  # singleton buckets
    by = {r["status"]: (r["n_a"], r["n_b"]) for r in diff.collect()}
    assert by == {"removed": (1, 0), "added": (0, 1), "changed": (1, 1)}


def test_antientropy_null_vs_empty_distinct(spark):
    from supersonic_spark.validate import table_diff_buckets
    a = _docs(spark, [(1, None, "x")])
    b = _docs(spark, [(1, "", "x")])
    assert table_diff_buckets(a, b, "id", ["text", "tag"],
                              n_buckets=16).count() == 1


def test_antientropy_detects_column_swap(spark):
    # same concatenated bytes, different columns -> the \x1f separator
    # must keep them distinct
    from supersonic_spark.validate import table_diff_buckets
    a = _docs(spark, [(1, "ab", "c")])
    b = _docs(spark, [(1, "a", "bc")])
    assert table_diff_buckets(a, b, "id", ["text", "tag"],
                              n_buckets=16).count() == 1
