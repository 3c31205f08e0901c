"""Driver contract for the spark-graft builder (PySpark target).

`queries()` exposes the engine's operator inventory (SURVEY.md §2) plus the
training-data pipeline operators, each as a (spark, sf_dir) -> DataFrame
callable; `oracle_sql()` gives the DuckDB-equivalent ANSI SQL. Every
computed column is aliased identically on both sides; money sums go
through exact integer cents to dodge float-accumulation divergence
between engines.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

# make `supersonic_spark` importable no matter how the driver loads this file
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = (_REPO + os.pathsep
                            + os.environ.get("PYTHONPATH", "")).rstrip(os.pathsep)

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

_PYFILES_SENT: set[int] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship supersonic_spark to executors via addPyFile so mapInArrow
    kernels unpickle even when the driver's PYTHONPATH lacks the repo."""
    key = id(spark.sparkContext)
    if key in _PYFILES_SENT:
        return
    import zipfile
    zpath = os.path.join("/tmp", f"supersonic_spark_entry_{os.getpid()}.zip")
    with zipfile.ZipFile(zpath, "w") as z:  # always fresh (code may change)
        pkg = os.path.join(_REPO, "supersonic_spark")
        for root, _d, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, _REPO))
    try:
        spark.sparkContext.addPyFile(zpath)
    except Exception as e:
        # a genuine shipping failure would otherwise surface later as a
        # confusing worker ImportError — say what happened, then rely on
        # the PYTHONPATH fallback (already-added is the common benign case)
        import sys
        print(f"supersonic_spark: addPyFile({zpath}) failed ({e!r}); "
              "workers will import from PYTHONPATH", file=sys.stderr)
    _PYFILES_SENT.add(key)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ship_package(spark)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _spread(df: DataFrame) -> DataFrame:
    """Fan a narrow scan out to the session's parallelism before
    CPU-heavy per-row work (regex/md5/explode/codec kernels). The
    testdata tables are single-row-group parquet files, so their scans
    are 1-task no matter the split size; everything computed inside that
    scan stage runs on one core of 32. One round-robin exchange of the
    (small) input buys full-width whole-stage codegen for the expensive
    projection (guide §2.4: shuffle a lightweight input once so the
    heavy compute parallelizes). No-op when the scan already has enough
    partitions (a real cluster's many-file table)."""
    n = df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n) if df.rdd.getNumPartitions() < n else df


def _cents(col):
    """Exact integer cents from a 2-dp double — portable across engines."""
    return F.round(col * 100, 0).cast("long")


# ---------------------------------------------------------------------------
# §2.1/2.2 scans, projections, computed expressions, filters
# ---------------------------------------------------------------------------

def q_scan_project(spark, sf):
    return (_t(spark, sf, "lineitem")
            .select(F.col("l_orderkey").alias("orderkey"),
                    F.col("l_partkey").alias("partkey"),
                    F.col("l_quantity").alias("qty")))


def q_compute_expr(spark, sf):
    li = _t(spark, sf, "lineitem")
    return li.select(
        "l_orderkey", "l_linenumber",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("disc_price_cents"),
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))
               * (1 + F.col("l_tax"))).alias("charge_cents"),
        (F.col("l_quantity").cast("long") % 2 == 0).alias("qty_even"))


def q_filter_null_semantics(spark, sf):
    # NULL predicate drops the row (filter.cc:170-199): nullif injects NULLs
    ev = _t(spark, sf, "events")
    val = F.nullif(F.col("event_type"), F.lit("error"))
    return (ev.withColumn("et", val)
              .filter(F.col("et") > F.lit("purchase"))
              .select("event_id", "et"))


def q_filter_in_list(spark, sf):
    return (_t(spark, sf, "orders")
            .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
            .select("o_orderkey", "o_orderpriority"))


def q_generate_sequence(spark, sf):
    # Generate + Sequence() terminal expression (generate.h:33,
    # terminal_expressions.h:36-71)
    return (spark.range(0, 10000)
            .select(F.col("id"),
                    (F.col("id") * 7 % 13).alias("m13"),
                    (F.col("id") * F.col("id")).alias("sq")))


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

def q_hash_join_inner(spark, sf):
    from supersonic_spark.operators import hash_join
    li = _t(spark, sf, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey")
    o = _t(spark, sf, "orders")
    return (hash_join(li, o, ["o_orderkey"], "inner")
            .select("o_orderkey", "l_linenumber", "o_orderstatus",
                    _cents(F.col("o_totalprice")).alias("totalprice_cents")))


def q_hash_join_left_outer(spark, sf):
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (o.join(c, o.o_custkey == c.c_custkey, "left")
             .select("o_orderkey", "c_name", "c_mktsegment"))


def q_broadcast_join_unique(spark, sf):
    # KeyUniqueness fast path (hash_join.h:44-46) -> broadcast hash join
    from supersonic_spark.operators import hash_join
    c = _t(spark, sf, "customer")
    n = _t(spark, sf, "nation").withColumnRenamed("n_nationkey", "c_nationkey")
    return (hash_join(c, n.select("c_nationkey", "n_name"),
                      ["c_nationkey"], "inner", rhs_unique=True)
            .select("c_custkey", "n_name"))


def q_foreign_filter_semi(spark, sf):
    from supersonic_spark.operators import foreign_filter
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (foreign_filter(o.withColumnRenamed("o_orderkey", "ok"), li
                           .withColumnRenamed("l_orderkey", "ok"), "ok", "ok")
            .select(F.col("ok").alias("o_orderkey"), "o_orderstatus"))


def q_anti_join_orphans(spark, sf):
    # orders that have no lineitems (left anti join)
    o = _t(spark, sf, "orders")
    li = _t(spark, sf, "lineitem")
    return (o.join(li.select(F.col("l_orderkey").alias("o_orderkey")).distinct(),
                   "o_orderkey", "left_anti")
             .select("o_orderkey", "o_orderstatus"))


def q_rowid_merge_join(spark, sf):
    from supersonic_spark.operators import rowid_merge_join
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf, "nation").select("n_nationkey", "n_name")
    return (rowid_merge_join(c, n, "c_nationkey", ["n_nationkey"])
            .select("c_custkey", "n_name"))


def q_lookup_index_multimatch(spark, sf):
    # 0..n matches per probe (lookup_index.h:29-58). The per-partkey
    # aggregation runs BEFORE the probe (guide §2.3 "aggregate before
    # you shuffle"): counts/sums are key-local, so aggregating the fact
    # side first shrinks the probe input 6M -> 200k rows and keeps the
    # string brand out of the aggregate hash keys — measured
    # 1.19 s -> 0.69 s warm at sf1.0 (interleaved medians). Identical
    # results: p_partkey is unique in part (PK), so grouping the joined
    # rows by (p_partkey, p_brand) equals grouping the fact side by
    # partkey and probing once per group.
    from supersonic_spark.operators import lookup_index
    p = _t(spark, sf, "part").select("p_partkey", "p_brand")
    li = _t(spark, sf, "lineitem").select(
        F.col("l_partkey").alias("p_partkey"), "l_quantity")
    agg = (li.groupBy("p_partkey")
           .agg(F.count("*").alias("n_matches"),
                F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")))
    return (lookup_index(agg, p, ["p_partkey"], "p_partkey")
            .select("p_partkey", "p_brand", "n_matches", "sum_qty"))


def q_coalesce_zip(spark, sf):
    # column-wise positional zip (coalesce.h:16-25)
    from supersonic_spark.operators import coalesce_zip
    r = _t(spark, sf, "region").select("r_regionkey", "r_name")
    s = (_t(spark, sf, "supplier").orderBy("s_suppkey").limit(5)
         .select("s_suppkey", "s_name"))
    return coalesce_zip(r.orderBy("r_regionkey"), s)


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

def q_group_agg_pricing_summary(spark, sf):
    # flagship: the reference primer's GroupedSums generalized
    # (primer.cc:241-292) as a TPC-H-Q1-style pricing summary
    li = _t(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(_cents(F.col("l_extendedprice"))).alias("sum_base_cents"),
                 F.sum(_cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
                 .alias("sum_disc_cents"),
                 F.count("*").alias("count_order")))


def q_agg_min_max(spark, sf):
    ev = _t(spark, sf, "events")
    return (ev.groupBy("event_type")
            .agg(F.min(_cents(F.col("value"))).alias("min_cents"),
                 F.max(_cents(F.col("value"))).alias("max_cents"),
                 F.min("ts").alias("min_ts"),
                 F.max("user_id").alias("max_user")))


def q_agg_distinct(spark, sf):
    o = _t(spark, sf, "orders")
    return (o.groupBy("o_orderstatus")
            .agg(F.countDistinct("o_custkey").alias("n_cust"),
                 F.countDistinct("o_orderpriority").alias("n_prio"),
                 F.count("*").alias("n_rows")))


def q_agg_concat(spark, sf):
    # CONCAT aggregate (supersonic.proto:91-99) made deterministic by sorting
    n = _t(spark, sf, "nation")
    return (n.groupBy("n_regionkey")
            .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",")
                 .alias("names")))


def q_agg_first_last(spark, sf):
    # FIRST/LAST made order-explicit via min_by/max_by
    ev = _t(spark, sf, "events")
    return (ev.groupBy("user_id")
            .agg(F.min_by("event_type", "event_id").alias("first_type"),
                 F.max_by("event_type", "event_id").alias("last_type"),
                 F.count("*").alias("n")))


def q_scalar_agg_empty(spark, sf):
    # total aggregation: exactly 1 row even for empty input
    # (aggregate.h:338-345)
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") < -1)
    return li.agg(F.count("*").alias("n"),
                  F.sum(F.col("l_quantity").cast("long")).alias("s"),
                  F.max("l_shipdate").alias("mx"))


def q_agg_all_null_group(spark, sf):
    # empty/all-NULL group -> NULL (column_aggregator.h:37-43)
    li = _t(spark, sf, "lineitem")
    nulled = F.nullif(F.col("l_discount"), F.col("l_discount"))
    return (li.groupBy("l_returnflag")
            .agg(F.sum(nulled).alias("sum_all_null"),
                 F.max(nulled).alias("max_all_null"),
                 F.count("*").alias("n")))


def q_group_agg_with_limit(spark, sf):
    # GroupAggregate with unique-key cap + catch-all row
    # (aggregate.h:264-276)
    from supersonic_spark.operators import group_aggregate_with_limit
    o = _t(spark, sf, "orders").withColumn(
        "price_cents", _cents(F.col("o_totalprice"))).withColumn(
        "custkey", F.col("o_custkey").cast("string"))
    return group_aggregate_with_limit(o, "custkey", "price_cents", 5)


def q_multi_distinct_rewrite(spark, sf):
    # multiple DISTINCT aggregations — the hybrid transform
    # (hybrid_group_utils.h:22-70). Spark's native Expand rewrite triples
    # every row and pushes 3x-wide keys through two hash-aggregate
    # passes; three independent single-distinct aggregates (each a
    # narrow partial-dedup -> tiny exchange) joined on the group key run
    # as parallel stages and were measured 1.6x faster at sf1.0
    # (2.34 s -> 1.46 s interleaved medians; see OPTIMIZATION_r06.md).
    # Identical results: each aggregate groups the same rows, and the
    # TPC-H returnflag domain is non-null, so the inner equi joins on
    # the group key lose nothing.
    li = _t(spark, sf, "lineitem")
    a = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("d_parts"))
    b = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("d_supps"))
    c = li.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("d_orders"))
    return (a.join(b, "l_returnflag").join(c, "l_returnflag")
            .select("l_returnflag", "d_parts", "d_supps", "d_orders"))


def q_avg_composed(spark, sf):
    # AVG absent in reference -> composed from SUM/COUNT
    o = _t(spark, sf, "orders")
    return (o.groupBy("o_orderpriority")
            .agg(F.sum(_cents(F.col("o_totalprice"))).alias("sum_cents"),
                 F.count("*").alias("n"))
            .withColumn("avg_cents",
                        F.round(F.col("sum_cents") / F.col("n"), 4)))


# ---------------------------------------------------------------------------
# §2.5 sort / limit / top-k
# ---------------------------------------------------------------------------

def q_sort_topk(spark, sf):
    from supersonic_spark.operators import extended_sort
    o = _t(spark, sf, "orders").select(
        "o_orderkey", _cents(F.col("o_totalprice")).alias("price_cents"))
    return extended_sort(o, [("price_cents", "desc"), ("o_orderkey", "asc")],
                         limit=100)


def q_sort_case_insensitive(spark, sf):
    from supersonic_spark.operators import extended_sort
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    return extended_sort(p, [("p_type", "asc"), ("p_partkey", "asc")],
                         limit=50, case_sensitive=False) \
        .select("p_partkey", F.lower(F.col("p_type")).alias("p_type_lower"))


def q_sort_nulls_first(spark, sf):
    # NULLs sort before non-NULLs (sort.cc:16-83)
    ev = _t(spark, sf, "events").withColumn(
        "v", F.nullif(F.col("event_type"), F.lit("view")))
    return (ev.orderBy(F.col("v").asc_nulls_first(), F.col("event_id").asc())
              .limit(150).select("event_id", "v"))


def q_limit_offset(spark, sf):
    from supersonic_spark.operators import limit_offset
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderstatus")
    return limit_offset(o, limit=100, offset=200, order=["o_orderkey"])


# ---------------------------------------------------------------------------
# §2.6 set operations
# ---------------------------------------------------------------------------

def q_merge_union_all(spark, sf):
    from supersonic_spark.operators import merge_union_all
    o = _t(spark, sf, "orders")
    hi = o.filter(F.col("o_orderpriority") == "1-URGENT") \
          .select("o_orderkey", "o_orderpriority")
    lo = o.filter(F.col("o_orderpriority") == "5-LOW") \
          .select("o_orderkey", "o_orderpriority")
    return merge_union_all([hi, lo])


def q_distinct(spark, sf):
    return (_t(spark, sf, "lineitem")
            .select("l_returnflag", "l_linestatus").distinct())


def q_intersect_nations(spark, sf):
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


def q_except_nations(spark, sf):
    # EXCEPT (set semantics) = DataFrame.subtract
    c = _t(spark, sf, "customer").select(F.col("c_nationkey").alias("nk"))
    s = _t(spark, sf, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.subtract(s)


# ---------------------------------------------------------------------------
# §2.7 scalar expression families
# ---------------------------------------------------------------------------

def q_expr_math(spark, sf):
    li = _t(spark, sf, "lineitem").filter(F.col("l_linenumber") == 1)
    q = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        F.round(F.abs(-q), 4).alias("abs_q"),
        F.round(F.sqrt(q), 4).alias("sqrt_q"),
        F.round(F.exp(q / 100), 4).alias("exp_q"),
        F.round(F.log(q + 1), 4).alias("ln_q"),
        F.round(F.log10(q + 1), 4).alias("log10_q"),
        F.round(F.pow(q, 2), 4).alias("pow_q"),
        F.ceil(q / 7).cast("long").alias("ceil_q"),
        F.floor(q / 7).cast("long").alias("floor_q"),
        F.round(F.sin(q), 4).alias("sin_q"),
        (F.col("l_quantity").cast("long") % 5).alias("mod_q"))


def q_expr_string(spark, sf):
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.upper(F.col("c_mktsegment")).alias("seg_upper"),
        F.lower(F.col("c_name")).alias("name_lower"),
        F.length(F.col("c_name")).alias("name_len"),
        F.substring(F.col("c_name"), 10, 5).alias("name_sub"),
        F.concat_ws("|", F.col("c_mktsegment"), F.col("c_name")).alias("joined"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust"))
        .alias("name_repl"),
        F.trim(F.lit("  pad  ")).alias("trimmed"),
        F.col("c_name").contains("0").alias("has_zero"))


def q_expr_regexp(spark, sf):
    c = _t(spark, sf, "customer")
    return (c.filter(F.col("c_name").rlike("[0-9]{2,}"))
             .select("c_custkey",
                     F.regexp_extract(F.col("c_name"), "([0-9]+)", 1)
                      .alias("digits"),
                     F.regexp_replace(F.col("c_name"), "[0-9]", "#")
                      .alias("masked")))


def q_expr_regexp2(spark, sf):
    # remaining regexp/logic leaves: anchored full match
    # (RegexpFullMatch, reference regexp_expressions.h:43), template
    # rewrite with capture groups (RegexpRewrite,
    # regexp_expressions.h:59,76), boolean XOR / AND-NOT
    # (elementary_expressions.h:101-119)
    c = _t(spark, sf, "customer")
    full = F.col("c_name").rlike("^Customer#[0-9]+$")
    pos = F.col("c_acctbal") > 0
    ends_odd = F.col("c_name").rlike("[13579]$")
    return c.select(
        "c_custkey",
        full.alias("full_match"),
        F.regexp_replace(F.col("c_name"), "^Customer#0*([0-9]+)$", "id=$1")
         .alias("rewritten"),
        (pos != ends_odd).alias("xor_pm"),
        (pos & ~ends_odd).alias("and_not"))


def q_expr_datetime(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.year("ts").alias("y"),
        F.month("ts").alias("mo"),
        F.dayofmonth("ts").alias("d"),
        F.hour("ts").alias("h"),
        F.minute("ts").alias("mi"),
        F.second("ts").alias("s"),
        F.quarter("ts").alias("qtr"),
        F.unix_timestamp("ts").alias("epoch_s"),
        F.date_format("ts", "yyyy-MM-dd HH").alias("fmt"),
        (F.col("ts") + F.expr("INTERVAL 30 DAYS")).alias("plus30d"))


def q_expr_parse_datetime(spark, sf):
    # ParseDateTime / DateFormat round-trip + quiet parse -> NULL
    # (date_expressions.h:31-175, ParseStringQuiet analogue)
    ev = _t(spark, sf, "events")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return ev.select(
        "event_id",
        F.to_timestamp(F.date_format("ts", fmt), fmt).alias("parsed_sec"),
        F.date_format("ts", "yyyy/MM").alias("ym"),
        F.expr("try_to_timestamp('not a date', 'yyyy-MM-dd')").alias("bad"))


def q_expr_case_cast(spark, sf):
    o = _t(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", "hot")
         .when(F.col("o_orderpriority") == "5-LOW", "cold")
         .otherwise("warm").alias("heat"),
        F.col("o_orderkey").cast("string").alias("key_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")),
                   F.lit("OPEN")).alias("status_filled"),
        F.substring(F.col("o_orderpriority"), 1, 1).try_cast("int")
        .alias("prio_num"))


def q_expr_bitwise(spark, sf):
    o = _t(spark, sf, "orders").filter(F.col("o_orderkey") < 500)
    k = F.col("o_orderkey")
    return o.select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(16)).alias("bor"),
        k.bitwiseXOR(F.lit(85)).alias("bxor"),
        F.shiftleft(k, 2).alias("shl"),
        F.shiftright(k, 1).alias("shr"))


def q_expr_hashing(spark, sf):
    # portable fingerprint (hashing_expressions.h:28-35 analogue)
    from supersonic_spark.text import portable_hash64
    c = _t(spark, sf, "customer")
    return c.select("c_custkey",
                    portable_hash64(F.col("c_name")).alias("name_hash"),
                    F.sha2(F.col("c_name").cast("binary"), 256).alias("sha"))


# ---------------------------------------------------------------------------
# §2.8 stateful / running expressions (windows over explicit order)
# ---------------------------------------------------------------------------

def _events_window():
    return Window.partitionBy("user_id").orderBy("ts", "event_id")


def q_stateful_changed(spark, sf):
    from supersonic_spark.functions import changed
    ev = _t(spark, sf, "events")
    w = _events_window()
    flagged = ev.withColumn("chg", changed(F.col("event_type"), w))
    return (flagged.groupBy("user_id")
            .agg(F.sum(F.when(F.col("chg"), 1).otherwise(0)).alias("n_runs"),
                 F.count("*").alias("n_events")))


def q_stateful_running_sum(spark, sf):
    from supersonic_spark.functions import running_sum
    ev = _t(spark, sf, "events").withColumn("cents", _cents(F.col("value")))
    return ev.select("event_id",
                     running_sum(F.col("cents"), _events_window())
                     .alias("rsum_cents"))


def q_stateful_smudge(spark, sf):
    from supersonic_spark.functions import smudge
    ev = _t(spark, sf, "events").withColumn(
        "cents", F.when(F.col("event_type") != "error",
                        _cents(F.col("value"))))
    return ev.select("event_id",
                     smudge(F.col("cents"), _events_window())
                     .alias("locf_cents"))


def q_stateful_running_min_flush(spark, sf):
    from supersonic_spark.functions import running_min_with_flush
    ev = _t(spark, sf, "events").withColumn("cents", _cents(F.col("value")))
    rmin = running_min_with_flush(
        F.col("cents"), F.col("event_type") == "signup",
        [F.col("user_id")], [F.col("ts"), F.col("event_id")])
    return ev.select("event_id", rmin.alias("rmin_cents"))


def q_stateful_smudge_if(spark, sf):
    from supersonic_spark.functions import smudge_if
    ev = _t(spark, sf, "events").withColumn("cents", _cents(F.col("value")))
    out = smudge_if(F.col("cents"), F.col("event_type") == "error",
                    _events_window())
    return ev.select("event_id", out.alias("v_cents"))


def q_window_rank(spark, sf):
    # ranking/analytic windows (absent in reference; Spark-native)
    ev = _t(spark, sf, "events")
    w = _events_window()
    return ev.select(
        "event_id",
        F.row_number().over(w).alias("rn"),
        F.rank().over(Window.partitionBy("user_id")
                      .orderBy(F.col("event_type"))).alias("rk"),
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_id").over(w).alias("next_id"))


def q_rrf_hybrid_retrieval(spark, sf):
    """Hybrid retrieval via reciprocal-rank fusion: BM25 top-50 for
    {spark, window, hash} fused with cosine top-50 against query
    vector 0 (embeddings restricted to doc-aligned ids by a semi join).
    RRF consumes only ranks, so the heterogeneous scores need no
    normalization. Output: top-20 (doc_id, rrf, n_lists)."""
    import pyarrow.parquet as pq
    from supersonic_spark.ann import cosine_topk
    from supersonic_spark.text.retrieval import bm25_topk, rrf_fuse
    d = _t(spark, sf, "documents")
    lex = bm25_topk(d, ["spark", "window", "hash"], k=50)
    qvec = pq.read_table(f"{sf}/embeddings.parquet") \
             .column("embedding")[0].as_py()
    e = (_t(spark, sf, "embeddings")
         .join(d.select(F.col("doc_id").alias("vec_id")), "vec_id",
               "left_semi"))
    vec = (cosine_topk(e, qvec, 50)
           .select(F.col("vec_id").alias("doc_id"),
                   F.col("cos_sim").alias("score")))
    return rrf_fuse([lex, vec], k0=60, k=20)


def q_antientropy_diff(spark, sf):
    """Anti-entropy bucket diff between documents and a corrupted
    replica (rows %97 dropped, %101 edited, %211 re-keyed additions):
    each side reduces to 4096 (bucket, count, XOR-of-row-hashes)
    summaries; the full-outer join flags exactly the buckets needing
    repair as added/removed/changed. Output: differing buckets only."""
    from supersonic_spark.validate import table_diff_buckets
    d = _t(spark, sf, "documents")
    edited = F.when(F.col("doc_id") % 101 == 0,
                    F.concat(F.col("text"), F.lit(" [edited]"))) \
              .otherwise(F.col("text"))
    b = (d.filter(F.col("doc_id") % 97 != 0)
          .withColumn("text", edited))
    extra = (d.filter(F.col("doc_id") % 211 == 0)
              .withColumn("doc_id", F.col("doc_id") + 1000000))
    return table_diff_buckets(d, b.unionAll(extra), "doc_id",
                              ["text", "lang", "source"], n_buckets=4096)


def q_window_rank_variants(spark, sf):
    """Distribution/tile window functions over the per-user event
    stream: ntile quartiles, percent_rank, cume_dist (doubles rounded
    to 6), and nth_value(3) over the running frame — the analytic
    surface q_window_rank leaves out. One user-keyed window exchange
    serves every function."""
    ev = _t(spark, sf, "events")
    w = _events_window()
    running = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return ev.select(
        "event_id",
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.nth_value("event_id", 3).over(running).alias("third_id"))


def q_asof_join(spark, sf):
    # as-of join: latest signup value at-or-before each event (per user)
    from supersonic_spark.operators.asof import as_of_join
    ev = _t(spark, sf, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", "ts", _cents(F.col("value")).alias("signup_cents")))
    out = as_of_join(left, right, key="user_id", on="ts",
                     value_cols=["signup_cents"])
    return out.select("event_id", "signup_cents")


def q_range_join(spark, sf):
    # point-in-interval join: events joined to per-user value bands
    from supersonic_spark.operators.asof import range_join
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 2000)
    bands = spark.range(0, 10).select(
        (F.col("id") % 5).cast("int").alias("band_user"),
        (F.col("id") * 50.0).alias("lo"),
        (F.col("id") * 50.0 + 60.0).alias("hi"),
        F.col("id").alias("band_id"))
    left = ev.select((F.col("user_id") % 5).cast("int").alias("band_user"),
                     "event_id", "value")
    out = range_join(left, bands, "band_user", "value", "lo", "hi")
    return out.select("event_id", "band_id",
                      _cents(F.col("value")).alias("value_cents"))


def q_range_join_bucketed(spark, sf):
    # same point-in-interval semantics as range_join, but through the
    # 100 TB plan: intervals exploded into fixed-width bins, equi join on
    # (key, bin) — no BroadcastNestedLoopJoin anywhere in the plan
    from supersonic_spark.operators.asof import range_join_bucketed
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 2000)
    bands = spark.range(0, 10).select(
        (F.col("id") % 5).cast("int").alias("band_user"),
        (F.col("id") * 50.0).alias("lo"),
        (F.col("id") * 50.0 + 60.0).alias("hi"),
        F.col("id").alias("band_id"))
    left = ev.select((F.col("user_id") % 5).cast("int").alias("band_user"),
                     "event_id", "value")
    out = range_join_bucketed(left, bands, "band_user", "value", "lo", "hi",
                              bin_width=50)
    return out.select("event_id", "band_id",
                      _cents(F.col("value")).alias("value_cents"))


def q_cube_agg(spark, sf):
    li = _t(spark, sf, "lineitem")
    return (li.cube("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.count("*").alias("n")))


def q_rollup_agg(spark, sf):
    o = _t(spark, sf, "orders")
    return (o.rollup("o_orderstatus", "o_orderpriority")
            .agg(F.count("*").alias("n"),
                 F.sum(_cents(F.col("o_totalprice"))).alias("sum_cents")))


def q_session_windows(spark, sf):
    # event-time session windows (gap 10 min) — batch semantics of the
    # streaming session_window operator
    ev = _t(spark, sf, "events")
    return (ev.groupBy(F.session_window("ts", "10 minutes").alias("sw"),
                       F.col("user_id"))
            .agg(F.count("*").alias("n"),
                 F.sum(_cents(F.col("value"))).alias("sum_cents"))
            .select("user_id",
                    F.col("sw.start").alias("sess_start"),
                    F.col("sw.end").alias("sess_end"),
                    "n", "sum_cents"))


def q_topk_per_group(spark, sf):
    # top-3 orders by price within each priority (rank-filter pattern)
    o = _t(spark, sf, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (o.withColumn("rk", F.row_number().over(w))
             .filter(F.col("rk") <= 3)
             .select("o_orderpriority", "o_orderkey",
                     _cents(F.col("o_totalprice")).alias("price_cents"),
                     "rk"))


def q_percentiles(spark, sf):
    # exact interpolated percentiles (reference has no percentile agg)
    li = _t(spark, sf, "lineitem").withColumn(
        "price_cents", _cents(F.col("l_extendedprice")))
    return (li.groupBy("l_returnflag")
            .agg(F.round(F.expr("percentile(price_cents, 0.5)"), 4).alias("p50"),
                 F.round(F.expr("percentile(price_cents, 0.9)"), 4).alias("p90"),
                 F.round(F.expr("percentile(price_cents, 0.99)"), 4).alias("p99")))


def q_grouping_sets(spark, sf):
    # explicit GROUPING SETS (beyond the reference's plain GroupAggregate)
    li = _t(spark, sf, "lineitem")
    li.createOrReplaceTempView("li_gs")
    return spark.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
               count(*) AS n
        FROM li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """)


def q_expr_datetime2(spark, sf):
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.make_date(F.year("ts"), F.month("ts"), F.dayofmonth("ts"))
        .alias("d_made"),
        F.weekday("ts").alias("wd"),
        F.dayofyear("ts").alias("doy"),
        F.last_day("ts").alias("eom"),
        F.date_trunc("month", F.col("ts")).alias("month_start"),
        F.add_months(F.col("ts").cast("date"), 2).alias("plus2mo"),
        (F.col("ts") + F.expr("INTERVAL 45 MINUTES")).alias("plus45m"))


def q_expr_math2(spark, sf):
    ev = _t(spark, sf, "events")
    v = F.col("value")
    return ev.select(
        "event_id",
        F.signum(v - 50).cast("int").alias("sgn"),
        F.floor(v).cast("long").alias("trunc_v"),
        F.greatest(v, F.lit(50.0)).alias("gst"),
        F.least(v, F.lit(50.0)).alias("lst"),
        F.isnan(v).alias("is_nan"),
        F.round(F.atan2(v, F.lit(10.0)), 4).alias("at2"),
        F.round(F.lit(3.141592653589793), 4).alias("pi4"))


def q_expr_string2(spark, sf):
    # remaining string leaves: TrailingSubstring (right), leading slice,
    # pad/repeat/reverse, Format -> format_number
    # (string_expressions.h:29-102 TrailingSubstring/Format analogues)
    c = _t(spark, sf, "customer")
    return c.select(
        "c_custkey",
        F.expr("right(c_name, 5)").alias("name_tail"),
        F.expr("left(c_name, 4)").alias("name_head"),
        F.lpad(F.col("c_mktsegment"), 12, "*").alias("seg_lpad"),
        F.rpad(F.col("c_mktsegment"), 12, "*").alias("seg_rpad"),
        F.repeat(F.substring(F.col("c_name"), 1, 2), 3).alias("rep2"),
        F.reverse(F.col("c_mktsegment")).alias("seg_rev"),
        F.format_number(_cents(F.col("c_acctbal")), 0).alias("bal_fmt"))


def q_expr_math3(spark, sf):
    # hyperbolic + inverse-hyperbolic trig, IsInf / IsNormal analogues,
    # degrees/radians/cbrt (math_expressions.h:37-136 leaves)
    ev = _t(spark, sf, "events")
    x = F.col("value") / 50
    inf_mix = F.when(F.col("value") > 50, F.exp(F.lit(1000.0))) \
               .otherwise(F.col("value"))
    inf = F.lit(float("inf"))
    return ev.select(
        "event_id",
        F.round(F.sinh(x), 4).alias("sh"),
        F.round(F.cosh(x), 4).alias("ch"),
        F.round(F.tanh(x), 4).alias("th"),
        F.round(F.asinh(x), 4).alias("ash"),
        F.round(F.acosh(x + 1), 4).alias("ach"),
        F.round(F.atanh(x / 20), 4).alias("ath"),
        (F.abs(inf_mix) == inf).alias("is_inf"),
        ((~F.isnan(inf_mix)) & (F.abs(inf_mix) != inf)
         & (inf_mix != 0.0)).alias("is_normal"),
        F.round(F.degrees(x), 4).alias("deg"),
        F.round(F.radians(F.col("value")), 4).alias("rad"),
        F.round(F.cbrt(F.col("value")), 4).alias("cbr"))


def q_expr_make_datetime(spark, sf):
    # MakeDatetime + session-TZ Local conversions
    # (date_expressions.h:31-175: MakeDatetime, *Local variants); the TZ
    # round-trip uses a DST-free zone so both engines' tz-db lookups agree
    ev = _t(spark, sf, "events")
    return ev.select(
        "event_id",
        F.make_timestamp(
            F.year("ts"), F.month("ts"), F.dayofmonth("ts"),
            F.hour("ts"), F.minute("ts"), F.second("ts")).alias("ts_made"),
        F.from_utc_timestamp("ts", "Asia/Kolkata").alias("ist_wall"),
        F.to_utc_timestamp("ts", "Asia/Kolkata").alias("utc_from_ist"),
        F.datediff(F.col("ts").cast("date"),
                   F.lit("1995-01-01").cast("date")).alias("days_since"),
        F.weekofyear("ts").alias("woy"))


def q_expr_datetime3(spark, sf):
    # Microsecond leaf (reference date_expressions.h:31-175 lists
    # Microsecond alongside Second/Minute; the prior gates stop at
    # second). Build a µs-precision timestamp via EXACT integer epoch
    # arithmetic (no double fraction -> no 1µs rounding skew between
    # engines), then extract the sub-second field back three ways.
    ev = _t(spark, sf, "events")
    micros = (F.col("event_id") * 137) % 1000000
    # parquet ts is TIMESTAMP_NTZ; unix_micros needs TIMESTAMP — the cast
    # is numerically free under the UTC session both engines run in
    base = F.col("ts").cast("timestamp")
    us = F.unix_micros(base) + micros
    ts_us = F.timestamp_micros(us)
    return ev.select(
        "event_id",
        ts_us.cast("timestamp_ntz").alias("ts_us"),
        (us % 1000000).alias("micro"),
        F.date_format(ts_us, "SSSSSS").alias("frac_str"),
        us.alias("epoch_us"))


def q_expr_div_variants(spark, sf):
    # DivideSignaling / DivideQuiet / DivideNulling + integer div/mod
    # (reference arithmetic_expressions.h:31-101). Under ANSI Spark the
    # bare `/` IS the Signaling form (errors on zero — gated here behind
    # an explicit guard), try_divide is Quiet/Nulling (NULL on zero,
    # never NaN or error), and NULLIF-guarded div/% pin the integer
    # division and modulus forms.
    o = (_t(spark, sf, "orders")
         .select("o_orderkey", (F.col("o_orderkey") % 7).alias("dnm"),
                 _cents(F.col("o_totalprice")).alias("cents")))
    dnm, cents = F.col("dnm"), F.col("cents")
    return o.select(
        "o_orderkey",
        F.round(F.try_divide(cents.cast("double"), dnm.cast("double")), 4)
        .alias("quiet_div"),
        F.when(dnm != 0,
               F.round(cents.cast("double") / dnm.cast("double"), 4))
        .alias("signal_div_guarded"),
        F.expr("cents div nullif(dnm, 0)").alias("int_div"),
        (cents % F.nullif(dnm, F.lit(0))).alias("mod_v"))


def q_jobspec_declarative(spark, sf):
    # serialized-plan seam (BuildExpressionFromProto analogue)
    from supersonic_spark.plans.jobspec import build_job
    spec = {
        "table": f"{sf}/orders.parquet",
        "filter": "o_orderstatus = 'O'",
        "compute": {"price_cents": "CAST(round(o_totalprice*100,0) AS BIGINT)"},
        "group_by": ["o_orderpriority"],
        "aggregations": {"n": "count(*)", "sum_cents": "sum(price_cents)"},
        "sort": [{"column": "sum_cents", "order": "desc"}],
        "limit": 3,
    }
    return build_job(spark, spec)


def q_enum_roundtrip(spark, sf):
    # ENUM attribute surface (tuple_schema.h:42-74 EnumDefinition): symbol
    # -> dense code -> symbol, codes = sorted-distinct positions
    from supersonic_spark.enums import from_enum, to_enum
    o = _t(spark, sf, "orders")
    coded, symbols = to_enum(o, "o_orderpriority", code_col="prio_code")
    back = from_enum(coded, "prio_code", symbols, "prio_sym")
    return back.select("o_orderkey", "prio_code", "prio_sym")


def q_spy_observe(spark, sf):
    # Spy wiretap analogue: observation rides the plan without changing it
    from supersonic_spark.operators.spy import spy
    li = _t(spark, sf, "lineitem").filter(F.col("l_quantity") > 25)
    wired, _obs = spy(li, "after_filter")
    return wired.select("l_orderkey", "l_linenumber", "l_quantity")


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis)
# ---------------------------------------------------------------------------

def q_splitter_reuse(spark, sf):
    # Splitter / shared-scan DAG (splitter.h:46-70): one input consumed by
    # two readers. The branches aggregate by DIFFERENT keys, so Catalyst
    # cannot reuse the exchange — an eager localCheckpoint materializes
    # the filtered scan once and both branches read the checkpoint blocks
    # (single lineitem scan, honoring the Splitter single-scan contract).
    li = (_t(spark, sf, "lineitem").filter(F.col("l_quantity") > 10)
          .select("l_returnflag", "l_linestatus")
          .localCheckpoint(eager=True))
    a = (li.groupBy("l_returnflag")
           .agg(F.count("*").alias("n"))
           .withColumn("branch", F.lit("by_flag"))
           .withColumnRenamed("l_returnflag", "k"))
    b = (li.groupBy("l_linestatus")
           .agg(F.count("*").alias("n"))
           .withColumn("branch", F.lit("by_status"))
           .withColumnRenamed("l_linestatus", "k"))
    return a.unionByName(b)


def q_udaf_grouped(spark, sf):
    # §2.9 UDAF surface: Arrow-batched pandas_udf GROUPED_AGG
    from supersonic_spark.functions.udafs import weighted_avg_price
    li = _t(spark, sf, "lineitem")
    return (li.groupBy("l_returnflag")
            .agg(weighted_avg_price(F.col("l_extendedprice"),
                                    F.col("l_quantity")).alias("wavg_price")))


def q_dedup_lsh_pairs(spark, sf):
    from supersonic_spark.text.dedup import minhash_lsh_pairs
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    return minhash_lsh_pairs(d, "text", "doc_id", k=8, bands=4, shingle_n=1)


def q_dedup_clusters(spark, sf):
    # transitive closure of LSH candidate pairs -> duplicate clusters
    # (min-label propagation; oracle = DuckDB recursive CTE reachability)
    from supersonic_spark.operators.graph import connected_components
    from supersonic_spark.text.dedup import minhash_lsh_pairs
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=8, bands=4, shingle_n=1)
    return connected_components(pairs)


def q_dedup_exact(spark, sf):
    from supersonic_spark.text import exact_dedup
    return exact_dedup(_t(spark, sf, "documents"), "text", "doc_id")


def q_dedup_minhash_sig(spark, sf):
    from supersonic_spark.text.dedup import minhash_signature
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 50)
    return minhash_signature(d, "text", "doc_id", k=8, shingle_n=2)


def q_dedup_simhash(spark, sf):
    from supersonic_spark.text.dedup import simhash64
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 100)
    return simhash64(d, "text", "doc_id")


def q_ngram_jaccard(spark, sf):
    from supersonic_spark.text.dedup import ngram_jaccard_pairs
    d = _t(spark, sf, "documents")
    return ngram_jaccard_pairs(d, "text", "doc_id", group_col="source",
                               n=1, threshold=0.5, df_cap=64)


def q_sample_per_group(spark, sf):
    # deterministic per-source document cap (training-mix contribution
    # limit) — engine-reproducible pseudo-random rank, partitioned window
    from supersonic_spark.text.curate import sample_per_group
    d = _t(spark, sf, "documents")
    return sample_per_group(d, 20).select("doc_id", "source")


def q_redact_pii(spark, sf):
    # curation-time PII scrubbing: emails, hex blobs, digit runs
    from supersonic_spark.text.analysis import redact_pii
    d = _t(spark, sf, "documents")
    return d.select("doc_id", redact_pii(F.col("text")).alias("redacted"))


def q_token_rarity(spark, sf):
    # corpus-relative unigram rarity (LM quality-filter signal) in exact
    # integer arithmetic — bucket = LENGTH(BIN(n_total DIV n_tok))
    from supersonic_spark.text.analysis import token_rarity_scores
    d = _t(spark, sf, "documents")
    return token_rarity_scores(d).select(
        "doc_id", "n_tokens", "rarity_sum", "avg_rarity_x100")


def q_pack_sequences(spark, sf):
    # token-budget training-bin assignment (cumulative-sum binning per
    # source; docs overflow bin boundaries rather than split)
    from supersonic_spark.text.curate import pack_sequences
    d = _t(spark, sf, "documents")
    return pack_sequences(d, 500, group_col="source")


def q_mix_sources(spark, sf):
    # deterministic weighted training-mix subsample (hash-bucket keep)
    from supersonic_spark.text.curate import mix_sources
    d = _t(spark, sf, "documents")
    return mix_sources(d, {"src0": 1.0, "src1": 0.5, "src2": 0.25},
                       source_col="source").select("doc_id", "source")


def q_text_token_count(spark, sf):
    from supersonic_spark.text import token_count
    d = _t(spark, sf, "documents").filter(F.length("text") > 0)
    return d.select("doc_id", token_count(F.col("text")).alias("n_tokens"))


def q_text_quality(spark, sf):
    from supersonic_spark.text import quality_score
    d = _spread(_t(spark, sf, "documents"))
    return d.select("doc_id", quality_score(F.col("text")).alias("quality"))


def q_text_langid(spark, sf):
    from supersonic_spark.text import langid_expr
    d = _t(spark, sf, "documents")
    return d.select("doc_id", langid_expr(F.col("text")).alias("lang_guess"))


def q_doc_fingerprint(spark, sf):
    from supersonic_spark.text import doc_fingerprint
    d = _t(spark, sf, "documents")
    return (d.select(doc_fingerprint(F.col("text")).alias("fp"), "doc_id")
             .groupBy("fp").agg(F.min("doc_id").alias("rep_id"),
                                F.count("*").alias("n")))


def q_curate_corpus(spark, sf):
    # capstone composite: quality filter + language filter + exact-dedup
    # representative keep + deterministic mix — the full curation funnel
    # as one declarative plan (one scan, one dedup shuffle, no UDFs)
    from supersonic_spark.text import (exact_dedup, langid_expr,
                                       quality_score)
    from supersonic_spark.text.curate import mix_sources
    d = _t(spark, sf, "documents")
    filtered = (d.withColumn("q", quality_score(F.col("text")))
                 .withColumn("lg", langid_expr(F.col("text")))
                 .filter((F.col("q") >= 0.5) & (F.col("lg") == "en")))
    # consumed twice (dedup reps + semi-join keep): materialize once so
    # the regex-heavy quality/langid projections don't run per consumer
    filtered = filtered.localCheckpoint(eager=True)
    reps = exact_dedup(filtered, "text", "doc_id") \
        .select(F.col("rep_id").alias("doc_id"))
    kept = filtered.join(reps, "doc_id", "left_semi")
    weights = {f"src{i}": 0.8 for i in range(20)}
    return (mix_sources(kept, weights, source_col="source")
            .select("doc_id", "source", F.col("q").alias("quality")))


def q_ann_cosine_threshold(spark, sf):
    import pyarrow.parquet as pq
    from supersonic_spark.ann import cosine
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    e = _t(spark, sf, "embeddings")
    qlit = F.array(*[F.lit(float(v)) for v in qvec])
    return (e.select("vec_id",
                     F.round(cosine(F.col("embedding").cast("array<double>"),
                                    qlit), 4).alias("cos_sim"))
             .filter(F.col("cos_sim") >= 0.15))


def q_ann_topk(spark, sf):
    import pyarrow.parquet as pq
    from supersonic_spark.ann import cosine_topk
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    return cosine_topk(_t(spark, sf, "embeddings"), qvec, 20)


def q_ann_ivf_topk(spark, sf):
    # IVF with full probing == exact -> same oracle as brute force; this
    # gates the coarse-quantizer assignment logic itself
    import pyarrow.parquet as pq
    from supersonic_spark.ann import ivf_topk, train_centroids
    e = _t(spark, sf, "embeddings")
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    cents = train_centroids(e, k=4)
    return ivf_topk(e, qvec, 20, cents, n_probe=4)


def q_ann_topk_arrow(spark, sf):
    # Arrow-batched numpy-matmul scorer (the realistic-dim hot path);
    # same oracle as the HOF scorer — exact top-k either way
    import pyarrow.parquet as pq
    from supersonic_spark.ann import cosine_topk_arrow
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    return cosine_topk_arrow(_t(spark, sf, "embeddings"), qvec, 20)


def q_lsh_topk(spark, sf):
    # random-hyperplane LSH probe, Arrow-batched bucket+score kernel; the
    # oracle replicates the deterministic ±1 planes as SQL literals
    import pyarrow.parquet as pq
    from supersonic_spark.ann import lsh_topk_arrow
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    return lsh_topk_arrow(_t(spark, sf, "embeddings"), qvec, 20, n_planes=8)


def q_ann_ivf_topk_arrow(spark, sf):
    # IVF coarse quantizer on the Arrow path, full probing == exact
    import pyarrow.parquet as pq
    from supersonic_spark.ann import ivf_topk_arrow, train_centroids
    e = _t(spark, sf, "embeddings")
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    cents = train_centroids(e, k=4)
    return ivf_topk_arrow(e, qvec, 20, cents, n_probe=4)


def q_ann_ivf_topk_indexed(spark, sf):
    # write-time IVF index (parquet partitioned by cell) + pruned probe;
    # full probing == exact -> brute-force oracle. The probe's scan
    # carries the cell predicate as PartitionFilters (directory pruning).
    import tempfile
    import pyarrow.parquet as pq
    from supersonic_spark.ann import (build_ivf_index, ivf_topk_indexed,
                                      train_centroids)
    e = _t(spark, sf, "embeddings")
    qvec = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")[0].as_py()
    cents = train_centroids(e, k=4)
    idx_dir = tempfile.mkdtemp(prefix="ss_ivf_idx_")
    build_ivf_index(spark, e, idx_dir, cents)
    return ivf_topk_indexed(spark, idx_dir, qvec, 20, cents, n_probe=4)


def q_ann_topk_multi(spark, sf):
    # batch-of-queries top-k: one matmul scan + map-side partial top-k
    # (the realistic many-query ANN hot path)
    import pyarrow.parquet as pq
    from supersonic_spark.ann import cosine_topk_multi_arrow
    emb = pq.read_table(f"{sf}/embeddings.parquet").column("embedding")
    queries = [emb[i].as_py() for i in range(3)]
    return cosine_topk_multi_arrow(_t(spark, sf, "embeddings"), queries, 10)


def q_embedding_near_pairs(spark, sf):
    from supersonic_spark.ann import pairwise_cosine_pairs
    e = _t(spark, sf, "embeddings")
    return pairwise_cosine_pairs(e, 0.3, block_col="label")


def q_multimodal_binary_meta(spark, sf):
    # multimodal plumbing: opaque binary payload + typed metadata
    d = _t(spark, sf, "documents")
    payload = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
        F.substring(F.col("text"), 1, 8).alias("head"))


def q_codec_roundtrip_docs(spark, sf):
    """Distributed encode->decode through the codec stack inside each
    task; correctness gate proves bit-identity vs the raw table."""
    import pyarrow as pa

    def rt(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        from supersonic_spark.codecs import encode_block, decode_block
        from supersonic_spark.selector import choose_codecs
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            buf = encode_block(tbl, choose_codecs(tbl))
            out, _ = decode_block(buf)
            yield from out.to_batches()

    # fan out the codec kernel (was a fixed 4 tasks): half the session
    # parallelism measured best first-run at sf1.0 (0.95-0.99 s vs
    # 1.03-1.11 s at full width and 0.97-1.23 s at 4 — per-task Python
    # worker setup amortizes while the CPU stays saturated)
    d = _t(spark, sf, "documents").repartition(
        max(8, spark.sparkContext.defaultParallelism // 2))
    return d.mapInArrow(rt, schema=d.schema)


def q_codec_projection_pushdown(spark, sf):
    """Decode-side projection + zone-map chunk pruning through the full
    distributed pipeline: encode documents into sorted blocks, then
    decode ONLY (doc_id, source) under a doc_id range predicate — column
    frames outside the projection are skipped by length arithmetic and
    chunks whose manifest min/max can't overlap are never decoded (the
    engine-side analogue of parquet column pruning + row-group stats)."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table)
    d = _t(spark, sf, "documents")
    out = tempfile.mkdtemp(prefix="ss_proj_gate_")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=64, conv_key="source",
                       order_key="doc_id", sort_keys=("source", "doc_id"))
    encode_table(spark, d, out, cfg, fingerprint="proj-gate")
    dec = decode_table(spark, out, columns=["doc_id", "source"],
                       predicate=("doc_id", 100, 299))
    return dec.select("doc_id", "source")


def q_codec_point_lookup(spark, sf):
    """Bloom-filter chunk pruning for point lookups on a NON-sort column:
    events are encoded time-ordered (ts sort — realistic ingest order),
    so user_id zone maps span everything; the per-chunk bloom is what
    lets 'fetch one user's events out of 10^12' skip chunks. Equality is
    the (col, v, v) range; the exact residual filter keeps it precise."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    out = tempfile.mkdtemp(prefix="ss_bloom_gate_")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512, conv_key="user_id",
                       order_key="event_id", sort_keys=("ts", "event_id"),
                       bloom_cols=("user_id",))
    encode_table(spark, ev, out, cfg, fingerprint="bloom-gate")
    dec = decode_table(spark, out, columns=["event_id", "user_id",
                                            "event_type"],
                       predicate=("user_id", 7, 7))
    return dec.select("event_id", "user_id", "event_type")


def q_codec_in_lookup(spark, sf):
    """IN-list lookup over encoded blocks: (col, [v...]) membership
    predicate — zone range over the set's min/max plus a bloom OR over
    the members, residual IN filter. The 'fetch THESE five users' form
    of the point-lookup path."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    out = tempfile.mkdtemp(prefix="ss_inlist_gate_")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512, conv_key="user_id",
                       order_key="event_id", sort_keys=("ts", "event_id"),
                       bloom_cols=("user_id",))
    encode_table(spark, ev, out, cfg, fingerprint="inlist-gate")
    dec = decode_table(spark, out, columns=["event_id", "user_id"],
                       predicate=("user_id", [3, 7, 11, 400]))
    return dec.select("event_id", "user_id")


def q_codec_compaction(spark, sf):
    """Small-file compaction: two separately-encoded event 'epochs'
    (the streaming sink's accretion pattern) byte-concatenated into
    fewer, larger block files with a merged renumbered manifest — then
    decoded as ONE table. No decode/re-encode in the compaction itself;
    oracle is the plain union."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, compact_blocks,
                                           decode_table, encode_table)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512, conv_key="user_id",
                       order_key="event_id", sort_keys=("ts", "event_id"))
    base = tempfile.mkdtemp(prefix="ss_compact_gate_")
    half = 5000
    encode_table(spark, ev.filter(F.col("event_id") < half),
                 f"{base}/ep0", cfg, fingerprint="cmp-ep0")
    encode_table(spark, ev.filter(F.col("event_id") >= half),
                 f"{base}/ep1", cfg, fingerprint="cmp-ep1")
    compact_blocks(spark, [f"{base}/ep0", f"{base}/ep1"],
                   f"{base}/merged", group_size=4)
    dec = decode_table(spark, f"{base}/merged",
                       columns=["event_id", "user_id", "event_type"])
    return dec.select("event_id", "user_id", "event_type")


def q_codec_stats_agg(spark, sf):
    """Metadata-only aggregation: COUNT / COUNT(col) / MIN / MAX / SUM
    answered purely from the lineage manifest (per-chunk n_rows, null
    counts, zone maps and exact int64 sums) — zero block payloads read.
    At 10^12 turns this is one manifest scan vs a full decode."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, encode_table,
                                           manifest_stats)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    out = tempfile.mkdtemp(prefix="ss_stats_gate_")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512, conv_key="user_id",
                       order_key="event_id", sort_keys=("ts", "event_id"))
    encode_table(spark, ev, out, cfg, fingerprint="stats-gate")
    s = manifest_stats(spark, out)
    return (s.filter(F.col("column").isin("event_id", "user_id"))
            .select(F.col("column").alias("col_name"), "n_rows", "n_values",
                    F.col("min_num").cast("long").alias("min_v"),
                    F.col("max_num").cast("long").alias("max_v"),
                    F.col("sum_int").alias("sum_v"))
            .orderBy("col_name"))


def q_codec_roundtrip_embeddings(spark, sf):
    """Native VECTOR-column codec (vec_bss): embeddings ride the codec
    stack as list<float32> — flattened float32 byte planes (bss layout,
    lz4-friendly) plus a 5-byte fixed-dim shape header per chunk —
    instead of being exploded to scalars. Only raw bit patterns move, so
    NaN/Inf/-0.0 round-trip exactly; the gate unnests the DECODED
    vectors for the DuckDB oracle."""
    import pyarrow as pa

    def rt(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        from supersonic_spark.codecs import decode_block, encode_block
        from supersonic_spark.selector import choose_codecs
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            buf = encode_block(tbl, choose_codecs(tbl, entropy="lz4"),
                               entropy="lz4")
            out, _ = decode_block(buf)
            yield from out.to_batches()

    e = _t(spark, sf, "embeddings").repartition(4)
    dec = e.mapInArrow(rt, schema=e.schema)
    return dec.select("vec_id", F.posexplode("embedding").alias("pos", "val"))


def q_codec_selection_report(spark, sf):
    """Lineage view: which codec the auto-selector picks per column of
    the documents table, per partition (rows-only check)."""
    import pyarrow as pa

    def report(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        from supersonic_spark.selector import choose_codecs
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            codecs = choose_codecs(tbl)
            yield pa.RecordBatch.from_pydict({
                "column": pa.array(list(codecs.keys()), pa.string()),
                "codec": pa.array(list(codecs.values()), pa.string()),
            })

    d = _t(spark, sf, "documents").repartition(2)
    rep = d.mapInArrow(report, schema="column string, codec string")
    return rep.groupBy("column", "codec").count()


# ---------------------------------------------------------------------------
# multi-join analytic suite (TPC-H Q3/Q5/Q10 shapes)
#
# The reference executes hand-built plans one operator at a time; these
# demonstrate the same join/agg operators composed into full analytic
# queries where Catalyst handles what Supersonic's users did by hand:
# join ordering, broadcast of filtered dims, partial aggregation, and
# top-k pushdown (TakeOrderedAndProject).
# ---------------------------------------------------------------------------

def q_tpch_q3_shipping_priority(spark, sf):
    """Q3 shape: date-filtered fact-fact join + broadcast filtered customer
    dim, grouped revenue, deterministic top-10."""
    cut = F.lit("1997-06-01").cast("timestamp")
    c = (_t(spark, sf, "customer")
         .filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey"))
    o = (_t(spark, sf, "orders").filter(F.col("o_orderdate") < cut)
         .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"))
    li = (_t(spark, sf, "lineitem").filter(F.col("l_shipdate") > cut)
          .select("l_orderkey",
                  _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
                  .alias("rev_cents")))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(F.broadcast(c), o.o_custkey == c.c_custkey)
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(F.sum("rev_cents").alias("revenue_cents"))
            .orderBy(F.desc("revenue_cents"), "o_orderdate", "l_orderkey")
            .limit(10))


def q_tpch_q5_local_supplier(spark, sf):
    """Q5 shape: 6-table snowflake join with the extra local-supplier
    equi-constraint (c_nationkey = s_nationkey); region/nation dims
    broadcast; revenue per nation."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    r = _t(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    n = _t(spark, sf, "nation")
    s = _t(spark, sf, "supplier")
    c = _t(spark, sf, "customer")
    o = (_t(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)))
    li = _t(spark, sf, "lineitem")
    nr = F.broadcast(n.join(r, n.n_regionkey == r.r_regionkey)
                     .select("n_nationkey", "n_name"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(s, (li.l_suppkey == s.s_suppkey)
                  & (c.c_nationkey == s.s_nationkey))
            .join(nr, s.s_nationkey == nr.n_nationkey)
            .groupBy("n_name")
            .agg(F.sum(_cents(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))))
                 .alias("revenue_cents"))
            .orderBy(F.desc("revenue_cents"), "n_name"))


def q_tpch_q10_returned_items(spark, sf):
    """Q10 shape: returned-item revenue per customer over a quarter,
    nation dim broadcast, deterministic top-20."""
    lo = F.lit("1997-01-01").cast("timestamp")
    hi = F.lit("1997-04-01").cast("timestamp")
    c = _t(spark, sf, "customer")
    o = (_t(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)))
    li = _t(spark, sf, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(_t(spark, sf, "nation"))
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .join(n, c.c_nationkey == n.n_nationkey)
            .groupBy("c_custkey", "c_name", "n_name")
            .agg(F.sum(_cents(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))))
                 .alias("revenue_cents"))
            .orderBy(F.desc("revenue_cents"), "c_custkey")
            .limit(20))


def q_tpch_q6_forecast_revenue(spark, sf):
    """Q6 shape: pure filter + scalar aggregate — the pushdown showcase
    (every predicate reaches the parquet scan; one partial/final agg)."""
    li = _t(spark, sf, "lineitem")
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    f = li.filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)
                  & (F.col("l_discount") >= 0.05)
                  & (F.col("l_discount") <= 0.07)
                  & (F.col("l_quantity") < 24))
    return f.agg(F.sum(_cents(F.col("l_extendedprice")
                              * F.col("l_discount")))
                 .alias("revenue_cents"),
                 F.count("*").alias("n"))


def q_window_lag_lead(spark, sf):
    # per-user event deltas via lag/lead over a bounded (user) window —
    # partitioned windows parallelize per key, never a global window
    from pyspark.sql import Window
    ev = _t(spark, sf, "events").filter(F.col("event_id") < 3000)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        _cents(F.col("value")).alias("value_cents"),
        _cents(F.lag("value").over(w)).alias("prev_cents"),
        _cents(F.lead("value").over(w)).alias("next_cents"),
        (F.unix_timestamp("ts")
         - F.lag(F.unix_timestamp("ts")).over(w)).alias("gap_s"))


def q_tpch_q14_promo_revenue(spark, sf):
    """Q14 shape (promotion effect): fact-dim broadcast join + conditional
    aggregate. Revenue sums stay integer cents and the promo share is
    exact-integer basis points (promo*10000 div total) so both engines
    hash identically. The dim (part) is broadcast — no shuffle of the
    lineitem fact beyond the final 1-row agg."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    li = (_t(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi)))
    p = _t(spark, sf, "part").select("p_partkey", "p_type")
    rev = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    agg = j.agg(
        F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0)))
        .alias("promo_cents"),
        F.sum(rev).alias("total_cents"))
    return agg.select(
        "promo_cents", "total_cents",
        F.expr("promo_cents * 10000 div total_cents").alias("promo_bps"))


def q_tpch_q4_priority_check(spark, sf):
    """Q4 shape (order priority checking), adapted to this dataset's
    columns: orders in a quarter having at least one lineitem shipped
    >60 days after the order date (the l_commitdate < l_receiptdate
    EXISTS of real Q4), counted per priority. The EXISTS is a LEFT SEMI
    join on orderkey — no payload duplication, aggregate-after-semi."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    o = (_t(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi)))
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(li, (o.o_orderkey == li.l_orderkey)
                  & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"),
                                                60).cast("timestamp")),
                  "left_semi")
    return (late.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


def q_tpch_q7_volume_shipping(spark, sf):
    """Q7 shape (volume shipping): 5-way join — lineitem against
    supplier, orders, customer and nation twice (supplier-side and
    customer-side), symmetric nation-pair filter, yearly revenue rollup.
    Catalyst broadcasts every dim (nation/supplier/customer are tiny vs
    the fact); revenue stays integer cents."""
    li = _t(spark, sf, "lineitem")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    o = _t(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n1 = (_t(spark, sf, "nation")
          .select(F.col("n_nationkey").alias("s_nk"),
                  F.col("n_name").alias("supp_nation")))
    n2 = (_t(spark, sf, "nation")
          .select(F.col("n_nationkey").alias("c_nk"),
                  F.col("n_name").alias("cust_nation")))
    a, b = "NATION_1", "NATION_2"
    j = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(c), o.o_custkey == c.c_custkey)
         .join(F.broadcast(n1), s.s_nationkey == n1.s_nk)
         .join(F.broadcast(n2), c.c_nationkey == n2.c_nk)
         .filter(((F.col("supp_nation") == a) & (F.col("cust_nation") == b))
                 | ((F.col("supp_nation") == b)
                    & (F.col("cust_nation") == a))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("yr"))
            .agg(F.sum(_cents(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))))
                 .alias("sum_cents"),
                 F.count("*").alias("n"))
            .orderBy("supp_nation", "cust_nation", "yr"))


def q_tpch_q18_large_orders(spark, sf):
    """Q18 shape: customers with orders whose lineitem quantity sum
    exceeds a threshold — groupBy+HAVING feeding a 3-way join, then a
    deterministic top-100. The quantity rollup is a map-side partial agg
    on l_orderkey; the surviving order set is tiny, so Catalyst
    broadcast-joins it back against orders/customer."""
    li = _t(spark, sf, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"))
           .filter(F.col("sum_qty") > 200))
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    return (big.join(o, big.l_orderkey == o.o_orderkey)
            .join(c, o.o_custkey == c.c_custkey)
            .select("c_name", "c_custkey", "o_orderkey",
                    F.col("o_orderdate").cast("date").cast("string")
                     .alias("odate"),
                    _cents(F.col("o_totalprice")).alias("total_cents"),
                    "sum_qty")
            .orderBy(F.desc("total_cents"), "o_orderkey")
            .limit(100))


def q_codec_roundtrip_floats(spark, sf):
    """Float-codec gate: explode embeddings to scalar float32, run them
    through the codec stack (selector + entropy stage -> bss/xor_bss/plain)
    inside each task, prove value identity vs the raw table."""
    import pyarrow as pa

    def rt(batches):
        from supersonic_spark.runtime import pin_worker_threads
        pin_worker_threads()
        from supersonic_spark.codecs import decode_block, encode_block
        from supersonic_spark.selector import choose_codecs
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            buf = encode_block(tbl, choose_codecs(tbl, entropy="zstd"),
                               entropy="zstd")
            out, _ = decode_block(buf)
            yield from out.to_batches()

    e = _t(spark, sf, "embeddings")
    flat = e.select("vec_id", F.posexplode("embedding").alias("pos", "val"))
    return flat.repartition(4).mapInArrow(rt, schema=flat.schema)


# ---------------------------------------------------------------------------
# round-5 additions: full TPC-H Q1, Q12/Q17/Q19 shapes, multi-probe LSH,
# datetime-predicate chunk pruning through the codec stack
# ---------------------------------------------------------------------------

def q_tpch_q1_pricing_full(spark, sf):
    """FULL TPC-H Q1 (the reference's GroupedSums primer is the reduced
    form): shipdate-filtered scan, group by (returnflag, linestatus),
    eight aggregates including compound charge expressions and averages.
    One scan + one partial-agg'd shuffle; money in integer cents, avgs
    rounded to 4dp for cross-engine hash parity."""
    cut = F.lit("1998-09-01").cast("timestamp")
    li = _t(spark, sf, "lineitem").filter(F.col("l_shipdate") <= cut)
    base = _cents(F.col("l_extendedprice"))
    disc = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    charge = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax")))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 F.sum(base).alias("sum_base_cents"),
                 F.sum(disc).alias("sum_disc_cents"),
                 F.sum(charge).alias("sum_charge_cents"),
                 F.round(F.sum(F.col("l_quantity").cast("long"))
                         / F.count("*"), 4).alias("avg_qty"),
                 F.round(F.sum(base) / F.count("*"), 4).alias("avg_price_cents"),
                 F.round(F.sum(F.round(F.col("l_discount") * 10000, 0)
                               .cast("long")) / F.count("*"), 4)
                 .alias("avg_disc_bp"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_tpch_q12_priority_class(spark, sf):
    """Q12 shape (shipping-mode priority classes, adapted to this
    schema's columns): fact-fact join + conditional aggregation — counts
    split by CASE over the joined dimension attribute. One shuffle for
    the join (orders side is the smaller fact; Catalyst picks the
    build side), map-side partial counts."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    li = (_t(spark, sf, "lineitem")
          .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
          .select("l_orderkey", "l_linestatus"))
    o = _t(spark, sf, "orders").select("o_orderkey", "o_orderpriority")
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_linestatus")
            .agg(F.sum(F.when(urgent, 1).otherwise(0)).alias("high_count"),
                 F.sum(F.when(urgent, 0).otherwise(1)).alias("low_count"))
            .orderBy("l_linestatus"))


def q_tpch_q17_small_quantity(spark, sf):
    """Q17 shape (small-quantity-order revenue): join lineitems of one
    brand against their PER-PART average quantity (the correlated
    subquery, decorrelated into an aggregate + equi-join — exactly how
    Catalyst and the reference's hand-built plans both execute it), keep
    rows below 0.5x the part's average, sum revenue. The per-part agg is
    tiny (one row per part) so it broadcasts back against the fact."""
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_quantity",
                                          "l_extendedprice")
    p = (_t(spark, sf, "part").filter(F.col("p_brand") == "Brand#23")
         .select("p_partkey"))
    li_b = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    avg_q = (li_b.groupBy("l_partkey")
             .agg(F.avg("l_quantity").alias("avg_qty")))
    return (li_b.join(F.broadcast(avg_q), "l_partkey")
            .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
            .agg(F.sum(_cents(F.col("l_extendedprice")))
                 .alias("small_rev_cents"),
                 F.count("*").alias("n")))


def q_tpch_q19_disjunctive_revenue(spark, sf):
    """Q19 shape (disjunctive brand/size/quantity predicate): an
    OR-of-ANDs residual across a part join. The join key predicate stays
    conjunctive (one equi-join, part broadcast), the disjunction is a
    post-join filter — the pattern where a naive engine triples the scan
    and a good plan does it in one."""
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_quantity",
                                          "l_extendedprice", "l_discount")
    p = _t(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    c1 = ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
          & F.col("l_quantity").between(1, 11))
    c2 = ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
          & F.col("l_quantity").between(10, 20))
    c3 = ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
          & F.col("l_quantity").between(20, 30))
    return (j.filter(c1 | c2 | c3)
            .agg(F.sum(_cents(F.col("l_extendedprice")
                              * (1 - F.col("l_discount"))))
                 .alias("revenue_cents"),
                 F.count("*").alias("n")))


def q_lsh_topk_multiprobe(spark, sf):
    """Multi-probe LSH top-k (hamming=1): probe the query's sign bucket
    PLUS every bucket one plane-flip away — recall rises at a known
    extra scanned fraction (9/256 of the table at 8 planes instead of
    1/256), still one scan + bucket-membership filter, no shuffle.
    Arrow-batched kernel; oracle replicates the plane math in SQL."""
    from supersonic_spark.ann import lsh_topk_arrow
    import pyarrow.parquet as pq
    q = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"]) \
          .column("embedding")[0].as_py()
    e = _t(spark, sf, "embeddings")
    return lsh_topk_arrow(e, q, 20, n_planes=8, hamming=1)


def q_lsh_topk_indexed(spark, sf):
    """Write-time LSH index (parquet partitioned by sign bucket) +
    Hamming-ball probe: the probe reads ONLY the probed buckets'
    directories (PartitionFilters pruning), then the exact Arrow scorer.
    Same candidate set as the scan-path multi-probe, so the same SQL
    oracle applies."""
    import tempfile
    import pyarrow.parquet as pq
    from supersonic_spark.ann import build_lsh_index, lsh_topk_indexed
    e = _t(spark, sf, "embeddings")
    q = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"]) \
          .column("embedding")[0].as_py()
    idx_dir = tempfile.mkdtemp(prefix="ss_lsh_idx_")
    build_lsh_index(spark, e, idx_dir, dim=len(q), n_planes=8)
    return lsh_topk_indexed(spark, idx_dir, q, 20, n_planes=8, hamming=1)


def q_codec_datetime_prune(spark, sf):
    """DATETIME-predicate chunk pruning through the codec stack: events
    encoded time-sorted, decoded under a (ts, lo, hi) range — timestamp
    zone maps are normalized to ns-since-epoch and the bound conversion
    resolves naive datetimes in the session timezone, widened outward so
    pruning can only ever keep extra chunks; the residual filter keeps
    the result exact. On ts-sorted blocks this prunes almost all chunks
    — the time-travel read path of the transcript table."""
    import datetime as dt
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    out = tempfile.mkdtemp(prefix="ss_dtprune_gate_")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512, conv_key="user_id",
                       order_key="event_id", sort_keys=("ts", "event_id"))
    encode_table(spark, ev, out, cfg, fingerprint="dtprune-gate")
    lo = dt.datetime(2024, 1, 10, 0, 0, 0)
    hi = dt.datetime(2024, 1, 12, 0, 0, 0)
    dec = decode_table(spark, out, columns=["event_id", "ts", "user_id"],
                       predicate=("ts", lo, hi))
    # decoded ts preserves the source's NTZ type; session tz is UTC, so
    # the cast matches DuckDB's epoch_us over the same naive values
    return dec.select("event_id", "user_id",
                      F.unix_micros(F.col("ts").cast("timestamp"))
                      .alias("ts_us"))


def q_tpch_q8_market_share(spark, sf):
    """Q8 shape (national market share): seven-way join — region-filtered
    customers' orders' lineitems of one part type, suppliers resolved to
    their nation — then the share of one nation's revenue per year.
    All four dimension sides broadcast; the only shuffle is the
    lineitem-orders join + final group-by-year."""
    n = _t(spark, sf, "nation")
    amer = n.filter(F.col("n_regionkey") == 1).select("n_nationkey")
    cust = (_t(spark, sf, "customer")
            .join(F.broadcast(amer),
                  F.col("c_nationkey") == F.col("n_nationkey"))
            .select("c_custkey"))
    lo = F.lit("1995-01-01").cast("timestamp")
    hi = F.lit("1997-01-01").cast("timestamp")
    o = (_t(spark, sf, "orders")
         .filter((F.col("o_orderdate") >= lo) & (F.col("o_orderdate") < hi))
         .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
         .select("o_orderkey", F.year("o_orderdate").alias("yr")))
    p = (_t(spark, sf, "part").filter(F.col("p_type") == "ECONOMY")
         .select("p_partkey"))
    s = (_t(spark, sf, "supplier")
         .join(F.broadcast(n.select("n_nationkey",
                                    F.col("n_name").alias("supp_nation"))),
               F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "supp_nation"))
    li = _t(spark, sf, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        _cents(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("vol_cents"))
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .join(o, li.l_orderkey == o.o_orderkey)
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey))
    tgt = F.when(F.col("supp_nation") == "NATION_6",
                 F.col("vol_cents")).otherwise(F.lit(0))
    return (j.groupBy("yr")
            .agg(F.sum(tgt).alias("nation_cents"),
                 F.sum("vol_cents").alias("total_cents"))
            .withColumn("mkt_share",
                        F.round(F.col("nation_cents")
                                / F.col("total_cents"), 4))
            .orderBy("yr"))


def q_tpch_q9_product_profit(spark, sf):
    """Q9 shape (product-type profit by nation and year; supply cost
    adapted to 60% of p_retailprice — this schema carries no partsupp):
    lineitem x part(type) x supplier->nation x orders(year), profit
    aggregated per (nation, year). Dimensions broadcast; one wide
    shuffle for the orders join."""
    p = (_t(spark, sf, "part").filter(F.col("p_type") == "STANDARD")
         .select("p_partkey", "p_retailprice"))
    n = _t(spark, sf, "nation").select("n_nationkey",
                                       F.col("n_name").alias("nation"))
    s = (_t(spark, sf, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "nation"))
    o = _t(spark, sf, "orders").select("o_orderkey",
                                       F.year("o_orderdate").alias("yr"))
    li = _t(spark, sf, "lineitem")
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(o, li.l_orderkey == o.o_orderkey))
    amount = _cents(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - F.col("p_retailprice") * 0.6 * F.col("l_quantity"))
    return (j.groupBy("nation", "yr")
            .agg(F.sum(amount).alias("profit_cents"))
            .orderBy("nation", F.col("yr").desc()))


def q_tpch_q13_customer_distribution(spark, sf):
    """Q13 shape (customer order-count distribution): LEFT join with a
    predicate on the RIGHT side (non-urgent orders only) — customers
    with zero qualifying orders must survive with count 0 — then the
    histogram of counts. Two shuffles (join + re-agg), the canonical
    double-aggregation."""
    c = _t(spark, sf, "customer").select("c_custkey")
    o = (_t(spark, sf, "orders")
         .filter(F.col("o_orderpriority") != "1-URGENT")
         .select("o_custkey", "o_orderkey"))
    per = (c.join(o, c.c_custkey == o.o_custkey, "left")
           .groupBy("c_custkey")
           .agg(F.count("o_orderkey").alias("c_count")))
    return (per.groupBy("c_count").agg(F.count("*").alias("custdist"))
            .orderBy(F.col("custdist").desc(), F.col("c_count").desc()))


def q_tpch_q15_top_supplier(spark, sf):
    """Q15 shape (top supplier by quarterly revenue): revenue CTE, the
    scalar MAX over it, and the equi-restriction back onto supplier —
    the scalar joins back as a broadcast of one row, never a collect."""
    lo = F.lit("1996-01-01").cast("timestamp")
    hi = F.lit("1996-04-01").cast("timestamp")
    rev = (_t(spark, sf, "lineitem")
           .filter((F.col("l_shipdate") >= lo) & (F.col("l_shipdate") < hi))
           .groupBy("l_suppkey")
           .agg(F.sum(_cents(F.col("l_extendedprice")
                             * (1 - F.col("l_discount"))))
                .alias("total_rev_cents")))
    mx = rev.agg(F.max("total_rev_cents").alias("mx"))
    top = rev.join(F.broadcast(mx),
                   rev.total_rev_cents == F.col("mx")).drop("mx")
    s = _t(spark, sf, "supplier").select("s_suppkey", "s_name")
    return (s.join(top, s.s_suppkey == top.l_suppkey)
            .select("s_suppkey", "s_name", "total_rev_cents")
            .orderBy("s_suppkey"))


def q_tpch_q16_supplier_relationship(spark, sf):
    """Q16 shape (how many suppliers can serve each part profile;
    part-supplier bridge adapted to lineitem — no partsupp table): brand/
    type/size filters, a NOT-IN exclusion (negative-balance suppliers)
    executed as a broadcast anti-join, COUNT(DISTINCT supplier)."""
    p = (_t(spark, sf, "part")
         .filter((F.col("p_brand") != "Brand#45")
                 & (F.col("p_type") != "MEDIUM")
                 & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
         .select("p_partkey", "p_brand", "p_type", "p_size"))
    bad = (_t(spark, sf, "supplier").filter(F.col("s_acctbal") < 0)
           .select(F.col("s_suppkey").alias("bad_key")))
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .join(F.broadcast(bad), li.l_suppkey == F.col("bad_key"),
               "left_anti"))
    return (j.groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type",
                     "p_size"))


def q_tpch_q21_waiting_suppliers(spark, sf):
    """Q21 shape (suppliers who alone failed multi-supplier orders;
    'failed' adapted to l_returnflag = 'R' — this lineitem carries no
    commit/receipt dates): one EXISTS (another supplier in the same
    order) as a semi-join and one NOT EXISTS (another supplier ALSO
    failing) as an anti-join, both on the order key with a supplier
    inequality — the classic correlated-pair decorrelation."""
    n3 = (_t(spark, sf, "nation").filter(F.col("n_name") == "NATION_3")
          .select("n_nationkey"))
    s = (_t(spark, sf, "supplier")
         .join(F.broadcast(n3), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name"))
    o = (_t(spark, sf, "orders").filter(F.col("o_orderstatus") == "F")
         .select("o_orderkey"))
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_suppkey",
                                          "l_returnflag")
    l1 = (li.filter(F.col("l_returnflag") == "R")
          .join(o, F.col("l_orderkey") == o.o_orderkey)
          .select("l_orderkey", "l_suppkey"))
    l2 = li.select(F.col("l_orderkey").alias("k2"),
                   F.col("l_suppkey").alias("s2"))
    l3 = (li.filter(F.col("l_returnflag") == "R")
          .select(F.col("l_orderkey").alias("k3"),
                  F.col("l_suppkey").alias("s3")))
    cand = l1.join(
        l2, (l1.l_orderkey == F.col("k2"))
        & (l1.l_suppkey != F.col("s2")), "left_semi")
    cand = cand.join(
        l3, (cand.l_orderkey == F.col("k3"))
        & (cand.l_suppkey != F.col("s3")), "left_anti")
    return (cand.join(F.broadcast(s), cand.l_suppkey == s.s_suppkey)
            .groupBy("s_name").agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name").limit(20))


def q_tpch_q22_global_sales(spark, sf):
    """Q22 shape (untapped customers: above-average balance, dormant —
    no orders since 1999; phone country codes adapted to odd nation
    keys): scalar AVG threshold broadcast back, NOT EXISTS as an
    anti-join on date-filtered orders, per-nation aggregate. Cents
    arithmetic keeps the threshold compare and sums engine-portable."""
    grp = F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    c = (_t(spark, sf, "customer").filter(grp)
         .select("c_custkey", "c_nationkey",
                 _cents(F.col("c_acctbal")).alias("bal_cents")))
    thr = (c.filter(F.col("bal_cents") > 0)
           .agg(F.avg("bal_cents").alias("thr")))
    o = (_t(spark, sf, "orders")
         .filter(F.col("o_orderdate")
                 >= F.lit("1999-01-01").cast("timestamp"))
         .select("o_custkey"))
    sel = (c.join(F.broadcast(thr), F.col("bal_cents") > F.col("thr"))
           .drop("thr")
           .join(o, c.c_custkey == o.o_custkey, "left_anti"))
    return (sel.groupBy("c_nationkey")
            .agg(F.count("*").alias("numcust"),
                 F.sum("bal_cents").alias("totacctbal_cents"))
            .orderBy("c_nationkey"))


def q_multimodal_frame_sample(spark, sf):
    """Video-style frame sampling plumbing: documents' text bytes stand
    in for media payloads, fixed-256-byte frames, every 2nd frame kept —
    a 1->N Arrow explode whose byte arithmetic the SQL oracle replicates
    exactly (a real cluster swaps the fixed-frame iterator for a
    demuxer; the explode plumbing is identical)."""
    from supersonic_spark.multimodal import sample_frames
    d = _t(spark, sf, "documents").select(
        "doc_id", F.col("text").cast("binary").alias("payload"))
    fr = sample_frames(d, "doc_id", "payload", every_n=2, frame_len=256)
    return fr.select(F.col("id").alias("doc_id"), "frame_idx", "n_bytes")


def q_multimodal_resize(spark, sf):
    """Image-resize plumbing over binary payloads (deterministic stub
    resizer — output length is a pinned function of the target dims, so
    the oracle checks dims/size/row-coverage; clusters with PIL pass
    resize_image_pil into the same kernel)."""
    from supersonic_spark.multimodal import resize_images
    # empty payloads produce NULL-output rows from the kernel but no row
    # from the oracle's WHERE — filter them symmetrically here
    d = (_t(spark, sf, "documents")
         .filter(F.octet_length(F.col("text")) > 0)
         .select("doc_id", F.col("text").cast("binary").alias("payload")))
    rz = resize_images(d, "doc_id", "payload", 32, 16)
    return rz.select(F.col("id").alias("doc_id"), "out_width",
                     "out_height", "n_bytes")


def q_tpch_q2_min_cost_supplier(spark, sf):
    """Q2 shape (best supplier per part in a region; supply cost adapted
    to s_acctbal, part-supplier bridge adapted to lineitem — no partsupp
    table): region-filtered suppliers x eligible parts, per-part MIN
    cost as a re-join against the grouped minimum (the decorrelated
    correlated subquery), ordered + limited output."""
    elig = (_t(spark, sf, "lineitem")
            .select(F.col("l_partkey").alias("pk"),
                    F.col("l_suppkey").alias("sk")).distinct())
    p = (_t(spark, sf, "part")
         .filter((F.col("p_size") <= 15) & (F.col("p_type") == "LARGE"))
         .select("p_partkey"))
    n = (_t(spark, sf, "nation").filter(F.col("n_regionkey") == 3)
         .select("n_nationkey", "n_name"))
    s = (_t(spark, sf, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    cand = (elig.join(F.broadcast(p), F.col("pk") == F.col("p_partkey"))
            .join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
            .select("p_partkey", "s_name", "n_name", "s_acctbal"))
    mn = cand.groupBy(F.col("p_partkey").alias("mpk")) \
             .agg(F.min("s_acctbal").alias("mc"))
    return (cand.join(F.broadcast(mn),
                      (cand.p_partkey == F.col("mpk"))
                      & (cand.s_acctbal == F.col("mc")))
            .select("p_partkey", "s_name", "n_name",
                    _cents(F.col("s_acctbal")).alias("acctbal_cents"))
            .orderBy(F.col("acctbal_cents").desc(), "n_name", "s_name",
                     "p_partkey")
            .limit(100))


def q_tpch_q11_important_stock(spark, sf):
    """Q11 shape (parts whose inventory value for one nation's suppliers
    exceeds a fraction of the total; value adapted to quantity x
    retailprice over the lineitem bridge): grouped sums filtered by a
    scalar-subquery threshold, the HAVING > f * (SELECT SUM ...) plan —
    the scalar joins back as a one-row broadcast."""
    n = (_t(spark, sf, "nation").filter(F.col("n_name") == "NATION_2")
         .select("n_nationkey"))
    s = (_t(spark, sf, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey"))
    p = _t(spark, sf, "part").select("p_partkey", "p_retailprice")
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey",
                                          "l_quantity")
    v = (li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
         .join(F.broadcast(p), li.l_partkey == p.p_partkey)
         .select("l_partkey",
                 _cents(F.col("l_quantity") * F.col("p_retailprice"))
                 .alias("val_cents")))
    per = v.groupBy("l_partkey").agg(F.sum("val_cents").alias("value_cents"))
    tot = per.agg(F.sum("value_cents").alias("t"))
    return (per.join(F.broadcast(tot),
                     F.col("value_cents") > 0.001 * F.col("t"))
            .select("l_partkey", "value_cents")
            .orderBy(F.col("value_cents").desc(), "l_partkey"))


def q_tpch_q20_excess_availability(spark, sf):
    """Q20 shape (suppliers holding excess stock of promoted parts;
    availability adapted to shipped quantity over the lineitem bridge):
    two-level aggregation — per (part, supplier) quantity vs the
    per-part total — then the >8%-share filter projected up to distinct
    nation-filtered suppliers."""
    pt = (_t(spark, sf, "part").filter(F.col("p_type") == "PROMO")
          .select("p_partkey"))
    li = _t(spark, sf, "lineitem").select("l_partkey", "l_suppkey",
                                          "l_quantity")
    sq = (li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
          .groupBy("l_partkey", "l_suppkey")
          .agg(F.sum(F.col("l_quantity").cast("long")).alias("qty")))
    tq = sq.groupBy(F.col("l_partkey").alias("tpk")) \
           .agg(F.sum("qty").alias("tot"))
    n = (_t(spark, sf, "nation").filter(F.col("n_name") == "NATION_4")
         .select("n_nationkey"))
    s = (_t(spark, sf, "supplier")
         .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
         .select("s_suppkey", "s_name"))
    return (sq.join(F.broadcast(tq), sq.l_partkey == F.col("tpk"))
            .filter(F.col("qty") > 0.08 * F.col("tot"))
            .join(F.broadcast(s), sq.l_suppkey == s.s_suppkey)
            .select("s_suppkey", "s_name").distinct()
            .orderBy("s_suppkey"))


def q_codec_upsert(spark, sf):
    """Incremental MERGE into the encoded table: events bucketized by
    user_id, two users' conversations replaced wholesale via
    upsert_bucketized (bucket-file-grain rewrite), then re-encoded —
    only touched buckets re-encode (per-file fingerprints) — and
    decoded. Oracle is the CASE-expression view of the same merge."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table,
                                           encode_table_prebucketed,
                                           upsert_bucketized)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    bdir = tempfile.mkdtemp(prefix="ss_ups_bkt_")
    bucketize_table(spark, ev, bdir, n_buckets=8, conv_key="user_id")
    out = tempfile.mkdtemp(prefix="ss_ups_enc_")
    cfg = EncodeConfig(chunk_rows=1024, conv_key="user_id",
                       order_key="event_id",
                       sort_keys=("user_id", "event_id"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="ups-gate")
    updates = (ev.filter(F.col("user_id").isin(3, 7))
               .withColumn("event_type",
                           F.concat(F.lit("UPD_"), F.col("event_type"))))
    upsert_bucketized(spark, updates, bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="ups-gate")
    dec = decode_table(spark, out,
                       columns=["event_id", "user_id", "event_type"])
    return dec.select("event_id", "user_id", "event_type")


def q_codec_zorder_prune(spark, sf):
    """Z-order layout gate: events encoded along the Morton curve of
    (user_id, ts) — each chunk covers a small (user, time) rectangle, so
    a conjunctive range predicate on BOTH dimensions prunes chunks on
    each (a single-key sort only serves its leading column). The decode
    path is unchanged: zone-map pruning + exact residual filters."""
    import datetime as dt
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, decode_table,
                                           encode_table_zordered)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    out = tempfile.mkdtemp(prefix="ss_zorder_gate_")
    cfg = EncodeConfig(n_partitions=4, chunk_rows=512, conv_key="user_id",
                       order_key="event_id", sort_keys=("ts", "event_id"))
    encode_table_zordered(spark, ev, out, cfg,
                          zorder_keys=("user_id", "ts"),
                          fingerprint="zorder-gate")
    lo = dt.datetime(2024, 1, 8)
    hi = dt.datetime(2024, 1, 15)
    dec = decode_table(spark, out, columns=["event_id", "ts", "user_id"],
                       predicate=[("user_id", 30, 70), ("ts", lo, hi)])
    return dec.select("event_id", "user_id",
                      F.unix_micros(F.col("ts").cast("timestamp"))
                      .alias("ts_us"))


def q_codec_delete(spark, sf):
    """GDPR-erasure at bucket-file grain: events bucketized by user_id,
    two users' conversations deleted via delete_bucketized (only their
    bucket files rewritten), re-encoded incrementally (per-file
    fingerprints re-encode only touched buckets), decoded. Oracle is the
    NOT-IN view of the same table."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table, delete_bucketized,
                                           encode_table_prebucketed)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    bdir = tempfile.mkdtemp(prefix="ss_del_bkt_")
    bucketize_table(spark, ev, bdir, n_buckets=8, conv_key="user_id")
    out = tempfile.mkdtemp(prefix="ss_del_enc_")
    cfg = EncodeConfig(chunk_rows=1024, conv_key="user_id",
                       order_key="event_id",
                       sort_keys=("user_id", "event_id"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="del-gate")
    keys = ev.filter(F.col("user_id").isin(3, 7)) \
             .select("user_id").distinct()
    delete_bucketized(spark, keys, bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="del-gate")
    dec = decode_table(spark, out,
                       columns=["event_id", "user_id", "event_type"])
    return dec.select("event_id", "user_id", "event_type")


def q_codec_snapshot(spark, sf):
    """Time travel: a hardlink snapshot taken BEFORE a merge decodes to
    the original table even after the live table was upserted and
    re-encoded (mutating paths install new inodes; the snapshot's links
    keep the old bytes). Oracle is the plain pre-merge table."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table,
                                           encode_table_prebucketed,
                                           snapshot_table,
                                           upsert_bucketized)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    bdir = tempfile.mkdtemp(prefix="ss_snap_bkt_")
    bucketize_table(spark, ev, bdir, n_buckets=8, conv_key="user_id")
    out = tempfile.mkdtemp(prefix="ss_snap_enc_")
    cfg = EncodeConfig(chunk_rows=1024, conv_key="user_id",
                       order_key="event_id",
                       sort_keys=("user_id", "event_id"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="snap-gate")
    snap = snapshot_table(out, "v1")
    updates = (ev.filter(F.col("user_id").isin(3, 7))
               .withColumn("event_type",
                           F.concat(F.lit("UPD_"), F.col("event_type"))))
    upsert_bucketized(spark, updates, bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="snap-gate")
    dec = decode_table(spark, snap,
                       columns=["event_id", "user_id", "event_type"])
    return dec.select("event_id", "user_id", "event_type")


def q_codec_cdc(spark, sf):
    """Changed-data capture off a snapshot: events encoded, snapshot
    'v1' taken, two users' conversations upserted (UPD_ prefix) and
    re-encoded — snapshot_diff then emits their old rows as deletes and
    new rows as inserts, reading ONLY the changed buckets' block files
    (chunk-CRC manifest join prunes unchanged partitions entirely)."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           encode_table_prebucketed,
                                           snapshot_diff, snapshot_table,
                                           upsert_bucketized)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    bdir = tempfile.mkdtemp(prefix="ss_cdc_bkt_")
    bucketize_table(spark, ev, bdir, n_buckets=8, conv_key="user_id")
    out = tempfile.mkdtemp(prefix="ss_cdc_enc_")
    cfg = EncodeConfig(chunk_rows=1024, conv_key="user_id",
                       order_key="event_id",
                       sort_keys=("user_id", "event_id"))
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="cdc-gate")
    snapshot_table(out, "v1")
    updates = (ev.filter(F.col("user_id").isin(3, 7))
               .withColumn("event_type",
                           F.concat(F.lit("UPD_"), F.col("event_type"))))
    upsert_bucketized(spark, updates, bdir)
    encode_table_prebucketed(spark, bdir, out, cfg, fingerprint="cdc-gate")
    diff = snapshot_diff(spark, out, "v1")
    return diff.select("event_id", "user_id", "event_type", "change_type")


def q_semantic_dedup(spark, sf):
    """SemDeDup over the embeddings table: coarse cells from pinned
    deterministic centroids (oracle embeds the same literals), in-cell
    cosine pairs at >= 0.2, connected components, lowest-id
    representative; rep_id == id marks kept rows."""
    from supersonic_spark.ann import semantic_dedup, toy_centroids
    e = _t(spark, sf, "embeddings")
    return semantic_dedup(e, toy_centroids(4, 64), threshold=0.2)


def q_interval_join(spark, sf):
    """Batch twin of the watermarked stream-stream interval join: views
    paired with the same user's purchases within the next 2 hours. The
    IDENTICAL function runs on readStream inputs (pytest proves
    stream == batch on replayed micro-batches); in batch mode Spark
    ignores the watermark and plans a range-condition join."""
    from supersonic_spark.streaming import interval_join
    ev = _t(spark, sf, "events")
    views = (ev.filter(F.col("event_type") == "view")
             .select("user_id", F.col("ts").alias("l_ts"),
                     F.col("event_id").alias("l_id")))
    buys = (ev.filter(F.col("event_type") == "purchase")
            .select(F.col("user_id").alias("r_user"),
                    F.col("ts").alias("r_ts"),
                    F.col("event_id").alias("r_id")))
    j = interval_join(views, buys, "user_id", "r_user", "l_ts", "r_ts",
                      lower_seconds=0, upper_seconds=7200)
    return j.select("user_id", "l_id", "r_id")


def q_text_repetition(spark, sf):
    """Gopher-style repetition filters as one shuffle-free codegen
    projection. The synthetic corpus has no natural line repetition, so
    the gate derives a text that provably does — each doc plus two
    copies of its first 80 chars as extra lines — and both sides compute
    the four metrics + composite flag over that derived column."""
    from supersonic_spark.text.repetition import repetition_metrics
    d = _t(spark, sf, "documents")
    rep = d.select(
        "doc_id",
        F.concat_ws("\n", F.col("text"), F.substring("text", 1, 80),
                    F.substring("text", 1, 80)).alias("text"))
    return repetition_metrics(rep)


def q_paragraph_dedup(spark, sf):
    """Paragraph-level exact dedup across the corpus (CCNet/RefinedWeb
    line dedup; Lee et al. 2022): every doc gets a shared boilerplate
    first line (5 variants), so the winner election provably removes
    cross-document repeats; docs are reassembled from surviving lines.
    One hash-key agg + one join + one bounded collect_list per doc."""
    from supersonic_spark.text.paradedup import paragraph_dedup
    d = _t(spark, sf, "documents")
    corpus = d.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(F.lit("(c) corpus boilerplate "),
                     (F.col("doc_id") % 5).cast("string")),
            F.col("text")).alias("text"))
    return paragraph_dedup(corpus)


def q_decontaminate(spark, sf):
    """Benchmark decontamination: the 'benchmark suite' is every 97th
    document; training docs sharing any word 4-gram with it are flagged.
    Corpus side joins against a broadcast of the benchmark grams."""
    from supersonic_spark.text.decontaminate import decontaminate
    d = _t(spark, sf, "documents")
    bench = d.filter(F.col("doc_id") % 97 == 0)
    return decontaminate(d, bench, n=4)


def q_sketch_kmv_distinct(spark, sf):
    """KMV distinct-count sketch over orders.o_custkey. k=16384 exceeds
    the column's cardinality at gate scales, so the sketch has seen every
    distinct hash and the estimate is EXACT — DuckDB verifies with plain
    COUNT(DISTINCT). The sub-k estimator path (where the sketch is
    approximate by design) is accuracy-gated in pytest instead."""
    from supersonic_spark.functions.sketches import kmv_distinct_count_df
    o = _t(spark, sf, "orders")
    return kmv_distinct_count_df(o, "o_custkey", k=16384)


def q_curate_corpus_v2(spark, sf):
    """Curation funnel v2 — the full training-data pipeline as one
    declarative plan: quality + language gates, Gopher repetition
    filter (narrow projections on the same corpus scan), benchmark
    decontamination (join against a broadcast benchmark-gram set),
    exact-dedup representative keep (the one dedup shuffle),
    deterministic source mix, and append-stable train/val/test labels.
    Zero UDFs anywhere; the oracle recomposes every stage's SQL."""
    from supersonic_spark.text import (exact_dedup, langid_expr,
                                       quality_score)
    from supersonic_spark.text.curate import (mix_sources,
                                              train_val_test_split)
    from supersonic_spark.text.decontaminate import decontaminate
    from supersonic_spark.text.repetition import repetition_metrics
    d = _t(spark, sf, "documents")
    base = (d.withColumn("q", quality_score(F.col("text")))
             .withColumn("lg", langid_expr(F.col("text")))
             .filter((F.col("q") >= 0.5) & (F.col("lg") == "en")))
    met = repetition_metrics(base, passthrough=("source", "text", "q"))
    keep = (met.filter(~F.col("repetitive"))
            .select("doc_id", "source", "text", "q"))
    # consumed twice (decontaminate + the semi-join below): materialize
    # once so the regex-gate + repetition-metrics subtree doesn't re-run
    # per consumer (it was re-executing up to 3x in this funnel)
    keep = keep.localCheckpoint(eager=True)
    bench = d.filter(F.col("doc_id") % 97 == 0)
    clean_ids = (decontaminate(keep, bench, n=4)
                 .filter(~F.col("contaminated")).select("doc_id"))
    keep2 = keep.join(clean_ids, "doc_id", "left_semi") \
                .localCheckpoint(eager=True)  # consumed by reps + kept
    reps = exact_dedup(keep2, "text", "doc_id") \
        .select(F.col("rep_id").alias("doc_id"))
    kept = keep2.join(reps, "doc_id", "left_semi")
    weights = {f"src{i}": 0.8 for i in range(20)}
    mixed = mix_sources(kept, weights, source_col="source")
    return (train_val_test_split(mixed)
            .select("doc_id", "source", F.col("q").alias("quality"),
                    "split"))


def q_knn_join_ivf(spark, sf):
    """k-NN self-join blocked by IVF cell: each embedding's top-5
    in-cell cosine neighbors via one equi join + one per-id window.
    Pinned toy centroids so the oracle can argmin the same cells."""
    from supersonic_spark.ann import knn_join_ivf, toy_centroids
    e = _t(spark, sf, "embeddings")
    return knn_join_ivf(e, toy_centroids(4, 64), k=5)


def q_window_moving_avg(spark, sf):
    """Event-time sliding aggregate: per-user 1-hour trailing sum/count
    over the RANGE frame (value-based, not row-based). Exact integer
    cents keep the sum portable; the avg derives from the exact ints by
    one division so both engines round the same double."""
    from pyspark.sql import Window
    e = _t(spark, sf, "events").withColumn(
        "value_cents", _cents(F.col("value")))
    # ts is TIMESTAMP_NTZ; cast through TIMESTAMP (session tz pinned to
    # UTC) so unix_micros resolves — same instant DuckDB's epoch_us sees
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
         .rangeBetween(-3_600_000_000, 0))
    out = e.select(
        "event_id", "user_id",
        F.sum("value_cents").over(w).alias("sum_1h_cents"),
        F.count("*").over(w).alias("n_1h"))
    return out.withColumn(
        "avg_1h", F.round(F.col("sum_1h_cents")
                          / (F.col("n_1h") * 100.0), 4))


def q_tumbling_window_agg(spark, sf):
    """Tumbling event-time windows (F.window, 1 day) — the batch twin of
    the streaming windowed agg; epoch-aligned so date_trunc mirrors it."""
    e = _t(spark, sf, "events").withColumn(
        "value_cents", _cents(F.col("value")))
    return (e.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum("value_cents").alias("sum_cents"))
            .select(F.col("w.start").alias("w_start"), "event_type",
                    "n", "sum_cents"))


def q_pivot_agg(spark, sf):
    """Pivot (long->wide conditional aggregation): order totals by
    priority x status. Explicit pivot values keep the plan one pass
    (no distinct-scan) — the 100 TB form."""
    o = _t(spark, sf, "orders").withColumn(
        "cents", _cents(F.col("o_totalprice")))
    return (o.groupBy("o_orderpriority")
            .pivot("o_orderstatus", ["F", "O", "P"])
            .agg(F.sum("cents"))
            .select(F.col("o_orderpriority"),
                    F.col("F").alias("f_cents"),
                    F.col("O").alias("o_cents"),
                    F.col("P").alias("p_cents")))


def q_triangle_count(spark, sf):
    """Graph analytics beyond components: triangle count on the
    co-purchase graph (parts sharing an order). Edges are oriented
    u<v<w so each triangle is counted once; the wedge join is bounded
    by per-order item count (<=7), never a cross join."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("v"))
    edges = (a.join(b, "o").filter(F.col("u") < F.col("v"))
              .select("u", "v").distinct())
    e2 = edges.select(F.col("u").alias("v"), F.col("v").alias("w"))
    e3 = edges.select(F.col("u").alias("u2"), F.col("v").alias("w2"))
    wedges = edges.join(e2, "v")
    tri = wedges.join(e3, (F.col("u") == F.col("u2"))
                      & (F.col("w") == F.col("w2")))
    return tri.agg(F.count("*").alias("n_triangles"))


def q_json_extract(spark, sf):
    """Semi-structured extraction: scalar, nested-object, and
    array-index JSON paths over the events props column plus a derived
    nested document — codegen get_json_object, no UDFs."""
    e = _t(spark, sf, "events")
    nested = F.concat(
        F.lit('{"a":{"b":['), (F.col("event_id") % 7).cast("string"),
        F.lit(',5]},"s":"v'), (F.col("event_id") % 3).cast("string"),
        F.lit('"}'))
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.get_json_object(nested, "$.a.b[0]").cast("int").alias("b0"),
        F.get_json_object(nested, "$.s").alias("s"))


def q_context_assembly(spark, sf):
    """Transcript-style context assembly: per user, the trailing-3
    event-type chain as one string (sliding collect_list over a ROWS
    frame — the 'previous k turns' packing a conversation pipeline
    feeds a model)."""
    from pyspark.sql import Window
    e = _t(spark, sf, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-2, 0))
    return e.select(
        "event_id", "user_id",
        F.array_join(F.collect_list("event_type").over(w), " > ")
        .alias("ctx"))


def q_fuzzy_join_blocked(spark, sf):
    """Entity-resolution fuzzy join: nation names against a corrupted
    variant (first char substituted), matched at edit distance <= 2
    inside length blocks — never a cross join."""
    from supersonic_spark.text.dedup import fuzzy_join_blocked
    n = _t(spark, sf, "nation")
    dirty = n.select(
        F.concat(F.lit("x"), F.substring("n_name", 2, 99))
        .alias("dirty_name"))
    return fuzzy_join_blocked(n, dirty, "n_name", "dirty_name",
                              max_dist=2, block="length")


def q_resample_ffill(spark, sf):
    """Per-user hourly resample + forward fill: grid generated
    key-locally (sequence+explode between the key's first/last hour),
    gaps inherit the previous hourly max. DuckDB twin fills via ASOF
    join — same semantics, two idioms."""
    from supersonic_spark.operators.analytics import resample_ffill
    e = _t(spark, sf, "events").withColumn("cents", _cents(F.col("value")))
    return resample_ffill(e, "user_id", "ts", "cents")


def q_winsorize(spark, sf):
    """Per-group percentile clipping (winsorization): values clamped to
    the returnflag's [p05, p95]; percentile table broadcast back onto
    the scan so the fact rows never shuffle."""
    from supersonic_spark.operators.analytics import winsorize
    li = _t(spark, sf, "lineitem").withColumn(
        "cents", _cents(F.col("l_extendedprice")))
    return winsorize(
        li.select("l_orderkey", "l_linenumber", "l_returnflag", "cents"),
        "cents", "l_returnflag").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "cents", "clipped")


def q_incremental_rollup(spark, sf):
    """Incremental view maintenance: the priority rollup maintained by
    merging yesterday's aggregate with the new-arrivals aggregate (two
    O(groups) partial states; only the delta ever re-shuffles). The
    oracle computes the same rollup from scratch — IVM's exact claim."""
    from supersonic_spark.operators.ivm import merge_rollup
    o = _t(spark, sf, "orders").withColumn(
        "cents", _cents(F.col("o_totalprice")))

    def rollup(df):
        return df.groupBy("o_orderpriority").agg(
            F.sum("cents").alias("sum_cents"),
            F.count("*").alias("n"),
            F.min("cents").alias("min_cents"),
            F.max("cents").alias("max_cents"))

    base = rollup(o.filter(F.col("o_orderkey") % 10 != 0))
    delta = rollup(o.filter(F.col("o_orderkey") % 10 == 0))
    return merge_rollup(base, delta, ["o_orderpriority"],
                        sums=("sum_cents",), counts=("n",),
                        mins=("min_cents",), maxs=("max_cents",))


def q_funnel_conversion(spark, sf):
    """Ordered funnel signup -> view -> purchase: per-step distinct
    users with a strictly increasing ts chain. k bounded user-keyed
    shuffles, no global event sort."""
    from supersonic_spark.operators.analytics import funnel
    return funnel(_t(spark, sf, "events"),
                  ["signup", "view", "purchase"])


def q_cohort_retention(spark, sf):
    """Weekly cohort retention matrix over the events table: cohort =
    Monday-truncated week of first event; n distinct active users per
    (cohort, week offset)."""
    from supersonic_spark.operators.analytics import cohort_retention
    return cohort_retention(_t(spark, sf, "events"))


def q_weighted_sample(spark, sf):
    """Deterministic weighted sampling without replacement (A-ES,
    Efraimidis-Spirakis): top-20 docs per source by u^(1/w) with
    hash-derived u — inclusion odds proportional to doc length,
    reproducible across engines/partitionings."""
    from supersonic_spark.text.curate import weighted_sample
    d = _t(spark, sf, "documents").select(
        "doc_id", "source", (F.col("n_chars") + 1).alias("w"))
    return weighted_sample(d, "w", 20, group_col="source")


def q_sketch_dd_quantiles(spark, sf):
    """DDSketch relative-error quantiles (deterministic log-bucket
    sketch, VLDB'19): p50/p90/p99 of order totals per priority. The
    shuffle carries bucket counts (<= ~1.1k/group), never rows; the
    oracle replays the identical bucket arithmetic in SQL."""
    from supersonic_spark.functions.sketches import dd_quantiles
    o = _t(spark, sf, "orders")
    return dd_quantiles(o, "o_totalprice", (0.5, 0.9, 0.99),
                        gamma=1.02, group_cols=("o_orderpriority",))


def q_sketch_heavy_hitters(spark, sf):
    """Misra-Gries frequent items over o_orderpriority with k far above
    the column's cardinality — no reduction ever fires, so the sketch
    counts are EXACT and DuckDB verifies with GROUP BY count(*). The
    approximation guarantee (undercount <= n/(k+1), every item above
    that threshold present) is pytest-gated on skewed data."""
    from supersonic_spark.functions.sketches import mg_heavy_hitters
    o = _t(spark, sf, "orders")
    return mg_heavy_hitters(o, "o_orderpriority", k=64)


def q_split_train_val_test(spark, sf):
    """Deterministic corpus split: labels are a pure function of
    (salt, doc_id) via the portable hash — append-stable, partition-
    independent, reproducible in any engine (the oracle recomputes the
    same md5 arithmetic)."""
    from supersonic_spark.text.curate import train_val_test_split
    d = _t(spark, sf, "documents")
    return train_val_test_split(d, (0.9, 0.05, 0.05)) \
        .select("doc_id", "split")


def q_codec_rebucket(spark, sf):
    """Partition evolution: events bucketized at 4 buckets, evolved to 8
    via the shuffle-free rebucket (pmod arithmetic split, task-local
    dynamic-partition write), then encoded shuffle-free from the evolved
    layout and decoded. Proves the evolved layout preserves the
    whole-conversation-per-file invariant end-to-end."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table,
                                           encode_table_prebucketed,
                                           rebucket_table)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    bdir = tempfile.mkdtemp(prefix="ss_rbk_bkt_")
    bucketize_table(spark, ev, bdir, n_buckets=4, conv_key="user_id")
    rdir = tempfile.mkdtemp(prefix="ss_rbk_evolved_")
    rebucket_table(spark, bdir, rdir, factor=2)
    out = tempfile.mkdtemp(prefix="ss_rbk_enc_")
    cfg = EncodeConfig(chunk_rows=1024, conv_key="user_id",
                       order_key="event_id",
                       sort_keys=("user_id", "event_id"))
    encode_table_prebucketed(spark, rdir, out, cfg, fingerprint="rbk-gate")
    dec = decode_table(spark, out,
                       columns=["event_id", "user_id", "event_type"])
    return dec.select("event_id", "user_id", "event_type")


# PQ gate model: m=8 subspaces, ksub=4 codewords, dsub=8 (dim 64); the
# codebooks are pinned deterministic literals (toy_pq_codebooks) so the
# DuckDB oracle can embed the exact same model — same trick as the LSH
# plane oracles.
_PQ_M, _PQ_KSUB = 8, 4


def q_pq_assign(spark, sf):
    """PQ encode (Arrow kernel — the real path): every vector to m
    one-byte codes, emitted as int columns c0..c7 via byte extraction so
    the value hash is portable. The oracle replicates the per-subspace
    argmin (lowest-index ties) over the same literal codebooks; the
    expr-twin equality is pytest-gated (test_pq_assign_expr_matches_arrow)."""
    from supersonic_spark.pq import pq_assign_arrow, toy_pq_codebooks
    e = _t(spark, sf, "embeddings")
    books = toy_pq_codebooks(_PQ_M, _PQ_KSUB, 64 // _PQ_M)
    codes = pq_assign_arrow(e, books)
    cols = [F.col("vec_id")]
    for s in range(_PQ_M):
        cols.append(F.expr(
            f"cast(conv(hex(substring(pq_code, {s + 1}, 1)), 16, 10) "
            f"as int)").alias(f"c{s}"))
    return codes.select(*cols)


def q_pq_adc_topk(spark, sf):
    """Approximate top-k by asymmetric distance computation over PQ
    codes only (m lookup-adds per row, database floats never touched).
    ADC cosine == exact cosine of the PQ reconstruction, so the oracle
    reconstructs each vector from the literal codebooks in SQL and
    scores with list_cosine_similarity."""
    import pyarrow.parquet as pq
    from supersonic_spark.pq import (pq_adc_topk_arrow, pq_assign_arrow,
                                     toy_pq_codebooks)
    e = _t(spark, sf, "embeddings")
    books = toy_pq_codebooks(_PQ_M, _PQ_KSUB, 64 // _PQ_M)
    qvec = pq.read_table(f"{sf}/embeddings.parquet") \
             .column("embedding")[0].as_py()
    codes = pq_assign_arrow(e, books)
    return pq_adc_topk_arrow(codes, [float(v) for v in qvec], books, 20)


def q_pq_topk_refined(spark, sf):
    """PQ search with exact re-rank. refine*k covers the sf0.01 table
    (500 rows), so the shortlist is everything and the refined top-k is
    exactly brute force — gating the ADC + shortlist + re-rank plumbing
    against the ann_topk oracle."""
    import pyarrow.parquet as pq
    from supersonic_spark.pq import pq_topk_refined, toy_pq_codebooks
    e = _t(spark, sf, "embeddings")
    books = toy_pq_codebooks(_PQ_M, _PQ_KSUB, 64 // _PQ_M)
    qvec = pq.read_table(f"{sf}/embeddings.parquet") \
             .column("embedding")[0].as_py()
    return pq_topk_refined(e, [float(v) for v in qvec], books, k=20,
                           refine=30)


def q_ivfpq_topk_indexed(spark, sf):
    """Write-time IVF-PQ index (parquet PARTITIONED BY ivf_cell carrying
    (id, pq_code, vector)): probe with full probing + covering refine ==
    exact, gating the coarse assignment, directory pruning, ADC phase and
    float re-rank end-to-end against the brute-force oracle."""
    import tempfile
    import pyarrow.parquet as pq
    from supersonic_spark.ann import train_centroids
    from supersonic_spark.pq import (build_ivfpq_index, ivfpq_topk_indexed,
                                     toy_pq_codebooks)
    e = _t(spark, sf, "embeddings")
    books = toy_pq_codebooks(_PQ_M, _PQ_KSUB, 64 // _PQ_M)
    qvec = pq.read_table(f"{sf}/embeddings.parquet") \
             .column("embedding")[0].as_py()
    cents = train_centroids(e, k=4)
    idx = tempfile.mkdtemp(prefix="ss_ivfpq_idx_")
    build_ivfpq_index(spark, e, idx, cents, books)
    return ivfpq_topk_indexed(spark, idx, [float(v) for v in qvec], 20,
                              cents, books, n_probe=4, refine=30)


def q_asof_join_forward(spark, sf):
    """Forward as-of: the EARLIEST signup at-or-after each event (the
    'next maintenance window / next release' lookup). Same union +
    key-partitioned window plan as backward — one shuffle, no self
    join."""
    from supersonic_spark.operators.asof import as_of_join
    ev = _t(spark, sf, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", "ts",
                       _cents(F.col("value")).alias("signup_cents")))
    out = as_of_join(left, right, key="user_id", on="ts",
                     value_cols=["signup_cents"], direction="forward")
    return out.select("event_id", "signup_cents")


def q_asof_join_nearest(spark, sf):
    """Nearest as-of: the time-closest signup either side of each
    event, exact ties resolving backward; deltas compare at full
    fractional-second precision (every event ts is sub-second). Both
    fills come from two frames over ONE sorted partition — never a
    self-join. DuckDB twin: two ASOF joins + a CASE on the epoch
    deltas."""
    from supersonic_spark.operators.asof import as_of_join
    ev = _t(spark, sf, "events")
    left = ev.select("user_id", "ts", "event_id")
    right = (ev.filter(F.col("event_type") == "signup")
               .select("user_id", "ts",
                       _cents(F.col("value")).alias("signup_cents")))
    out = as_of_join(left, right, key="user_id", on="ts",
                     value_cols=["signup_cents"], direction="nearest")
    return out.select("event_id", "signup_cents")


def q_sessionize_ids(spark, sf):
    """Per-EVENT session labels (session_window only yields the
    aggregated windows): a session breaks after a 30-minute gap;
    session_n = running count of breaks per user. One user-keyed
    window, integer-exact."""
    from pyspark.sql import Window
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ-safe: timestamp subtraction is an exact microsecond INTERVAL
    gap = F.col("ts") - F.lag("ts").over(w)
    brk = F.when(gap.isNull()
                 | (gap > F.expr("INTERVAL 1800 SECONDS")), 1) \
           .otherwise(0)
    wc = (Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return e.select(
        "event_id", "user_id",
        F.sum(brk).over(wc).cast("int").alias("session_n"))


def q_cooccurrence_pmi(spark, sf):
    """Co-occurrence association statistics (the skip-gram/word2vec
    prep shape): within-order part pairs scored by pointwise mutual
    information ln(n*c(u,v)/(c(u)*c(v))). Pairs generated by the
    ordered self-join (u<v, bounded by per-order item count); marginals
    are O(vocabulary) aggs broadcast back — rounded to 4."""
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("v"))
    pairs = (a.join(b, "o").filter(F.col("u") < F.col("v"))
              .groupBy("u", "v").agg(F.count("*").alias("c_uv")))
    marg = li.groupBy(F.col("l_partkey").alias("k")) \
             .agg(F.count("*").alias("c_k"))
    n = li.agg(F.count("*").alias("_n"))
    pmi = F.log((F.col("_n") * F.col("c_uv"))
                / (F.col("c_u") * F.col("c_v")))
    return (pairs
            .join(F.broadcast(marg.select(F.col("k").alias("u"),
                                          F.col("c_k").alias("c_u"))),
                  "u")
            .join(F.broadcast(marg.select(F.col("k").alias("v"),
                                          F.col("c_k").alias("c_v"))),
                  "v")
            .crossJoin(F.broadcast(n))
            .filter(F.col("c_uv") >= 2)
            .select("u", "v", "c_uv",
                    F.round(pmi, 4).alias("pmi")))


def q_bigram_lm(spark, sf):
    """Language-model n-gram statistics over the corpus: token bigram
    counts and the conditional probability P(w2|w1) = c(w1,w2)/c(w1)
    (integer-ratio, engine-exact). Bigrams come from a per-doc lag
    window — one doc-keyed shuffle, then vocabulary-bounded aggs."""
    from pyspark.sql import Window
    d = _t(spark, sf, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " "))
         .alias("pos", "w"))
    tok = tok.filter(F.col("w") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = (tok.withColumn("w2", F.lead("w").over(w))
             .filter(F.col("w2").isNotNull())
             .groupBy(F.col("w").alias("w1"), "w2")
             .agg(F.count("*").alias("c_bg")))
    uni = (bg.groupBy("w1").agg(F.sum("c_bg").alias("c_w1")))
    return (bg.join(F.broadcast(uni), "w1")
              .filter(F.col("c_bg") >= 5)
              .select("w1", "w2", "c_bg", "c_w1",
                      F.round(F.col("c_bg") / F.col("c_w1"), 4)
                       .alias("p_cond")))


def q_sketch_hll_distinct(spark, sf):
    """HyperLogLog distinct-count per group (m=256 registers): the
    register arithmetic (bucket = h % m, rho via length(bin(h div m)) —
    exact string-length, never float log2) is engine-portable on the
    md5 hash, so the oracle replays the identical sketch and matches
    the estimate to 4 decimals. Shuffle carries <= m rows per group."""
    from supersonic_spark.functions.sketches import hll_distinct
    li = _t(spark, sf, "lineitem")
    return hll_distinct(li, "l_partkey", group_cols=("l_returnflag",),
                        b=8)


def q_codec_merge(spark, sf):
    """Full MERGE INTO at bucket grain in ONE rewrite pass: users
    %10==0 deleted, %10==5 replaced with a synthetic row, five new
    users inserted — then the evolved layout encodes shuffle-free and
    decodes. The oracle recomposes the post-merge table in SQL."""
    import tempfile
    from supersonic_spark.pipeline import (EncodeConfig, bucketize_table,
                                           decode_table,
                                           encode_table_prebucketed,
                                           merge_bucketized)
    ev = _t(spark, sf, "events").select("event_id", "ts", "user_id",
                                        "event_type", "value")
    bdir = tempfile.mkdtemp(prefix="ss_mrg_bkt_")
    bucketize_table(spark, ev, bdir, n_buckets=4, conv_key="user_id")
    dels = (ev.filter(F.col("user_id") % 10 == 0)
              .select("user_id").distinct()
              .select(F.lit(None).cast("long").alias("event_id"),
                      F.lit(None).cast("timestamp").alias("ts"),
                      "user_id",
                      F.lit(None).cast("string").alias("event_type"),
                      F.lit(None).cast("double").alias("value"),
                      F.lit("delete").alias("_op")))
    reps = (ev.filter(F.col("user_id") % 10 == 5)
              .select("user_id").distinct()
              .select((F.col("user_id") * 1000000).alias("event_id"),
                      F.to_timestamp(F.lit("2024-01-01 00:00:00"))
                       .alias("ts"),
                      "user_id",
                      F.lit("replaced").alias("event_type"),
                      F.lit(1.0).alias("value"),
                      F.lit("upsert").alias("_op")))
    ins = spark.range(5).select(
        (F.lit(9000000) + F.col("id")).alias("event_id"),
        F.to_timestamp(F.lit("2024-01-02 00:00:00")).alias("ts"),
        (F.lit(100000) + F.col("id")).alias("user_id"),
        F.lit("inserted").alias("event_type"),
        F.lit(2.0).alias("value"),
        F.lit("upsert").alias("_op"))
    merge_bucketized(spark, dels.unionByName(reps).unionByName(ins),
                     bdir)
    out = tempfile.mkdtemp(prefix="ss_mrg_enc_")
    cfg = EncodeConfig(chunk_rows=1024, conv_key="user_id",
                       order_key="event_id",
                       sort_keys=("user_id", "event_id"))
    encode_table_prebucketed(spark, bdir, out, cfg,
                             fingerprint="mrg-gate")
    dec = decode_table(spark, out,
                       columns=["event_id", "user_id", "event_type"])
    return dec.select("event_id", "user_id", "event_type")


def q_zscore_anomaly(spark, sf):
    """Per-type standardization + outlier flag: z = (value - mean)/
    stddev_pop within the event_type, flag at |z| > 1.5 (decided on the
    rounded z so the cut is engine-portable). Stats broadcast back onto
    the scan — fact rows never shuffle."""
    from supersonic_spark.operators.analytics import zscore_flag
    e = _t(spark, sf, "events")
    return zscore_flag(e.select("event_id", "event_type", "value"),
                       "value", "event_type", threshold=1.5).select(
        "event_id", "event_type", "value", "z", "is_anomaly")


def q_window_distribution(spark, sf):
    """Distribution window functions: ntile(4), percent_rank, cume_dist
    per priority over a fully deterministic (cents, key) order. All
    three are exact integer-ratio results — no float tolerance needed."""
    from pyspark.sql import Window
    o = _t(spark, sf, "orders").withColumn(
        "cents", _cents(F.col("o_totalprice")))
    w = Window.partitionBy("o_orderpriority").orderBy("cents",
                                                      "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority", "cents",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"))


def q_quantile_bucketize(spark, sf):
    """Equal-frequency binning of order totals into 10 buckets via
    exact interpolated percentile boundaries broadcast onto the scan —
    the scale-safe form of ntile (no global sort; see operator
    docstring)."""
    from supersonic_spark.operators.analytics import quantile_bucketize
    o = _t(spark, sf, "orders").withColumn(
        "cents", _cents(F.col("o_totalprice")))
    return quantile_bucketize(o.select("cents"), "cents", 10).select(
        "bucket", "n",
        F.col("min_val").alias("min_cents"),
        F.col("max_val").alias("max_cents"))


def q_corr_by_group(spark, sf):
    """Bivariate statistics per group: Pearson correlation and
    population covariance of (quantity, extendedprice) per returnflag —
    one partial-aggregating pass (Spark's corr/covar are single-pass
    moment aggregates)."""
    li = _t(spark, sf, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4)
         .alias("corr_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 4)
         .alias("corr_qty_disc"),
        F.round(F.covar_pop("l_quantity", "l_discount"), 4)
         .alias("covar_qty_disc"))


def q_tfidf_topterms(spark, sf):
    """Top-5 characteristic terms per document by smoothed TF-IDF —
    lexical feature extraction over the corpus (explode + two keyed
    aggs + doc-partitioned rank window; no global sort, no UDFs)."""
    from supersonic_spark.text.retrieval import tfidf_topk
    return tfidf_topk(_t(spark, sf, "documents"), k=5)


def q_bm25_topk(spark, sf):
    """BM25 ranked retrieval for the query {spark, window, hash}: the
    inverted-index probe in relational form — the tf table is filtered
    to the query terms BEFORE any join, so work is O(matching docs),
    then a bounded TakeOrdered top-20."""
    from supersonic_spark.text.retrieval import bm25_topk
    return bm25_topk(_t(spark, sf, "documents"),
                     ["spark", "window", "hash"], k=20)


def q_feature_hash(spark, sf):
    """Hashing-trick featurization: token -> portable_hash64 % 64
    feature id, sparse (doc, feature, count) rows. The md5 arithmetic
    makes feature ids reproducible in any engine — the oracle computes
    the identical buckets."""
    from supersonic_spark.text.retrieval import feature_hash
    return feature_hash(_t(spark, sf, "documents"), n_features=64)


def q_ewma_smooth(spark, sf):
    """Per-user exponential smoothing (alpha=0.1, adjust=False
    recursion) of event values, ordered by (ts, event_id) — an
    Arrow-batched applyInPandas stateful kernel; the oracle verifies
    via the closed-form weighted prefix sum, exact at this group depth
    (max ~100 rows/user: (1/0.9)^100 ~ 3.7e4, far inside double
    range). The 1.37e-9 shift before rounding exists because the
    2-decimal inputs make true EWMA values land EXACTLY on round-4
    half-way points (x.xxxx5), where a 1e-14 method difference flips
    the rounding; the shared shift moves both engines off the
    boundary."""
    from supersonic_spark.operators.analytics import ewma
    e = _t(spark, sf, "events").select("event_id", "user_id", "ts",
                                       "value")
    out = ewma(e, "user_id", ["ts", "event_id"], "value", alpha=0.1)
    return out.select("event_id", "user_id",
                      F.round(F.col("ewma") + F.lit(1.37e-9), 4)
                       .alias("ewma"))


def q_resample_interpolate(spark, sf):
    """Per-user hourly resample with linear interpolation between the
    surrounding observed hours (integer-exact arithmetic: cents and
    epoch-second deltas, so both engines produce identical doubles).
    DuckDB twin fills via two ASOF joins."""
    from supersonic_spark.operators.analytics import resample_interpolate
    e = _t(spark, sf, "events").withColumn("cents",
                                           _cents(F.col("value")))
    return resample_interpolate(e, "user_id", "ts", "cents")


def q_pagerank(spark, sf):
    """5-iteration PageRank on the symmetrized co-purchase part graph
    (join+sum per iteration, checkpointed ranks). The oracle unrolls
    the same five iterations as chained CTEs; ranks compared as
    pr*N rounded to 4."""
    from supersonic_spark.operators.graph import pagerank
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    a = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("u"))
    b = li.select(F.col("l_orderkey").alias("o"),
                  F.col("l_partkey").alias("v"))
    und = (a.join(b, "o").filter(F.col("u") < F.col("v"))
            .select("u", "v").distinct())
    edges = und.unionAll(und.select(F.col("v").alias("u"),
                                    F.col("u").alias("v")))
    return pagerank(edges, "u", "v", n_iter=5).select(
        F.col("id").alias("part"), "pr_scaled")


def q_skew_join_salted(spark, sf):
    """Salted skew join: orders replicated x8 with a salt, lineitem
    salted row-locally (portable md5 hash of the line identity — never
    rand()), joined on (orderkey, salt). Result must equal the plain
    join — which is exactly what the oracle asserts."""
    from supersonic_spark.operators.core import salted_join
    from supersonic_spark.text.analysis import portable_hash64
    li = _t(spark, sf, "lineitem").select("l_orderkey", "l_linenumber")
    o = _t(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus",
        _cents(F.col("o_totalprice")).alias("totalprice_cents"))
    salt = portable_hash64(
        F.concat_ws("#", F.col("l_orderkey"), F.col("l_linenumber")))
    return salted_join(li, o, ["l_orderkey"], salt, n_salt=8)


def q_validate_expectations(spark, sf):
    """Data-quality expectations audit over a deliberately-dirtied
    orders view (nullified priorities, modulo-collided keys, corrupted
    FKs) so every rule kind reports a non-trivial violation count.
    Scan rules fold into ONE aggregate pass; the FK rule is one
    broadcast anti join. Output: (rule, violations)."""
    from supersonic_spark import validate as V
    o = _t(spark, sf, "orders")
    c = _t(spark, sf, "customer")
    dirty = o.select(
        "o_orderkey", "o_totalprice", "o_orderstatus",
        (F.col("o_orderkey") % 1000).alias("key_mod"),
        F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")).alias("pri"),
        (F.col("o_custkey")
         + F.when(F.col("o_orderkey") % 50 == 0, 1000000)
            .otherwise(0)).alias("cust_fk"))
    rules = [
        V.not_null("pri_not_null", "pri"),
        V.in_range("price_range", "o_totalprice", 1.0, 200000.0),
        V.accepted("status_accepted", "o_orderstatus", ["O", "F"]),
        V.unique("key_mod_unique", "key_mod"),
        V.unique("orderkey_unique", "o_orderkey"),
        V.foreign_key("custkey_fk", "cust_fk", c, "c_custkey"),
    ]
    return V.expectations_report(dirty, rules)


def q_inverted_index(spark, sf):
    """Inverted index over the corpus: token -> doc-sorted postings
    "doc:tf,..." with document frequency; min_df=2 prunes hapax terms,
    max_df prunes stopword-grade posting lists (the bound a 100 TB
    index must set; 499 here = all-but-universal terms, sized to the
    synthetic corpus's 31-token vocabulary). Engine-portable postings
    string."""
    from supersonic_spark.text.retrieval import inverted_index
    d = _t(spark, sf, "documents")
    return inverted_index(d, min_df=2, max_df=499)


def q_winnow_fingerprints(spark, sf):
    """Winnowing (MOSS) fingerprints, k=3 w=4: windowed min over
    positional 3-gram hashes — any shared >=6-token substring between
    docs yields an identical fingerprint. Doc-partitioned window,
    portable string tie-break, no UDFs."""
    from supersonic_spark.text.winnow import winnow_fingerprints
    d = _t(spark, sf, "documents")
    return winnow_fingerprints(d, k=3, w=4)


def q_jaccard_prefix_join(spark, sf):
    """EXACT unigram-Jaccard pairs >= 0.5 via prefix filtering
    (PPJoin-style): candidates keyed on each doc's RAREST grams only,
    so hot grams never self-join — the lossless alternative to
    ngram_jaccard's df_cap (this gate's oracle is the uncapped,
    unblocked exact pair set; same corpus as the ngram_jaccard gate)."""
    from supersonic_spark.text.dedup import jaccard_prefix_pairs
    d = _t(spark, sf, "documents")
    return jaccard_prefix_pairs(d, "text", "doc_id", n=1, threshold=0.5)


def _dirty_conv_view(spark, sf):
    """Transcript-shaped view of events with deliberate structural
    corruption, so every integrity check reports non-trivially: turn
    indices assigned BEFORE dropping event_id%7 rows (=> gaps, and
    first-turn violations where a conversation's row 0 died), roles
    forced to 'assistant' on %13 (=> alternation repeats), text blanked
    on %17, timestamps pulled 2h back on %31 (=> regressions)."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    base = e.select(
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        "event_id", "ts", "props",
        (F.row_number().over(w) - 1).alias("rn"))
    return (base.select(
        "conv_id",
        F.col("rn").alias("turn_idx"),
        F.when(F.col("event_id") % 13 == 0, F.lit("assistant"))
         .otherwise(F.when(F.col("rn") % 2 == 0, F.lit("user"))
                     .otherwise(F.lit("assistant"))).alias("role"),
        F.when(F.col("event_id") % 17 == 0, F.lit("  "))
         .otherwise(F.col("props")).alias("text"),
        F.when(F.col("event_id") % 31 == 0,
               F.col("ts") - F.expr("INTERVAL 2 HOURS"))
         .otherwise(F.col("ts")).alias("ts"))
        .filter(F.col("event_id") % 7 != 0))


def q_conv_integrity_audit(spark, sf):
    """Transcript-integrity audit (turn gaps, broken role alternation,
    timestamp regressions, blank turns, bad first turns) over the
    deliberately-corrupted conversation view — one conv_id window pass
    + one folded aggregate. Output: (check, violations)."""
    from supersonic_spark.conversations import integrity_report
    return integrity_report(_dirty_conv_view(spark, sf))


def q_conv_stats(spark, sf):
    """Per-conversation rollup (turn count, role mix, token total,
    wall-clock span) over the same derived conversation view — the
    curation layer's keying table. One conv_id shuffle."""
    from supersonic_spark.conversations import conversation_stats
    return conversation_stats(_dirty_conv_view(spark, sf))


def q_sketch_count_min(spark, sf):
    """Count-min sketch (d=4, w=64) over event types: build the
    register table (bounded d*w-row state, cell-wise mergeable), then
    point-estimate every distinct key as the min over its d counters.
    Engine-portable md5 bucket arithmetic, so DuckDB replays the whole
    sketch exactly. Output: (key, est_count)."""
    from supersonic_spark.functions.sketches import (cms_point_estimates,
                                                     cms_registers)
    e = _t(spark, sf, "events")
    reg = cms_registers(e, "event_type", d=4, w=64)
    keys = e.select("event_type").distinct()
    return cms_point_estimates(reg, keys, "event_type", d=4, w=64)


def q_text_normalize(spark, sf):
    """Curation text normalization: zero-width strip, control->space,
    whitespace collapse, trim — over documents text dirtied with
    tab/ZWSP/control-char noise on doc_id%3==0 so `changed` is
    non-trivial. Output: (doc_id, norm, changed)."""
    from supersonic_spark.text.analysis import normalize_text
    d = _t(spark, sf, "documents")
    raw = F.when(F.col("doc_id") % 3 == 0,
                 F.concat(F.lit("\tx "), F.col("text"),
                          F.lit(" y\u200bz\x01  w"))) \
           .otherwise(F.col("text"))
    dirty = d.select("doc_id", raw.alias("raw"))
    return dirty.select(
        "doc_id",
        normalize_text(F.col("raw")).alias("norm"),
        (normalize_text(F.col("raw")) != F.col("raw")).cast("int")
        .alias("changed"))


def q_bloom_prefilter_join(spark, sf):
    """Runtime-filter semi join: bloom of URGENT order keys pushed into
    the lineitem scan, exact broadcast semi join after — result
    identical to a plain semi join (the oracle), rows killed before the
    exchange. Output: per-returnflag count + quantity total."""
    from supersonic_spark.operators.runtime_filter import (
        bloom_prefilter_semi_join)
    li = _t(spark, sf, "lineitem")
    o = _t(spark, sf, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT")
    hits = bloom_prefilter_semi_join(li, o, "l_orderkey", "o_orderkey",
                                     n_bits=1 << 17)
    return (hits.groupBy("l_returnflag")
            .agg(F.count("*").alias("n"),
                 F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")))


def q_lm_perplexity(spark, sf):
    """CCNet-style perplexity filter: per-document cross-entropy under
    the corpus's own add-0.5 bigram LM (exact integer-count ratios, so
    DuckDB replays the score), kept = xent <= 3.39 (the corpus median,
    so the decision column is non-trivial both ways). Output:
    (doc_id, n_bigrams, xent, kept)."""
    from supersonic_spark.text.lm import lm_cross_entropy
    d = _t(spark, sf, "documents")
    return lm_cross_entropy(d, k=0.5, max_xent=3.39)


def q_stratified_sample(spark, sf):
    """Exact stratified sampling: 100 documents allocated across
    sources by largest-remainder (Hamilton) apportionment — the sample
    size is EXACTLY 100, never off by rounding — with deterministic
    smallest-hash row selection inside each stratum. Output:
    (doc_id, source)."""
    from supersonic_spark.text.curate import stratified_sample_exact
    d = _t(spark, sf, "documents")
    return (stratified_sample_exact(d, "source", "doc_id", total=100)
            .select("doc_id", "source"))


def q_skyline_parts(spark, sf):
    """2-D skyline / Pareto frontier over part (maximize p_size,
    minimize p_retailprice): survivors are parts no other part beats on
    both axes. Distinct-size threshold table + broadcast join — never
    the O(n^2) self-join, never a global data window. Output:
    (p_partkey, p_size, price_cents)."""
    from supersonic_spark.operators.analytics import skyline2d
    p = _t(spark, sf, "part").select(
        "p_partkey", "p_size",
        F.round(F.col("p_retailprice") * 100).cast("long")
         .alias("price_cents"))
    return skyline2d(p, "p_size", "price_cents")


def q_markov_role_transitions(spark, sf):
    """First-order Markov role-transition matrix over the transcript
    corpus (the north-rule input shape): lead(role) per conversation,
    counted per (role, next_role) and normalized per source role — the
    structural signature of a corpus and a cheap mix-drift alarm. One
    conv_id window shuffle (shuffle-free on the bucketized layout) +
    a |roles|^2-row aggregate. Output: (role, next_role, n, p)."""
    from supersonic_spark.conversations import role_transitions
    return role_transitions(_dirty_conv_view(spark, sf))


def q_unpivot_melt(spark, sf):
    """Wide->long melt via DataFrame.unpivot (native Expand, one pass,
    no union-of-scans): per-priority order aggregates (count / exact
    cents sum / cents max) melted to (priority, metric, value). The
    inverse of pivot_agg; Expand emits 3 rows per input row in the same
    stage, so the plan is a single aggregate + projection."""
    o = _t(spark, sf, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    wide = (o.groupBy("o_orderpriority")
            .agg(F.count("*").alias("n_orders"),
                 F.sum(cents).alias("sum_cents"),
                 F.max(cents).alias("max_cents")))
    return wide.unpivot("o_orderpriority",
                        ["n_orders", "sum_cents", "max_cents"],
                        "metric", "value")


def q_percentile_exact_groups(spark, sf):
    """Exact grouped percentiles (p50/p90/p99, linear interpolation)
    of the integer-cents event value per event type — the exact twin of
    the DDSketch gate, for group counts small enough to sort exactly.
    Spark's `percentile` is a sort-based exact aggregate; DuckDB's
    quantile_cont replays the same interpolation. Doubles rounded to 4.
    Output: (event_type, n, p50, p90, p99)."""
    e = _t(spark, sf, "events")
    cents = F.round(F.col("value") * 100, 0).cast("long")
    g = e.select("event_type", cents.alias("cents"))
    return (g.groupBy("event_type")
            .agg(F.count("*").alias("n"),
                 F.round(F.percentile("cents", F.lit(0.5)), 4)
                  .alias("p50"),
                 F.round(F.percentile("cents", F.lit(0.9)), 4)
                  .alias("p90"),
                 F.round(F.percentile("cents", F.lit(0.99)), 4)
                  .alias("p99")))


def _agent_conv_view(spark, sf):
    """Agent-trace-shaped view of events for the tool-run analytics:
    click/error events become 'tool' turns (so consecutive tool runs
    exist), the rest alternate user/assistant by position."""
    e = _t(spark, sf, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (e.select(
        F.concat(F.lit("c"), F.col("user_id")).alias("conv_id"),
        "event_type",
        (F.row_number().over(w) - 1).alias("turn_idx"))
        .select(
            "conv_id", "turn_idx",
            F.when(F.col("event_type").isin("click", "error"), F.lit("tool"))
             .otherwise(F.when(F.col("turn_idx") % 2 == 0, F.lit("user"))
                         .otherwise(F.lit("assistant"))).alias("role")))


def q_conv_tool_runs(spark, sf):
    """Gaps-and-islands agent-loop detector: per conversation, the
    longest consecutive tool-turn run, run count, and tool-turn total
    over the agent-trace view. Both row_number windows share one
    conv_id exchange. Output: (conv_id, max_tool_run, n_tool_runs,
    n_tool_turns)."""
    from supersonic_spark.conversations import longest_tool_runs
    return longest_tool_runs(_agent_conv_view(spark, sf))


def q_dedup_editdist_verify(spark, sf):
    """Candidate-verify dedup stage: LSH banding candidates (same
    parameters as the dedup_lsh_pairs gate) confirmed by exact
    Levenshtein distance — at most one edit per 5 characters of the
    longer text, all-integer arithmetic. Output: (id_a, id_b,
    edit_dist, confirmed) for every candidate pair."""
    from supersonic_spark.text.dedup import (editdist_verify_pairs,
                                             minhash_lsh_pairs)
    d = _t(spark, sf, "documents").filter(F.col("doc_id") < 200)
    pairs = minhash_lsh_pairs(d, "text", "doc_id", k=8, bands=4,
                              shingle_n=1).drop("n_bands")
    return editdist_verify_pairs(d, pairs, "text", "doc_id")


def q_conv_merge_turns(spark, sf):
    """Consecutive same-role turn coalescing over the dirty transcript
    view (whose %13 role forcing creates real assistant/assistant
    runs): island = running sum of role-change flags, texts re-joined
    in turn order. Output: (conv_id, turn_idx, role, text, n_merged)."""
    from supersonic_spark.conversations import merge_consecutive_turns
    v = _dirty_conv_view(spark, sf).withColumn(
        "text", F.coalesce(F.col("text"), F.lit("")))
    return merge_consecutive_turns(v)


def q_text_char_entropy(spark, sf):
    """Character-distribution Shannon entropy per document — the cheap
    gibberish/binary quality signal; map-side partial agg caps the
    shuffle at O(docs x distinct-chars). Output: (doc_id, n_chars,
    entropy bits rounded 4)."""
    from supersonic_spark.text.analysis import char_entropy
    return char_entropy(_t(spark, sf, "documents"))


# ---------------------------------------------------------------------------
# contract surface
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001 (primer GroupedSums analogue)."""
    return q_group_agg_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Registry ORDER is load-bearing: the driver's correctness gate samples
    # the FIRST 50 entries. Rotation history: rounds 1-3 proved the
    # relational set (3x); round 4 proved the dedup/ANN/codec/TPC-H/
    # curation set. Round 5's prefix is exactly the never-driver-proven
    # set: (a) the 11 round-4 additions, (b) codec_selection_report (now
    # carrying a pinned oracle), (c)+(d) all round-5 additions except 4
    # deferred family-variants (noted at the marker). Local replica
    # (tools/check_oracles.py) still verifies every entry.
    return {
        # --- (a) round-4 additions: driver-verify this round ---
        "expr_datetime3": q_expr_datetime3,
        "expr_div_variants": q_expr_div_variants,
        "tpch_q14_promo_revenue": q_tpch_q14_promo_revenue,
        "tpch_q4_priority_check": q_tpch_q4_priority_check,
        "tpch_q7_volume_shipping": q_tpch_q7_volume_shipping,
        "codec_point_lookup": q_codec_point_lookup,
        "codec_in_lookup": q_codec_in_lookup,
        "codec_compaction": q_codec_compaction,
        "codec_stats_agg": q_codec_stats_agg,
        "codec_roundtrip_embeddings": q_codec_roundtrip_embeddings,
        "ann_ivf_topk_indexed": q_ann_ivf_topk_indexed,
        # --- (b) previously rows-only, now oracled ---
        "codec_selection_report": q_codec_selection_report,
        # --- (c) round-5 additions ---
        "tpch_q1_pricing_full": q_tpch_q1_pricing_full,
        "tpch_q12_priority_class": q_tpch_q12_priority_class,
        "tpch_q17_small_quantity": q_tpch_q17_small_quantity,
        "tpch_q19_disjunctive_revenue": q_tpch_q19_disjunctive_revenue,
        "lsh_topk_multiprobe": q_lsh_topk_multiprobe,
        "codec_datetime_prune": q_codec_datetime_prune,
        "codec_zorder_prune": q_codec_zorder_prune,
        "codec_upsert": q_codec_upsert,
        "tpch_q8_market_share": q_tpch_q8_market_share,
        "tpch_q9_product_profit": q_tpch_q9_product_profit,
        "tpch_q13_customer_distribution": q_tpch_q13_customer_distribution,
        "tpch_q15_top_supplier": q_tpch_q15_top_supplier,
        "tpch_q16_supplier_relationship": q_tpch_q16_supplier_relationship,
        "tpch_q21_waiting_suppliers": q_tpch_q21_waiting_suppliers,
        "tpch_q22_global_sales": q_tpch_q22_global_sales,
        # --- (d) never-driver-proven round-5 set (replica-green; the
        #     relational backfill below the marker is driver-proven 3x) ---
        "lsh_topk_indexed": q_lsh_topk_indexed,
        "tpch_q2_min_cost_supplier": q_tpch_q2_min_cost_supplier,
        "tpch_q20_excess_availability": q_tpch_q20_excess_availability,
        "multimodal_frame_sample": q_multimodal_frame_sample,
        "codec_delete": q_codec_delete,
        "pq_assign": q_pq_assign,
        "pq_adc_topk": q_pq_adc_topk,
        "ivfpq_topk_indexed": q_ivfpq_topk_indexed,
        "codec_cdc": q_codec_cdc,
        "semantic_dedup": q_semantic_dedup,
        "text_repetition": q_text_repetition,
        "decontaminate": q_decontaminate,
        "sketch_kmv_distinct": q_sketch_kmv_distinct,
        "codec_rebucket": q_codec_rebucket,
        "interval_join": q_interval_join,
        "sketch_heavy_hitters": q_sketch_heavy_hitters,
        "split_train_val_test": q_split_train_val_test,
        "curate_corpus_v2": q_curate_corpus_v2,
        "paragraph_dedup": q_paragraph_dedup,
        "knn_join_ivf": q_knn_join_ivf,
        "window_moving_avg": q_window_moving_avg,
        "tumbling_window_agg": q_tumbling_window_agg,
        "pivot_agg": q_pivot_agg,
        # ---------------- end of 50-entry driver prefix ----------------
        # r6 ledger update: round 6 was the optimization round — the
        # driver re-ran EVERY declared query against the oracle (no
        # 50-sample), so no rotation happened or was needed; the
        # deferred list below is carried verbatim for a future build
        # round's prefix (r7+).
        # (never-proven entries deferred to r6 for lack of slots:
        #  pq_topk_refined, multimodal_resize, tpch_q11_important_stock,
        #  codec_snapshot, and the late wave-5e/5f/5g sets registered at
        #  the tail — validate_expectations, inverted_index,
        #  winnow_fingerprints, jaccard_prefix_join,
        #  conv_integrity_audit, conv_stats, sketch_count_min,
        #  text_normalize, bloom_prefilter_join, lm_perplexity,
        #  stratified_sample, skyline_parts, window_rank_variants,
        #  rrf_hybrid_retrieval, antientropy_diff,
        #  markov_role_transitions, unpivot_melt,
        #  percentile_exact_groups, conv_tool_runs,
        #  dedup_editdist_verify, conv_merge_turns,
        #  text_char_entropy.
        #  All replica-green;
        #  their operator families are covered above)
        "scan_project": q_scan_project,
        "compute_expr": q_compute_expr,
        "filter_null_semantics": q_filter_null_semantics,
        "filter_in_list": q_filter_in_list,
        "generate_sequence": q_generate_sequence,
        "hash_join_inner": q_hash_join_inner,
        "hash_join_left_outer": q_hash_join_left_outer,
        "broadcast_join_unique": q_broadcast_join_unique,
        "foreign_filter_semi": q_foreign_filter_semi,
        "anti_join_orphans": q_anti_join_orphans,
        "rowid_merge_join": q_rowid_merge_join,
        "lookup_index_multimatch": q_lookup_index_multimatch,
        "coalesce_zip": q_coalesce_zip,
        "group_agg_pricing_summary": q_group_agg_pricing_summary,
        "agg_min_max": q_agg_min_max,
        "agg_distinct": q_agg_distinct,
        "agg_concat": q_agg_concat,
        "agg_first_last": q_agg_first_last,
        "scalar_agg_empty": q_scalar_agg_empty,
        "agg_all_null_group": q_agg_all_null_group,
        "group_agg_with_limit": q_group_agg_with_limit,
        "multi_distinct_rewrite": q_multi_distinct_rewrite,
        "avg_composed": q_avg_composed,
        "sort_topk": q_sort_topk,
        "sort_case_insensitive": q_sort_case_insensitive,
        "sort_nulls_first": q_sort_nulls_first,
        "limit_offset": q_limit_offset,
        "merge_union_all": q_merge_union_all,
        "distinct": q_distinct,
        "intersect_nations": q_intersect_nations,
        "except_nations": q_except_nations,
        "expr_math": q_expr_math,
        "expr_string": q_expr_string,
        "expr_regexp": q_expr_regexp,
        "expr_regexp2": q_expr_regexp2,
        "expr_datetime": q_expr_datetime,
        "expr_parse_datetime": q_expr_parse_datetime,
        "expr_case_cast": q_expr_case_cast,
        "expr_bitwise": q_expr_bitwise,
        "expr_hashing": q_expr_hashing,
        "stateful_changed": q_stateful_changed,
        "stateful_running_sum": q_stateful_running_sum,
        "stateful_smudge": q_stateful_smudge,
        "stateful_running_min_flush": q_stateful_running_min_flush,
        "stateful_smudge_if": q_stateful_smudge_if,
        "window_rank": q_window_rank,
        "asof_join": q_asof_join,
        "range_join": q_range_join,
        "range_join_bucketed": q_range_join_bucketed,
        "tpch_q11_important_stock": q_tpch_q11_important_stock,
        "multimodal_resize": q_multimodal_resize,
        "cube_agg": q_cube_agg,
        # --- driver-proven in round 4 ---
        "rollup_agg": q_rollup_agg,
        "grouping_sets": q_grouping_sets,
        "topk_per_group": q_topk_per_group,
        "session_windows": q_session_windows,
        "percentiles": q_percentiles,
        "expr_datetime2": q_expr_datetime2,
        "expr_math2": q_expr_math2,
        "expr_string2": q_expr_string2,
        "expr_math3": q_expr_math3,
        "expr_make_datetime": q_expr_make_datetime,
        "jobspec_declarative": q_jobspec_declarative,
        "spy_observe": q_spy_observe,
        "enum_roundtrip": q_enum_roundtrip,
        "splitter_reuse": q_splitter_reuse,
        "udaf_grouped": q_udaf_grouped,
        "dedup_lsh_pairs": q_dedup_lsh_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_exact": q_dedup_exact,
        "dedup_minhash_sig": q_dedup_minhash_sig,
        "dedup_simhash": q_dedup_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "text_token_count": q_text_token_count,
        "token_rarity": q_token_rarity,
        "sample_per_group": q_sample_per_group,
        "redact_pii": q_redact_pii,
        "pack_sequences": q_pack_sequences,
        "mix_sources": q_mix_sources,
        "curate_corpus": q_curate_corpus,
        "text_quality": q_text_quality,
        "text_langid": q_text_langid,
        "doc_fingerprint": q_doc_fingerprint,
        "ann_cosine_threshold": q_ann_cosine_threshold,
        "ann_topk": q_ann_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_topk_arrow": q_ann_topk_arrow,
        "ann_ivf_topk_arrow": q_ann_ivf_topk_arrow,
        "lsh_topk": q_lsh_topk,
        "ann_topk_multi": q_ann_topk_multi,
        "embedding_near_pairs": q_embedding_near_pairs,
        "multimodal_binary_meta": q_multimodal_binary_meta,
        "codec_roundtrip_docs": q_codec_roundtrip_docs,
        "codec_projection_pushdown": q_codec_projection_pushdown,
        "codec_roundtrip_floats": q_codec_roundtrip_floats,
        "tpch_q3_shipping_priority": q_tpch_q3_shipping_priority,
        "tpch_q5_local_supplier": q_tpch_q5_local_supplier,
        "tpch_q10_returned_items": q_tpch_q10_returned_items,
        "tpch_q6_forecast_revenue": q_tpch_q6_forecast_revenue,
        "tpch_q18_large_orders": q_tpch_q18_large_orders,
        "window_lag_lead": q_window_lag_lead,
        # --- round-5 additions deferred from the prefix (slots full) ---
        "codec_snapshot": q_codec_snapshot,
        "pq_topk_refined": q_pq_topk_refined,
        "sketch_dd_quantiles": q_sketch_dd_quantiles,
        "funnel_conversion": q_funnel_conversion,
        "cohort_retention": q_cohort_retention,
        "weighted_sample": q_weighted_sample,
        "incremental_rollup": q_incremental_rollup,
        "resample_ffill": q_resample_ffill,
        "winsorize": q_winsorize,
        "json_extract": q_json_extract,
        "context_assembly": q_context_assembly,
        "fuzzy_join_blocked": q_fuzzy_join_blocked,
        "triangle_count": q_triangle_count,
        # --- round-5 wave 3: stats / retrieval / graph / skew ---
        "zscore_anomaly": q_zscore_anomaly,
        "window_distribution": q_window_distribution,
        "quantile_bucketize": q_quantile_bucketize,
        "corr_by_group": q_corr_by_group,
        "tfidf_topterms": q_tfidf_topterms,
        "bm25_topk": q_bm25_topk,
        "feature_hash": q_feature_hash,
        "ewma_smooth": q_ewma_smooth,
        "resample_interpolate": q_resample_interpolate,
        "pagerank": q_pagerank,
        "skew_join_salted": q_skew_join_salted,
        "codec_merge": q_codec_merge,
        "sketch_hll_distinct": q_sketch_hll_distinct,
        "cooccurrence_pmi": q_cooccurrence_pmi,
        "bigram_lm": q_bigram_lm,
        "asof_join_forward": q_asof_join_forward,
        "asof_join_nearest": q_asof_join_nearest,
        "sessionize_ids": q_sessionize_ids,
        # --- round-5 wave 5e: quality audit / index / fingerprint /
        #     lossless similarity join ---
        "validate_expectations": q_validate_expectations,
        "inverted_index": q_inverted_index,
        "winnow_fingerprints": q_winnow_fingerprints,
        "jaccard_prefix_join": q_jaccard_prefix_join,
        # --- round-5 wave 5f: transcript integrity / CMS / normalize /
        #     runtime-filter join ---
        "conv_integrity_audit": q_conv_integrity_audit,
        "conv_stats": q_conv_stats,
        "sketch_count_min": q_sketch_count_min,
        "text_normalize": q_text_normalize,
        "bloom_prefilter_join": q_bloom_prefilter_join,
        # --- round-5 wave 5g: LM filter / exact stratification /
        #     skyline ---
        "lm_perplexity": q_lm_perplexity,
        "stratified_sample": q_stratified_sample,
        "skyline_parts": q_skyline_parts,
        "window_rank_variants": q_window_rank_variants,
        # --- round-5 wave 5i: hybrid retrieval fusion / anti-entropy ---
        "rrf_hybrid_retrieval": q_rrf_hybrid_retrieval,
        "antientropy_diff": q_antientropy_diff,
        # --- round-5 wave 5j: transcript Markov matrix / melt /
        #     exact grouped percentiles ---
        "markov_role_transitions": q_markov_role_transitions,
        "unpivot_melt": q_unpivot_melt,
        "percentile_exact_groups": q_percentile_exact_groups,
        # --- round-5 wave 5k: agent tool-run islands / edit-distance
        #     dedup verification ---
        "conv_tool_runs": q_conv_tool_runs,
        "dedup_editdist_verify": q_dedup_editdist_verify,
        # --- round-5 wave 5l: turn coalescing / char-entropy quality ---
        "conv_merge_turns": q_conv_merge_turns,
        "text_char_entropy": q_text_char_entropy,
    }


def oracle_sql() -> dict[str, str]:
    from supersonic_spark.plans.oracles import ORACLES
    return dict(ORACLES)
