#!/usr/bin/env python
"""Interleaved A/B probe for round-6 optimization candidates.
Runs variant plans back-to-back, several rounds, in ONE session so box
throttle windows hit all variants equally. Not part of the bench contract.
"""
from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 32))
    from supersonic_spark.session import get_spark
    spark = get_spark(cores=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entry

    li = entry._t(spark, sf_dir, "lineitem")
    o = entry._t(spark, sf_dir, "orders")

    def mdr_expand():
        return (li.groupBy("l_returnflag")
                .agg(F.countDistinct("l_partkey").alias("d_parts"),
                     F.countDistinct("l_suppkey").alias("d_supps"),
                     F.countDistinct("l_orderkey").alias("d_orders")))

    def mdr_split():
        a = li.groupBy("l_returnflag").agg(
            F.countDistinct("l_partkey").alias("d_parts"))
        b = li.groupBy("l_returnflag").agg(
            F.countDistinct("l_suppkey").alias("d_supps"))
        c = li.groupBy("l_returnflag").agg(
            F.countDistinct("l_orderkey").alias("d_orders"))
        return a.join(b, "l_returnflag").join(c, "l_returnflag") \
                .select("l_returnflag", "d_parts", "d_supps", "d_orders")

    def hji_bhj():
        from supersonic_spark.operators import hash_join
        l2 = li.withColumnRenamed("l_orderkey", "o_orderkey")
        return (hash_join(l2, o, ["o_orderkey"], "inner")
                .select("o_orderkey", "l_linenumber", "o_orderstatus",
                        entry._cents(F.col("o_totalprice"))
                        .alias("totalprice_cents")))

    def hji_shj():
        l2 = li.withColumnRenamed("l_orderkey", "o_orderkey")
        return (l2.join(o.hint("SHUFFLE_HASH"), "o_orderkey", "inner")
                .select("o_orderkey", "l_linenumber", "o_orderstatus",
                        entry._cents(F.col("o_totalprice"))
                        .alias("totalprice_cents")))

    def hji_smj():
        l2 = li.withColumnRenamed("l_orderkey", "o_orderkey")
        return (l2.join(o.hint("MERGE"), "o_orderkey", "inner")
                .select("o_orderkey", "l_linenumber", "o_orderstatus",
                        entry._cents(F.col("o_totalprice"))
                        .alias("totalprice_cents")))

    p = entry._t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    d = entry._t(spark, sf_dir, "documents")

    def lim_current():
        from supersonic_spark.operators import lookup_index
        li2 = li.select(F.col("l_partkey").alias("p_partkey"), "l_quantity")
        probed = lookup_index(p, li2, ["p_partkey"], "p_partkey")
        return (probed.groupBy("p_partkey", "p_brand")
                .agg(F.count("*").alias("n_matches"),
                     F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")))

    def lim_preagg():
        agg = (li.groupBy(F.col("l_partkey").alias("p_partkey"))
               .agg(F.count("*").alias("n_matches"),
                    F.sum(F.col("l_quantity").cast("long")).alias("sum_qty")))
        return (agg.join(p, "p_partkey")
                .select("p_partkey", "p_brand", "n_matches", "sum_qty"))

    def ngj_current():
        from supersonic_spark.text.dedup import ngram_jaccard_pairs
        return ngram_jaccard_pairs(d, "text", "doc_id", group_col="source",
                                   n=1, threshold=0.5, df_cap=64)

    def ngj_spread():
        from supersonic_spark.text.dedup import ngram_jaccard_pairs
        return ngram_jaccard_pairs(entry._spread(d), "text", "doc_id",
                                   group_col="source", n=1, threshold=0.5,
                                   df_cap=64)

    def _ngj_body(grams, threshold=0.5, df_cap=64):
        # replica of ngram_jaccard_pairs' tail over a prepared grams DF
        id_col = "doc_id"
        join_keys = ["g", "source"]
        sizes = grams.groupBy(id_col).agg(F.count("*").alias("sz"))
        hot = (grams.groupBy(*join_keys)
               .agg(F.count("*").alias("_df"))
               .filter(F.col("_df") > df_cap).select(*join_keys))
        capped = grams.join(F.broadcast(hot), join_keys, "left_anti")
        a = capped.select(*join_keys, F.col(id_col).alias("id_a"))
        bb = capped.select(*join_keys, F.col(id_col).alias("id_b"))
        inter = (a.join(bb, join_keys)
                 .filter(F.col("id_a") < F.col("id_b"))
                 .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
        sa = sizes.select(F.col(id_col).alias("id_a"),
                          F.col("sz").alias("sz_a"))
        sb = sizes.select(F.col(id_col).alias("id_b"),
                          F.col("sz").alias("sz_b"))
        return (inter.join(sa, "id_a").join(sb, "id_b")
                .withColumn("jaccard", F.round(
                    F.col("inter") / (F.col("sz_a") + F.col("sz_b")
                                      - F.col("inter")), 4))
                .filter(F.col("jaccard") >= threshold)
                .select("id_a", "id_b", "jaccard"))

    def ngj_partby():
        from supersonic_spark.text.dedup import word_ngrams
        grams = d.select("doc_id", "source",
                         F.explode(word_ngrams(F.col("text"), 1)).alias("g"))
        grams = grams.repartition(64, "g", "source") \
                     .localCheckpoint(eager=True)
        return _ngj_body(grams)

    def ngj_spread_partby():
        from supersonic_spark.text.dedup import word_ngrams
        grams = entry._spread(d).select(
            "doc_id", "source",
            F.explode(word_ngrams(F.col("text"), 1)).alias("g"))
        grams = grams.repartition(64, "g", "source") \
                     .localCheckpoint(eager=True)
        return _ngj_body(grams)

    variants = {
        "mdr_expand": mdr_expand,
        "mdr_split": mdr_split,
        "hji_bhj": hji_bhj,
        "hji_shj": hji_shj,
        "hji_smj": hji_smj,
        "lim_current": lim_current,
        "lim_preagg": lim_preagg,
        "ngj_current": ngj_current,
        "ngj_spread": ngj_spread,
        "ngj_partby": ngj_partby,
        "ngj_spread_partby": ngj_spread_partby,
    }
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else list(variants)
    rounds = int(os.environ.get("AB_ROUNDS", "4"))

    # warm
    def _noopmap(bs):
        yield from bs
    (spark.range(100_000).repartition(cpus)
         .mapInArrow(_noopmap, schema="id long").write
         .format("noop").mode("overwrite").save())
    for name in only:
        variants[name]().write.format("noop").mode("overwrite").save()

    times: dict[str, list[float]] = {n: [] for n in only}
    for r in range(rounds):
        for name in only:
            spark.sparkContext.setJobDescription(f"{name} r{r}")
            t0 = time.perf_counter()
            variants[name]().write.format("noop").mode("overwrite").save()
            times[name].append(round(time.perf_counter() - t0, 3))
    for name in only:
        ss = times[name]
        print(f"{name:12s} med={statistics.median(ss):7.3f} "
              f"min={min(ss):7.3f} {ss}")
    spark.stop()


if __name__ == "__main__":
    main()
