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

    variants = {
        "mdr_expand": mdr_expand,
        "mdr_split": mdr_split,
        "hji_bhj": hji_bhj,
        "hji_shj": hji_shj,
        "hji_smj": hji_smj,
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
