#!/usr/bin/env python
"""Capture round-2 plan evidence for PLANS.md:
- rowid_merge_join / coalesce_zip / group_agg_with_limit: no
  un-partitioned Window (the r1 single-partition scale-killers)
- splitter_reuse: branches read checkpoint blocks, zero parquet scans in
  the final plan (the one scan happened once, at checkpoint time)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

SF = "/root/testdata/sf0.001"


def explain_str(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def main():
    from supersonic_spark.session import get_spark
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as E
    qs = E.queries()

    for name in ["rowid_merge_join", "coalesce_zip", "group_agg_with_limit",
                 "splitter_reuse"]:
        plan = explain_str(qs[name](spark, SF))
        has_window = "Window" in plan
        # un-partitioned window: a Window whose partition spec is empty ->
        # physical plan shows 'Window [...], [order...]' with a preceding
        # Exchange SinglePartition
        single = "SinglePartition" in plan
        n_parquet = plan.count("Scan parquet")
        print(f"== {name}: Window={has_window} "
              f"ExchangeSinglePartition={single} parquet_scans={n_parquet}")
        if name == "splitter_reuse":
            print("   sources:", sorted(set(re.findall(r"Scan [a-zA-Z]+", plan))))
    spark.stop()


if __name__ == "__main__":
    main()
