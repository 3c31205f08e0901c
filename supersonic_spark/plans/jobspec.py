"""Declarative job-spec seam — the analogue of the reference's serialized
plan fragments (BuildExpressionFromProto,
supersonic/serialization/build_expression_from_proto.h:30-34, and
ExtendedSortSpecification, supersonic/proto/specification.proto:12-30):
a small JSON/dict spec compiles to a DataFrame pipeline. SQL strings are
available anyway via spark.sql(); this seam covers the programmatic,
validated-construction use case the reference serves.

Spec shape:
{
  "table": "<path or iceberg ident>",
  "columns": ["a", "b"],                       # optional projection
  "filter": "a > 3 AND b IN ('x','y')",        # optional SQL expression
  "compute": {"c": "a * 2"},                   # optional derived columns
  "group_by": ["b"],                           # optional
  "aggregations": {"sum_a": "sum(a)"},         # with group_by or scalar agg
  "sort": [{"column": "sum_a", "order": "desc",
            "case_sensitive": false}],          # ExtendedSortSpecification
  "limit": 10, "offset": 0,
  "encode": {"out_dir": ..., "n_partitions": ...}   # run the codec pipeline
}
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ALLOWED_KEYS = {"table", "columns", "filter", "compute", "group_by",
                 "aggregations", "sort", "limit", "offset", "encode"}


def build_job(spark: SparkSession, spec: dict[str, Any]) -> DataFrame:
    """Compile a spec dict into a (lazy) DataFrame plan. Raises ValueError
    on unknown keys — the analogue of the reference's binding-time schema
    errors (codes 400-499, supersonic.proto:62-71)."""
    unknown = set(spec) - _ALLOWED_KEYS
    if unknown:
        raise ValueError(f"unknown job-spec keys: {sorted(unknown)}")
    if "table" not in spec:
        raise ValueError("job spec needs 'table'")

    from ..sources import load_table
    df = load_table(spark, spec["table"])

    if "columns" in spec:
        missing = set(spec["columns"]) - set(df.columns)
        if missing:
            raise ValueError(f"unknown columns: {sorted(missing)}")
        df = df.select(*spec["columns"])
    if "filter" in spec:
        df = df.filter(spec["filter"])
    for name, expr in (spec.get("compute") or {}).items():
        df = df.withColumn(name, F.expr(expr))
    aggs = spec.get("aggregations")
    if aggs:
        agg_cols = [F.expr(e).alias(name) for name, e in aggs.items()]
        if spec.get("group_by"):
            df = df.groupBy(*spec["group_by"]).agg(*agg_cols)
        else:
            df = df.agg(*agg_cols)
    if "sort" in spec:
        from ..operators import extended_sort
        keys = [(s["column"], s.get("order", "asc")) for s in spec["sort"]]
        ci = all(s.get("case_sensitive", True) for s in spec["sort"])
        df = extended_sort(df, keys, limit=spec.get("limit"),
                           case_sensitive=ci)
    elif "limit" in spec or "offset" in spec:
        df = df.offset(spec.get("offset", 0)).limit(spec.get("limit", 2**31 - 1))
    return df


def run_job(spark: SparkSession, spec: dict[str, Any]):
    """Build and, if the spec asks for encoding, run the codec pipeline.
    Returns (DataFrame, manifest-or-None)."""
    df = build_job(spark, spec)
    enc = spec.get("encode")
    if not enc:
        return df, None
    from ..pipeline import EncodeConfig, encode_table
    cfg = EncodeConfig(**{k: v for k, v in enc.items() if k != "out_dir"})
    manifest = encode_table(spark, df, enc["out_dir"], cfg,
                            fingerprint=str(spec.get("table")))
    return df, manifest
