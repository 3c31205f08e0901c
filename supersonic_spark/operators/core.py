"""Core relational operators, re-expressed Spark-first.

Each operator documents the reference semantics it reproduces
(file:line into /root/reference) and the Catalyst physical strategy we
expect. None of this translates reference code — the plans are declared
via the DataFrame API so Catalyst applies pushdown/pruning/broadcast.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def hash_join(left: DataFrame, right: DataFrame, on: list[str],
              how: str = "inner", *, rhs_unique: bool = False) -> DataFrame:
    """Equi hash join. Reference supports INNER and LEFT_OUTER only
    (hash_join.h:37-38); the KeyUniqueness fast path (hash_join.h:44-46)
    maps to broadcasting a deduplicated build side so Spark plans a
    BroadcastHashJoin instead of a shuffle join."""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("reference hash join supports INNER/LEFT_OUTER only")
    build = right.dropDuplicates(on) if rhs_unique else right
    if rhs_unique:
        build = F.broadcast(build)
    return left.join(build, on=on, how=how)


def foreign_filter(fact: DataFrame, keys: DataFrame, fk: str,
                   key_col: str) -> DataFrame:
    """Keep fact rows whose foreign key exists in the key table
    (reference: supersonic/cursor/core/foreign_filter.h:11-29).
    Spark: LEFT SEMI join — no payload duplication, broadcastable."""
    return fact.join(keys.select(F.col(key_col).alias(fk)).distinct(),
                     on=fk, how="left_semi")


def rowid_merge_join(left: DataFrame, right: DataFrame, fk: str,
                     right_order: list[str]) -> DataFrame:
    """Join left.fk against the *row id* (position) of the ordered right
    side (reference: supersonic/cursor/core/rowid_merge_join.h:15-27).
    Row ids are materialized with row_number so the plan stays an equi
    join Catalyst can optimize."""
    w = Window.orderBy(*[F.col(c) for c in right_order])
    rid = right.withColumn("_rowid", F.row_number().over(w) - F.lit(1))
    return left.join(rid, left[fk] == rid["_rowid"], "inner").drop("_rowid")


def lookup_index(queries: DataFrame, index: DataFrame, on: list[str],
                 query_id: str) -> DataFrame:
    """Batch index probe returning all matches per query plus the query id
    side column (reference: supersonic/cursor/base/lookup_index.h:29-58).
    0..n matches per probe is exactly inner-join duplication semantics."""
    return queries.join(index, on=on, how="inner")


def coalesce_zip(left: DataFrame, right: DataFrame) -> DataFrame:
    """Column-wise zip of two frames by row position — Supersonic's
    Coalesce, which is NOT SQL COALESCE and NOT union (reference:
    supersonic/cursor/core/coalesce.h:16-25). Spark has no positional
    zip, so both sides get explicit positional ids and an equi join;
    inputs must define a deterministic order via their own columns."""
    lw = Window.orderBy(*[F.col(c) for c in left.columns])
    rw = Window.orderBy(*[F.col(c) for c in right.columns])
    lpos = left.withColumn("_pos", F.row_number().over(lw))
    rpos = right.withColumn("_pos", F.row_number().over(rw))
    return lpos.join(rpos, "_pos", "inner").drop("_pos")


def merge_union_all(frames: list[DataFrame],
                    order: list[str] | None = None) -> DataFrame:
    """K-way union-all; the reference's variant is order-preserving via a
    priority queue (merge_union_all.h:18-31) — in Spark ordering is a
    property of the consumer, so we union and optionally sort."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionAll(f)
    if order:
        out = out.orderBy(*order)
    return out


def extended_sort(df: DataFrame, keys: list[tuple[str, str]],
                  limit: int | None = None,
                  case_sensitive: bool = True) -> DataFrame:
    """ExtendedSort: multi-key sort + optional case-insensitivity +
    limit => top-k (reference: supersonic/cursor/core/sort.h:100-106,
    specification.proto:12-30). NULLs sort first, matching the
    reference's NULLs-smaller-than-everything rule (sort.cc:16-83).
    With a limit Catalyst plans TakeOrderedAndProject (top-k pushdown)."""
    dtypes = dict(df.dtypes)
    cols = []
    for name, direction in keys:
        c = F.col(name)
        if not case_sensitive and dtypes.get(name) == "string":
            c = F.lower(c)
        cols.append(c.desc_nulls_last() if direction == "desc"
                    else c.asc_nulls_first())
    out = df.orderBy(*cols)
    if limit is not None:
        out = out.limit(limit)
    return out


def limit_offset(df: DataFrame, limit: int, offset: int = 0,
                 order: list[str] | None = None) -> DataFrame:
    """Offset + limit (reference: supersonic/cursor/core/limit.h:14-17).
    Deterministic only under an explicit order."""
    out = df.orderBy(*order) if order else df
    return out.offset(offset).limit(limit)


def group_aggregate_with_limit(df: DataFrame, key: str, agg_col: str, k: int,
                               other_label: str = "__other__") -> DataFrame:
    """GroupAggregate with a cap on unique keys: the top-k keys keep their
    own rows, everything else collapses into one catch-all row
    (reference: supersonic/cursor/core/aggregate.h:264-276). Spark plan:
    full agg (partial/final), rank, then a second tiny agg over the
    overflow — no extra scan of the fact table."""
    agg = df.groupBy(key).agg(F.sum(agg_col).alias("agg_val"),
                              F.count("*").alias("n_rows"))
    w = Window.orderBy(F.col("agg_val").desc(), F.col(key).asc())
    ranked = agg.withColumn("_rk", F.row_number().over(w))
    top = ranked.filter(F.col("_rk") <= k).drop("_rk")
    other = (ranked.filter(F.col("_rk") > k)
             .agg(F.lit(other_label).alias(key),
                  F.sum("agg_val").alias("agg_val"),
                  F.sum("n_rows").alias("n_rows"))
             .filter(F.col("n_rows").isNotNull()))
    return top.unionAll(other.select(key, "agg_val", "n_rows"))
