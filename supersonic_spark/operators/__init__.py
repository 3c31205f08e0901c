"""Spark-first re-expressions of the reference operator inventory
(SURVEY.md §2). Each function declares a logical plan via the DataFrame
API and lets Catalyst pick the physical strategy."""

from .core import (
    coalesce_zip,
    foreign_filter,
    group_aggregate_with_limit,
    hash_join,
    limit_offset,
    lookup_index,
    merge_union_all,
    rowid_merge_join,
    extended_sort,
    with_prefix_sum,
    with_rowid,
)

__all__ = [
    "coalesce_zip",
    "foreign_filter",
    "group_aggregate_with_limit",
    "hash_join",
    "limit_offset",
    "lookup_index",
    "merge_union_all",
    "rowid_merge_join",
    "extended_sort",
    "with_prefix_sum",
    "with_rowid",
]
