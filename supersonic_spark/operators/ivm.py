"""Incremental view maintenance for rollup aggregates.

Maintains a materialized GROUP BY aggregate under new data without
recomputing from scratch: the base aggregate and the delta's aggregate
are both partial states, and mergeable measures (SUM/COUNT/MIN/MAX)
combine by one more aggregation over the union — the same partial-agg
algebra Spark's HashAggregate pairs use within a job, lifted across
jobs. At 100 TB this is the difference between re-shuffling the whole
fact table and shuffling only the delta: the merge's input is two
already-aggregated tables (O(groups), not O(rows)).

Deletes are supported for the ADDITIVE measures only (SUM/COUNT merge
retractions as negative contributions; groups whose count reaches zero
disappear). MIN/MAX are not delete-maintainable without per-group
recomputation — callers with retractions must drop them (enforced).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_rollup(base: DataFrame, delta: DataFrame, keys: list[str],
                 sums: tuple[str, ...] = (), counts: tuple[str, ...] = (),
                 mins: tuple[str, ...] = (),
                 maxs: tuple[str, ...] = ()) -> DataFrame:
    """Merge two aggregate states with identical schemas: per group-key,
    SUM columns add, COUNT columns add, MIN/MAX columns take min/max.
    New groups appear, untouched groups pass through — one groupBy over
    O(groups) rows."""
    aggs = ([F.sum(c).alias(c) for c in sums]
            + [F.sum(c).alias(c) for c in counts]
            + [F.min(c).alias(c) for c in mins]
            + [F.max(c).alias(c) for c in maxs])
    if not aggs:
        raise ValueError("merge_rollup needs at least one measure")
    return base.unionByName(delta).groupBy(*keys).agg(*aggs)


def apply_changes(base: DataFrame, inserts: DataFrame | None,
                  deletes: DataFrame | None, keys: list[str],
                  sums: tuple[str, ...] = (),
                  counts: tuple[str, ...] = ()) -> DataFrame:
    """Maintain an additive rollup under inserts AND deletes: retracted
    rows contribute negated SUM/COUNT partials; groups whose total count
    reaches zero are dropped (they no longer exist in the view). MIN/MAX
    are rejected by construction — retraction would need the base rows.

    ``inserts``/``deletes`` are AGGREGATED deltas with the same schema
    as ``base`` (aggregate your raw change rows first — that agg is the
    only row-scale work)."""
    if not counts:
        raise ValueError("apply_changes needs a count column to detect "
                         "emptied groups")
    parts = [base]
    if inserts is not None:
        parts.append(inserts)
    if deletes is not None:
        neg = deletes
        for c in (*sums, *counts):
            neg = neg.withColumn(c, -F.col(c))
        parts.append(neg)
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    merged = u.groupBy(*keys).agg(
        *[F.sum(c).alias(c) for c in (*sums, *counts)])
    return merged.filter(F.col(counts[0]) > 0)
