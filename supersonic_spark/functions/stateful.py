"""Stateful ("running") expressions — the reference's order-dependent
expression family (reference: supersonic/expression/core/
stateful_expressions.h:17-69), re-expressed as Spark window functions
over an explicit (partition, order) spec. The reference has a single
implicit global order; distributed Spark makes the order explicit.
"""

from __future__ import annotations

from pyspark.sql import Column, Window, WindowSpec
from pyspark.sql import functions as F


def _running(w: WindowSpec) -> WindowSpec:
    return w.rowsBetween(Window.unboundedPreceding, Window.currentRow)


def changed(col: Column, w: WindowSpec) -> Column:
    """True on the first row and whenever the value differs from the
    previous row (stateful_expressions.h:30-39). This is the RLE
    run-boundary detector."""
    prev = F.lag(col).over(w)
    return prev.isNull() | (col != prev)


def running_sum(col: Column, w: WindowSpec) -> Column:
    """Prefix sum ignoring NULLs; NULL until the first non-NULL value
    (stateful_expressions.h:41-45)."""
    return F.sum(col).over(_running(w))


def smudge(col: Column, w: WindowSpec) -> Column:
    """Last-observation-carried-forward: fill NULL with the most recent
    non-NULL value (stateful_expressions.h:47-52)."""
    return F.last(col, ignorenulls=True).over(_running(w))


def running_min_with_flush(col: Column, flush: Column,
                           partition_cols: list[Column],
                           order_cols: list[Column]) -> Column:
    """Running minimum that resets whenever `flush` is true
    (stateful_expressions.h:54-61): session id = running count of
    flushes, then min within (partition, session). Takes explicit
    partition/order columns because a WindowSpec cannot be extended
    with a derived session key."""
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    session = F.sum(F.when(flush, 1).otherwise(0)).over(_running(w))
    ws = (Window.partitionBy(*partition_cols, session)
          .orderBy(*order_cols)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return F.min(col).over(ws)


def smudge_if(col: Column, cond: Column, w: WindowSpec) -> Column:
    """LOCF applied only where cond is true (stateful_expressions.h:63-69):
    where cond, take the last value from a row where cond was false;
    elsewhere keep the value."""
    keep = F.when(~cond, col)
    return F.when(cond, F.last(keep, ignorenulls=True).over(_running(w))) \
            .otherwise(col)
