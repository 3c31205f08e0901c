"""Cooperative job cancellation — the reference Cursor Interrupt surface
(reference: supersonic/cursor/base/cursor.h:150-186: Interrupt() requests
termination, the cursor later returns INTERRUPTED) re-expressed on Spark's
job-group machinery: actions launched inside a `job_group` scope can be
cancelled from any other thread via `interrupt`, and the interrupted
action raises, which `was_interrupted` classifies.
"""

from __future__ import annotations

import re
from contextlib import contextmanager

from pyspark.sql import SparkSession


@contextmanager
def job_group(spark: SparkSession, group_id: str, description: str = "",
              interrupt_on_cancel: bool = True):
    """Scope: every action started inside runs under `group_id` so it can
    be cancelled as a unit (interruptOnCancel sends a thread interrupt to
    running tasks, the analogue of the reference's propagating interrupt
    rather than waiting for operator boundaries)."""
    sc = spark.sparkContext
    sc.setJobGroup(group_id, description or group_id,
                   interruptOnCancel=interrupt_on_cancel)
    try:
        yield group_id
    finally:
        # clear the group so later actions on this thread aren't cancellable
        # under a stale id
        sc.setJobGroup("", "")


def interrupt(spark: SparkSession, group_id: str) -> None:
    """Request termination of every job in the group (returns immediately;
    tasks observe cancellation asynchronously — INTERRUPTED, not KILLED)."""
    spark.sparkContext.cancelJobGroup(group_id)


# the DAGScheduler's structured cancellation message ("Job N cancelled
# part of cancelled job group G"); matching it — not the bare word
# "cancelled", which can appear in query text or data errors — is what
# keeps unrelated failures from being misreported as interrupts
_CANCELLED_RE = re.compile(
    r"Job \d+ cancelled part of cancelled job group (\S+)")


def was_interrupted(exc: BaseException, group_id: str | None = None) -> bool:
    """True when an exception raised by a Spark action is the result of a
    job-group cancellation (the INTERRUPTED result code analogue).
    Classifies by the scheduler's structured cancellation message, walking
    exception causes; pass group_id to additionally verify WHICH group's
    cancellation this was."""
    seen: set[int] = set()
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        m = _CANCELLED_RE.search(str(cur))
        if m:
            return group_id is None or m.group(1) == group_id
        cur = cur.__cause__ or cur.__context__
    return False
