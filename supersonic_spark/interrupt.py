"""Cooperative job cancellation — the reference Cursor Interrupt surface
(reference: supersonic/cursor/base/cursor.h:150-186: Interrupt() requests
termination, the cursor later returns INTERRUPTED) re-expressed on Spark's
job-group machinery: actions launched inside a `job_group` scope can be
cancelled from any other thread via `interrupt`, and the interrupted
action raises, which `was_interrupted` classifies.
"""

from __future__ import annotations

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


def was_interrupted(exc: BaseException) -> bool:
    """True when an exception raised by a Spark action is the result of a
    job-group cancellation (the INTERRUPTED result code analogue)."""
    msg = str(exc)
    return "cancelled" in msg.lower() or "SparkJobCancelled" in msg
