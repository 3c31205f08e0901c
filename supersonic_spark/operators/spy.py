"""Spy — plan wiretap (reference: supersonic/cursor/core/spy.h:36-57;
benchmark listeners, supersonic/cursor/core/benchmarks.h:28-60).

The reference interposes a logging cursor between operators; Spark's
equivalent is `df.observe(name, metrics...)` (collected at action time
without an extra pass) plus accumulator-style counters. The encode
pipeline's manifest carries the detailed per-partition metrics; this
wrapper covers the generic "count rows / sum bytes between operators"
use case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def spy(df: DataFrame, name: str = "spy",
        extra: dict[str, "F.Column"] | None = None
        ) -> tuple[DataFrame, Observation]:
    """Attach row-count (+ optional extra aggregate metrics) observation.
    Metrics land in the returned Observation after the next action:

        wired, obs = spy(df, "after_filter")
        wired.write.parquet(...)
        obs.get["rows"]
    """
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for alias, col in (extra or {}).items():
        metrics.append(col.alias(alias))
    return df.observe(obs, *metrics), obs
