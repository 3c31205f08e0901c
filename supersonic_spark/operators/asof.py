"""As-of join and range join — operators the reference lacks (SURVEY.md
§2.3 notes no range/as-of joins) but a transcript/event engine needs.

as_of_join: for each left row, the latest right row with
right.on <= left.on within the same key — expressed as a union + window
(last-non-null carry-forward) so it stays a sort-based distributed plan:
one shuffle on (key), no per-row Python, no broadcast requirement.
At 100 TB this beats the naive range-join (which explodes) and matches
DuckDB's ASOF JOIN semantics for the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(left: DataFrame, right: DataFrame, key: str, on: str,
               value_cols: list[str] | None = None,
               direction: str = "backward") -> DataFrame:
    """For each left row: the columns of one matching right row on the
    same `key`, chosen by `direction`:

    - "backward" (default): latest right row with right[on] <= left[on]
      (ties on `on` match — the DuckDB ASOF `>=` convention)
    - "forward": earliest right row with right[on] >= left[on] (ties
      match)
    - "nearest": whichever of the two is closer in `on`; exact ties
      (including an equal-`on` match) resolve backward

    Right columns are null when no row qualifies. If the right side has
    duplicate (key, on) pairs, which duplicate wins is unspecified —
    deduplicate the right side first when that matters.

    Plan shape for every direction: union + key-partitioned ordered
    window (carry-forward / carry-backward), one shuffle on the key, no
    per-row Python, no broadcast requirement — "nearest" computes both
    fills over the SAME sorted partition (two frames, one sort), never
    a self-join.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown as-of direction {direction!r}")
    value_cols = value_cols or [c for c in right.columns
                                if c not in (key, on)]
    carry = list(value_cols)
    if direction == "nearest":
        carry = carry + [on]          # need the matched `on` for deltas
    l_tag = left.select(
        key, on, *[c for c in left.columns if c not in (key, on)],
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}")
          for c in carry])
    r_tag = right.select(
        key, on,
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in (key, on)],
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_r_{c}") for c in carry])
    unioned = l_tag.unionByName(r_tag)
    # tie order: whichever side must see equal-`on` right rows inside
    # its frame sorts the right rows toward it
    tie = (F.col("_is_left").desc() if direction == "forward"
           else F.col("_is_left").asc())
    wb = (Window.partitionBy(key).orderBy(F.col(on).asc(), tie)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy(key).orderBy(F.col(on).asc(), tie)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    if direction == "backward":
        fills = {c: F.last(f"_r_{c}", ignorenulls=True).over(wb)
                 for c in carry}
    elif direction == "forward":
        fills = {c: F.first(f"_r_{c}", ignorenulls=True).over(wf)
                 for c in carry}
    else:
        # backward frame includes equal-`on` right rows (tie asc), the
        # forward frame is strictly-after — an exact match carries
        # delta 0 on the backward side and wins, as specified
        fills = {}
        # raw subtraction: timestamps yield exact day-time INTERVALs
        # (microsecond precision — unix_timestamp() would truncate to
        # seconds and misrank sub-second nearest decisions), numerics
        # yield numerics; both compare directly
        b_on = F.last(f"_r_{on}", ignorenulls=True).over(wb)
        f_on = F.first(f"_r_{on}", ignorenulls=True).over(wf)
        db = F.col(on) - b_on
        df_ = f_on - F.col(on)
        use_b = (f_on.isNull()
                 | (b_on.isNotNull() & (db <= df_)))
        for c in value_cols:
            fills[c] = F.when(
                use_b, F.last(f"_r_{c}", ignorenulls=True).over(wb)) \
                .otherwise(F.first(f"_r_{c}", ignorenulls=True).over(wf))
    filled = unioned.select(
        "*", *[fills[c].alias(f"_f_{c}") for c in value_cols])
    out = filled.filter(F.col("_is_left") == 1).drop(
        "_is_left", *[f"_r_{c}" for c in carry])
    for c in value_cols:
        out = out.withColumnRenamed(f"_f_{c}", c)
    return out


def range_join(left: DataFrame, right: DataFrame, key: str,
               left_point: str, right_lo: str, right_hi: str) -> DataFrame:
    """left rows joined to right intervals containing their point value
    (inclusive bounds). Declared as a plain theta join so Catalyst can pick
    a broadcast-nested-loop for small right sides; for large right sides
    callers should bucket by range (the 100 TB path)."""
    return left.alias("l").join(
        right.alias("r"),
        F.expr(f"l.{key} = r.{key} AND "
               f"l.{left_point} >= r.{right_lo} AND "
               f"l.{left_point} <= r.{right_hi}"),
        "inner")


def range_join_bucketed(left: DataFrame, right: DataFrame, key: str,
                        left_point: str, right_lo: str, right_hi: str,
                        bin_width: int) -> DataFrame:
    """range_join's 100 TB path: explode each right interval into the
    fixed-width bins it overlaps, bin the left point, and equi-join on
    (key, bin) — a shuffled hash join Catalyst can plan and AQE can
    rebalance, never a nested-loop. Each matching (left row, interval)
    pair meets in EXACTLY one bin (the bin containing the left point), so
    no post-join dedup is needed. Pick bin_width near the typical
    interval length: an interval spanning B bins costs B exploded rows,
    while a too-wide bin degrades toward the theta join's row pairing.
    Returns the same columns as range_join (left.*, right.*)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    lb = left.withColumn("_bin", F.floor(F.col(left_point) / bin_width))
    rb = right.withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(right_lo) / bin_width),
                             F.floor(F.col(right_hi) / bin_width))))
    joined = lb.alias("l").join(
        rb.alias("r"),
        F.expr(f"l.{key} = r.{key} AND l._bin = r._bin AND "
               f"l.{left_point} >= r.{right_lo} AND "
               f"l.{left_point} <= r.{right_hi}"),
        "inner")
    return joined.drop("_bin")
