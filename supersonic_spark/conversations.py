"""Conversation/transcript integrity auditing — the transcript-specific
data-quality layer on top of the generic expectations engine
(supersonic_spark.validate): given a table shaped like the north-rule
transcript schema (conv_id, turn_idx, role, text, ts), report structural
violations a 100 TB ingest job must quarantine before encoding:

- ``turn_gap``        turn_idx is not the predecessor's + 1
- ``role_repeat``     two consecutive user/assistant turns with the same
                      role (broken alternation; tool turns are exempt —
                      agent traces legally emit tool/tool runs)
- ``ts_regression``   a turn's timestamp is before its predecessor's
- ``empty_text``      blank/whitespace-only text
- ``first_turn``      a conversation whose first turn is not turn_idx=0
                      with role='user'

Plan shape: ONE pass — a single window over (conv_id) ordered by
turn_idx computes lag(role)/lag(turn_idx)/lag(ts) and row_number
together, then one aggregate folds all five violation counts (the same
"scan rules fold into one aggregate" discipline as
validate.expectations_report). The window shuffle partitions by conv_id
— the same key the encode pipeline already clusters by, so on the
bucketized layout it is shuffle-free.

All expressions are engine-portable; oracle parity in
plans/oracles.py ``conv_integrity_audit``. Beyond-reference surface
(Supersonic has no transcript tooling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def integrity_report(conv: DataFrame,
                     conv_col: str = "conv_id",
                     idx_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "text",
                     ts_col: str = "ts",
                     alternating_roles: tuple[str, str] =
                     ("user", "assistant")) -> DataFrame:
    """Audit transcript structure; returns (check, violations) with one
    row per check above, violation counts in turn (or conversation, for
    ``first_turn``) units. Deterministic, zero UDFs."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    a, b = alternating_roles
    rr = F.col(role_col).isin([a, b])
    prev_rr = F.lag(role_col).over(w).isin([a, b])
    x = conv.select(
        F.col(conv_col).alias("_conv"),
        F.col(idx_col).alias("_idx"),
        F.col(role_col).alias("_role"),
        F.col(text_col).alias("_text"),
        F.col(ts_col).alias("_ts"),
        F.lag(idx_col).over(w).alias("_pidx"),
        F.lag(role_col).over(w).alias("_prole"),
        F.lag(ts_col).over(w).alias("_pts"),
        (F.row_number().over(w) == 1).alias("_first"),
        (rr & prev_rr).alias("_alt_pair"),
    )
    agg = x.agg(
        F.count(F.when(x["_pidx"].isNotNull()
                       & (x["_idx"] != x["_pidx"] + 1), 1))
         .alias("turn_gap"),
        F.count(F.when(x["_alt_pair"] & (x["_role"] == x["_prole"]), 1))
         .alias("role_repeat"),
        F.count(F.when(x["_pts"].isNotNull() & (x["_ts"] < x["_pts"]), 1))
         .alias("ts_regression"),
        F.count(F.when(F.length(F.trim(F.coalesce(x["_text"], F.lit(""))))
                       == 0, 1)).alias("empty_text"),
        F.count(F.when(x["_first"] & ~((x["_idx"] == 0)
                                       & (x["_role"] == a)), 1))
         .alias("first_turn"),
    )
    checks = ["turn_gap", "role_repeat", "ts_regression", "empty_text",
              "first_turn"]
    return agg.select(F.stack(
        F.lit(len(checks)),
        *[c for name in checks for c in (F.lit(name), F.col(name))]
    ).alias("check", "violations"))


def conversation_stats(conv: DataFrame,
                       conv_col: str = "conv_id",
                       idx_col: str = "turn_idx",
                       role_col: str = "role",
                       text_col: str = "text",
                       ts_col: str = "ts") -> DataFrame:
    """Per-conversation rollup the curation layer keys on: turn count,
    user/assistant/tool turn mix, total whitespace tokens, and wall-clock
    span in seconds. One shuffle on conv_id (shuffle-free on the
    bucketized layout); token counts are exact integer arithmetic."""
    from supersonic_spark.text.analysis import token_count
    return (conv.groupBy(F.col(conv_col).alias("conv_id"))
            .agg(F.count("*").alias("n_turns"),
                 F.count(F.when(F.col(role_col) == "user", 1))
                  .alias("n_user"),
                 F.count(F.when(F.col(role_col) == "assistant", 1))
                  .alias("n_assistant"),
                 F.count(F.when(F.col(role_col) == "tool", 1))
                  .alias("n_tool"),
                 F.sum(token_count(F.col(text_col))).alias("n_tokens"),
                 _floor_div_us(
                     F.unix_micros(F.max(ts_col).cast("timestamp"))
                     - F.unix_micros(F.min(ts_col).cast("timestamp")))
                 .alias("span_sec")))


def _floor_div_us(span_us):
    """Whole seconds from a non-negative microsecond span, by exact
    integer arithmetic (subtract the remainder before dividing — the
    numerator is then exactly divisible, so the double division is
    exact). Truncating each endpoint to seconds first would disagree
    with SQL engines' epoch arithmetic by ±1."""
    whole = span_us - F.pmod(span_us, F.lit(1_000_000))
    return (whole / F.lit(1_000_000)).cast("long")


def role_transitions(conv: DataFrame,
                     conv_col: str = "conv_id",
                     idx_col: str = "turn_idx",
                     role_col: str = "role") -> DataFrame:
    """First-order Markov role-transition matrix over the transcript
    corpus: for every adjacent turn pair inside a conversation, count
    (role -> next_role) and normalize per source role. The empirical
    P(next_role | role) is the structural signature of a corpus — agent
    traces read user->assistant->tool->tool->assistant, chat corpora
    alternate strictly — and a drifting matrix between two snapshots is
    a cheap corpus-mix regression alarm.

    Plan shape: one window shuffle on conv_col (shuffle-free on the
    bucketized layout — the same key the encoder clusters by), one
    (role, next_role) aggregate of at most |roles|^2 rows, and a
    |roles|-partition window for the row normalization. No UDFs;
    probabilities rounded to 6 for engine portability.
    Output: (role, next_role, n, p)."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    pairs = (conv.select(F.col(role_col).alias("role"),
                         F.lead(role_col).over(w).alias("next_role"))
             .filter(F.col("next_role").isNotNull()))
    per_src = Window.partitionBy("role")
    return (pairs.groupBy("role", "next_role")
            .agg(F.count("*").alias("n"))
            .withColumn("p", F.round(F.col("n")
                                     / F.sum("n").over(per_src), 6)))


def longest_tool_runs(conv: DataFrame,
                      conv_col: str = "conv_id",
                      idx_col: str = "turn_idx",
                      role_col: str = "role",
                      run_role: str = "tool") -> DataFrame:
    """Gaps-and-islands over agent traces: consecutive runs of
    ``run_role`` turns per conversation (an agent burning 14 tool calls
    in a row is a loop signature; the run-length distribution is a core
    agent-behavior metric). Island id = global row_number minus the
    row_number among run_role rows — constant exactly within a
    consecutive run, even when turn_idx has gaps.

    Plan shape: both windows share ONE conv_col sort order, so Spark
    plans a single window exchange (shuffle-free on the bucketized
    layout); the run table that follows is O(runs), not O(turns).
    Output: (conv_id, max_tool_run, n_tool_runs, n_tool_turns), only
    for conversations containing at least one run_role turn."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    rn = conv.select(F.col(conv_col), F.col(idx_col), F.col(role_col),
                     F.row_number().over(w).alias("_rn"))
    tool = (rn.filter(F.col(role_col) == run_role)
            .select(F.col(conv_col),
                    (F.col("_rn") - F.row_number().over(w))
                    .alias("_island")))
    runs = (tool.groupBy(conv_col, "_island")
            .agg(F.count("*").alias("_len")))
    return (runs.groupBy(F.col(conv_col).alias("conv_id"))
            .agg(F.max("_len").alias("max_tool_run"),
                 F.count("*").alias("n_tool_runs"),
                 F.sum("_len").alias("n_tool_turns")))


def merge_consecutive_turns(conv: DataFrame,
                            conv_col: str = "conv_id",
                            idx_col: str = "turn_idx",
                            role_col: str = "role",
                            text_col: str = "text",
                            sep: str = "\n") -> DataFrame:
    """Coalesce consecutive same-role turns into one turn — the
    standard transcript-preprocessing step before training-format
    assembly (a user double-send or an agent's tool/tool/tool burst
    becomes a single turn whose text is the run's texts joined by
    ``sep``). Island id = running sum of role-change flags, so runs are
    delimited by actual role changes, not turn_idx arithmetic.

    Plan shape: the lag flag and the running sum share one
    (conv_col, idx_col) sort — a single window exchange — and the
    merge aggregate keys on (conv, island). Within-island text order
    is restored by array_sort over (idx, text) structs, never by
    partition order. Output: (conv_id, turn_idx, role, text, n_merged)
    with turn_idx = the run's first index."""
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    # null-SAFE role comparison (IS DISTINCT FROM semantics, matching
    # the DuckDB oracle): with a plain !=, a NULL-role row got chg=0
    # and silently merged into the preceding different-role run. The
    # first row's lag is NULL, which eqNullSafe treats as equal only to
    # a NULL role — so flag row 1 explicitly via a row_number-free
    # check on lag-of-idx instead of lag-of-role.
    chg = F.when(F.lag(idx_col).over(w).isNull()
                 | ~F.lag(role_col).over(w).eqNullSafe(F.col(role_col)),
                 F.lit(1)).otherwise(F.lit(0))
    flagged = conv.select(F.col(conv_col), F.col(idx_col),
                          F.col(role_col), F.col(text_col),
                          chg.alias("_chg"))
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = flagged.withColumn("_island", F.sum("_chg").over(run))
    ordered = F.array_sort(F.collect_list(
        F.struct(F.col(idx_col).alias("i"), F.col(text_col).alias("t"))))
    return (isl.groupBy(conv_col, "_island")
            .agg(F.min(idx_col).alias("turn_idx"),
                 F.min(role_col).alias("role"),
                 F.array_join(F.transform(ordered, lambda s: s["t"]),
                              sep).alias("text"),
                 F.count("*").alias("n_merged"))
            .select(F.col(conv_col).alias("conv_id"), "turn_idx",
                    "role", "text", "n_merged"))
