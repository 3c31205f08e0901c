"""Repetition-based quality filters for training-data curation
(Gopher-rules style: Rae et al. 2021, "Scaling Language Models", §A1.1).

Four per-document metrics that catch boilerplate / template / spam text:

- ``dup_line_frac``       fraction of (non-empty, trimmed) lines that are
                          repeats of an earlier line: 1 - distinct/total.
- ``dup_line_char_frac``  fraction of line characters belonging to repeat
                          occurrences: sum((cnt-1)*len) / sum(cnt*len)
                          over distinct lines.
- ``top_2gram_char_frac`` characters covered by the single most frequent
                          word 2-gram (cnt * len(gram)) over the raw text
                          length. Ties break to the lexicographically
                          greatest gram (mirrored exactly in the DuckDB
                          oracle).
- ``dup_3gram_char_frac`` characters covered by word 3-grams occurring
                          more than once (sum cnt*len over grams with
                          cnt > 1, capped at 1.0 — overlapping grams can
                          exceed the text length).

Everything is built from Spark higher-order functions on the per-row
arrays, so the whole filter is a narrow, shuffle-free projection — at
100 TB it runs at scan speed with zero exchange.

Two performance rules learned measuring this at sf0.01 (35x and 4x):

1. Frequency statistics are ONE ``aggregate`` pass over the
   ``array_sort``-ed array with a struct accumulator tracking the
   current run — never a per-distinct-element ``filter`` scan, which
   goes quadratic in the interpreted higher-order evaluator.
2. The token/line/gram arrays are materialized as REAL COLUMNS in
   staged projections before any lambda touches them: a non-trivial
   subexpression referenced inside a lambda body (e.g. the ``split``
   under ``slice``) is re-evaluated per element, turning gram
   construction O(n^2). Staged projections survive CollapseProject
   because the arrays are non-cheap and multiply referenced.

Reference parity: Supersonic has no repetition filter; this is part of
the beyond-reference LLM-curation surface (like text/analysis.py).
Formulas are deliberately SQL-expressible so the DuckDB oracle verifies
them exactly (see plans/oracles.py ``text_repetition``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .analysis import tokens


def _nonempty_lines(col: Column) -> Column:
    lines = F.transform(F.split(col, "\n"), lambda x: F.trim(x))
    return F.filter(lines, lambda x: F.length(x) > 0)


def _grams_from_tokens(toks: Column, n: int) -> Column:
    """ALL word n-grams in order (with repeats) from a materialized
    token-array column — unlike dedup.word_ngrams, which derives the
    distinct shingle set. ``toks`` must be an attribute reference (see
    module docstring rule 2)."""
    return F.when(
        F.size(toks) >= n,
        F.transform(F.sequence(F.lit(0), F.size(toks) - n),
                    lambda i: F.array_join(F.slice(toks, i + 1, n), " "))
    ).otherwise(F.array().cast("array<string>"))


def _dup_char_sum(arr: Column, first_repeat_counts_both: bool) -> Column:
    """One sorted pass: total characters on repeat runs.

    With ``first_repeat_counts_both`` False this is sum((cnt-1)*len)
    (chars on occurrences beyond the first); True gives sum(cnt*len)
    over elements whose cnt > 1 (ALL occurrences of repeated elements).
    """
    bump = 2 if first_repeat_counts_both else 1
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("acc"))

    def step(a, x):
        is_rep = x == a["prev"]
        add = F.when(
            is_rep,
            F.when(a["run"] == 1, F.lit(bump) * F.length(x))
             .otherwise(F.length(x))
        ).otherwise(F.lit(0))
        return F.struct(
            x.alias("prev"),
            F.when(is_rep, a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (a["acc"] + add).alias("acc"))

    return F.aggregate(F.array_sort(arr), zero, step, lambda a: a["acc"])


def _top_run(arr: Column) -> Column:
    """One sorted pass: struct(c, g) of the most frequent element, ties
    to the lexicographically greatest (sorted order makes >= suffice)."""
    zero = F.struct(F.lit("").alias("prev"), F.lit(0).alias("run"),
                    F.lit(0).alias("bc"), F.lit("").alias("bg"))

    def step(a, x):
        run = F.when(x == a["prev"], a["run"] + 1).otherwise(F.lit(1))
        better = run >= a["bc"]
        return F.struct(
            x.alias("prev"), run.alias("run"),
            F.when(better, run).otherwise(a["bc"]).alias("bc"),
            F.when(better, x).otherwise(a["bg"]).alias("bg"))

    return F.aggregate(
        F.array_sort(arr), zero,
        step,
        lambda a: F.struct(a["bc"].alias("c"), a["bg"].alias("g")))


# --- metrics over materialized array columns -------------------------------

def _dup_line_frac_c(lines: Column) -> Column:
    n = F.size(lines)
    return F.when(n > 0,
                  F.round(1.0 - F.size(F.array_distinct(lines)) / n, 4)) \
            .otherwise(F.lit(0.0))


def _dup_line_char_frac_c(lines: Column) -> Column:
    total = F.aggregate(lines, F.lit(0), lambda acc, x: acc + F.length(x))
    dup = _dup_char_sum(lines, first_repeat_counts_both=False)
    return F.when(total > 0, F.round(dup / total, 4)).otherwise(F.lit(0.0))


def _top_2gram_char_frac_c(grams: Column, text_len: Column) -> Column:
    best = _top_run(grams)
    covered = best["c"] * F.length(best["g"])
    return F.when((F.size(grams) > 0) & (text_len > 0),
                  F.round(covered / text_len, 4)).otherwise(F.lit(0.0))


def _dup_3gram_char_frac_c(grams: Column, text_len: Column) -> Column:
    covered = _dup_char_sum(grams, first_repeat_counts_both=True)
    return F.when(text_len > 0,
                  F.round(F.least(covered / text_len, F.lit(1.0)), 4)) \
            .otherwise(F.lit(0.0))


# --- single-column convenience API (derives the arrays inline; fine for
# --- one-off expressions, use repetition_metrics for the staged plan) ------

def dup_line_frac(col: Column) -> Column:
    return _dup_line_frac_c(_nonempty_lines(col))


def dup_line_char_frac(col: Column) -> Column:
    return _dup_line_char_frac_c(_nonempty_lines(col))


def _clean_tokens(col: Column) -> Column:
    return F.filter(tokens(col), lambda x: F.length(x) > 0)


def top_2gram_char_frac(col: Column) -> Column:
    return _top_2gram_char_frac_c(_grams_from_tokens(_clean_tokens(col), 2),
                                  F.length(col))


def dup_3gram_char_frac(col: Column) -> Column:
    return _dup_3gram_char_frac_c(_grams_from_tokens(_clean_tokens(col), 3),
                                  F.length(col))


def repetition_metrics(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       passthrough: tuple[str, ...] = ()) -> DataFrame:
    """All four metrics plus the composite ``repetitive`` flag
    (Gopher-style thresholds). Narrow staged projections, no shuffle.
    ``passthrough`` columns ride along unchanged so a curation funnel
    can filter on the flag without a join back to the source scan."""
    c = F.col(text_col)
    thru = [F.col(x) for x in passthrough]
    # drop empty tokens: Spark's trim strips only spaces and split keeps
    # boundary empties, so whitespace-only text would otherwise produce
    # ""-token phantom grams (mirrored by list_filter in the oracle)
    base = df.select(
        F.col(id_col), *thru,
        F.length(c).alias("_len"),
        _nonempty_lines(c).alias("_lines"),
        F.filter(tokens(c), lambda x: F.length(x) > 0).alias("_toks"))
    staged = base.select(
        F.col(id_col), *thru, F.col("_len"), F.col("_lines"),
        _grams_from_tokens(F.col("_toks"), 2).alias("_g2"),
        _grams_from_tokens(F.col("_toks"), 3).alias("_g3"))
    # materialize the top-2gram run struct so extracting .c and .g does
    # not expand the aggregate twice (visible in .explain otherwise)
    staged2 = staged.select(
        F.col(id_col), *thru, F.col("_len"), F.col("_lines"), F.col("_g3"),
        F.size(F.col("_g2")).alias("_ng2"),
        _top_run(F.col("_g2")).alias("_best2"))
    top2 = F.when(
        (F.col("_ng2") > 0) & (F.col("_len") > 0),
        F.round(F.col("_best2")["c"] * F.length(F.col("_best2")["g"])
                / F.col("_len"), 4)).otherwise(F.lit(0.0))
    out = staged2.select(
        F.col(id_col), *thru,
        _dup_line_frac_c(F.col("_lines")).alias("dup_line_frac"),
        _dup_line_char_frac_c(F.col("_lines")).alias("dup_line_char_frac"),
        top2.alias("top_2gram_char_frac"),
        _dup_3gram_char_frac_c(F.col("_g3"),
                               F.col("_len")).alias("dup_3gram_char_frac"))
    return out.withColumn(
        "repetitive",
        (F.col("dup_line_frac") > 0.30)
        | (F.col("dup_line_char_frac") > 0.20)
        | (F.col("top_2gram_char_frac") > 0.20)
        | (F.col("dup_3gram_char_frac") > 0.60))
