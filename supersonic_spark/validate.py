"""Data-quality expectations audit: declarative rules evaluated as a
violations report — the ingest-side contract check every production
pipeline runs before (and after) an encode job (dbt tests / Deequ /
Great Expectations surface, re-expressed as plain Catalyst plans).

Rule kinds and their plan shapes (the 100 TB story):
  not_null / in_range / accepted / expr
      all fold into ONE conditional aggregate over a SINGLE scan of the
      table — each rule is a `SUM(CAST(violates AS LONG))` column in the
      same Aggregate, so adding rules adds expressions, not passes, and
      the partial aggregation is map-side (one row per task reaches the
      final agg).
  unique
      rides the SAME single-scan aggregate: violations =
      COUNT(col) - COUNT(DISTINCT col) (duplicate non-null rows).
      Spark plans the mixed distinct/non-distinct agg with its standard
      two-phase expand — still one scan of the fact table.
  foreign_key
      one LEFT ANTI join per referenced dimension, counting fact rows
      whose non-null key misses the dim. Dimensions are the small side
      — broadcast hint applied, so the fact table never shuffles.

The report is the UNION of the single-scan aggregate (melted to rows
via an explode over a literal rule-name array — no per-rule jobs) and
one tiny count per FK rule. Everything is built-in expressions; no
UDFs, no collect of data rows.

Beyond-reference surface (Supersonic has no constraint checker); oracle
parity in plans/oracles.py ``validate_expectations``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F


def not_null(name: str, col: str) -> dict:
    return {"name": name, "kind": "not_null", "col": col}


def in_range(name: str, col: str, lo, hi) -> dict:
    return {"name": name, "kind": "in_range", "col": col, "lo": lo, "hi": hi}


def accepted(name: str, col: str, values: list) -> dict:
    return {"name": name, "kind": "accepted", "col": col, "values": values}


def unique(name: str, col: str) -> dict:
    return {"name": name, "kind": "unique", "col": col}


def expr_rule(name: str, violates: Column) -> dict:
    """Custom rule: ``violates`` is a boolean Column, true == violation."""
    return {"name": name, "kind": "expr", "violates": violates}


def foreign_key(name: str, col: str, dim: DataFrame, dim_col: str) -> dict:
    return {"name": name, "kind": "foreign_key", "col": col,
            "dim": dim, "dim_col": dim_col}


def _violates(rule: dict) -> Column:
    """Boolean violation predicate for the single-scan rule kinds.

    NULL semantics follow SQL constraint convention: range / accepted
    checks pass NULLs through (a NULL is not a range violation — add a
    separate not_null rule to reject it), mirroring ANSI CHECK
    constraints which only fail on FALSE, never UNKNOWN.
    """
    kind = rule["kind"]
    if kind == "not_null":
        return F.col(rule["col"]).isNull()
    if kind == "in_range":
        c = F.col(rule["col"])
        bad = (c < F.lit(rule["lo"])) | (c > F.lit(rule["hi"]))
        return F.coalesce(bad, F.lit(False))
    if kind == "accepted":
        c = F.col(rule["col"])
        return F.coalesce(~c.isin(*rule["values"]), F.lit(False))
    if kind == "expr":
        return F.coalesce(rule["violates"], F.lit(False))
    raise ValueError(f"not a scan rule: {kind}")


def expectations_report(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate all rules; return (rule, violations) — one row per rule.

    violations == 0 means the expectation holds. See module docstring
    for the per-kind plan shapes; the scan-level rules share one pass.
    """
    scan_rules = [r for r in rules
                  if r["kind"] in ("not_null", "in_range", "accepted",
                                   "expr", "unique")]
    fk_rules = [r for r in rules if r["kind"] == "foreign_key"]
    if not scan_rules and not fk_rules:
        raise ValueError("expectations_report needs at least one rule")

    parts = []
    if scan_rules:
        aggs = []
        for r in scan_rules:
            if r["kind"] == "unique":
                aggs.append((F.count(F.col(r["col"]))
                             - F.count_distinct(F.col(r["col"])))
                            .alias(r["name"]))
            else:
                aggs.append(F.sum(_violates(r).cast("long"))
                            .alias(r["name"]))
        wide = df.agg(*aggs)
        # melt the 1-row wide aggregate to (rule, violations) rows with a
        # literal struct array — no second job, no per-rule scans
        pairs = F.array(*[
            F.struct(F.lit(r["name"]).alias("rule"),
                     F.coalesce(F.col(r["name"]), F.lit(0))
                      .alias("violations"))
            for r in scan_rules])
        parts.append(wide.select(F.explode(pairs).alias("p"))
                         .select("p.rule", "p.violations"))

    for r in fk_rules:
        dim_keys = (r["dim"].select(F.col(r["dim_col"]).alias(r["col"]))
                            .distinct())
        missing = (df.select(r["col"])
                     .filter(F.col(r["col"]).isNotNull())
                     .join(F.broadcast(dim_keys), r["col"], "left_anti"))
        parts.append(missing.agg(
            F.lit(r["name"]).alias("rule"),
            F.count("*").alias("violations")))

    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def table_diff_buckets(a: DataFrame, b: DataFrame, key_col: str,
                       cols: list[str], n_buckets: int = 1024) -> DataFrame:
    """Merkle-style anti-entropy diff: find WHICH key-hash buckets two
    table versions/replicas disagree in, without shipping either table.
    Each side reduces to n_buckets (bucket, n rows, XOR of row content
    hashes) summaries — O(n_buckets) rows cross the wire, the
    full-outer join of the summaries marks each differing bucket
    added / removed / changed, and only those buckets need row-level
    repair. XOR is order- and partitioning-independent and cannot
    overflow; the standard caveat applies (an even number of identical
    corruptions in one bucket cancels — at 60 hash bits the accidental
    case is negligible).

    Row content hash = portable 60-bit md5 over key + cols
    (\\x1f-joined, NULL -> \\x01 sentinel), so any SQL engine audits
    the same summaries. Output: (bucket, n_a, n_b, status) for differing
    buckets only; an empty result certifies bucket-level equality."""
    from supersonic_spark.text.analysis import portable_hash64

    def summarize(df, n_name, x_name):
        payload = F.concat_ws(
            "\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x01"))
                      for c in [key_col, *cols]])
        h = portable_hash64(payload)
        bucket = F.pmod(portable_hash64(F.col(key_col).cast("string")),
                        F.lit(n_buckets)).cast("int")
        return (df.select(bucket.alias("bucket"), h.alias("_h"))
                  .groupBy("bucket")
                  .agg(F.count("*").alias(n_name),
                       F.bit_xor("_h").alias(x_name)))
    sa = summarize(a, "n_a", "x_a")
    sb = summarize(b, "n_b", "x_b")
    j = sa.join(sb, "bucket", "full_outer")
    status = (F.when(F.col("n_a").isNull(), F.lit("added"))
               .when(F.col("n_b").isNull(), F.lit("removed"))
               .otherwise(F.lit("changed")))
    return (j.filter(F.col("n_a").isNull() | F.col("n_b").isNull()
                     | (F.col("n_a") != F.col("n_b"))
                     | (F.col("x_a") != F.col("x_b")))
             .select("bucket",
                     F.coalesce("n_a", F.lit(0)).alias("n_a"),
                     F.coalesce("n_b", F.lit(0)).alias("n_b"),
                     status.alias("status")))
