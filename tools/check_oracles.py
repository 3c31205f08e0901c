"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir;
compare row count, column names, and an order-insensitive value hash.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.6g}"
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_hash(cols: dict[str, list]) -> tuple[int, str]:
    names = sorted(cols)
    n = len(cols[names[0]]) if names else 0
    rows = sorted(
        "\x01".join(norm_cell(cols[c][i]) for c in names) for i in range(n)
    )
    h = hashlib.md5()
    for r in rows:
        h.update(r.encode("utf-8", "surrogatepass"))
        h.update(b"\x02")
    return n, h.hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    from supersonic_spark.session import get_spark
    spark = get_spark(cores=8)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            names = sdf.columns
            rows = sdf.collect()
            s_cols = {c: [r[i] for r in rows] for i, c in enumerate(names)}
            s_n, s_h = frame_hash(s_cols)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {str(e)[:200]}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"rows  {name}: {s_n} rows (no oracle)  [{time.time()-t0:.1f}s]")
            continue
        try:
            rel = con.sql(oracles[name])
            d_names = [d[0] for d in rel.description]
            d_rows = rel.fetchall()
            d_cols = {c: [r[i] for r in d_rows] for i, c in enumerate(d_names)}
            d_n, d_h = frame_hash(d_cols)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {str(e)[:200]}")
            failures.append(name)
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL  {name}: columns {sorted(s_cols)} vs {sorted(d_cols)}")
            failures.append(name)
        elif s_n != d_n:
            print(f"FAIL  {name}: rows {s_n} vs {d_n}")
            failures.append(name)
        elif s_h != d_h:
            print(f"FAIL  {name}: value hash mismatch ({s_n} rows)")
            failures.append(name)
        else:
            print(f"OK    {name}: {s_n} rows match  [{time.time()-t0:.1f}s]")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
