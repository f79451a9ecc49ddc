"""Dev harness approximating the driver's correctness gate: run every
registered query in Spark and its oracle in DuckDB on the same parquet,
compare row count + column names + order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def norm_cell(v):
    # type-sensitive like the driver's value-hash: int 87 != float 87.0
    # (DuckDB HUGEINT sums arrive as float64 — oracles must CAST to BIGINT).
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", round(v, 6))
    return (type(v).__name__, v)


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.shuffle.partitions", "8")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from data_crawler_spark.plans.fixture_queries import ORACLE, QUERIES
    from data_crawler_spark.sources.fixtures import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    if only:
        unknown = sorted(set(only) - set(QUERIES))
        if unknown:
            # a typo'd name silently matching nothing would print
            # "0 pass, 0 fail" and exit 0 — a no-op read as a pass
            print(f"ERROR: unknown query name(s): {unknown}")
            return 2
    n_pass = n_fail = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        sql = ORACLE.get(name)
        try:
            sdf = fn(spark, sf)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if sql is None:
            print(f"rows {name}: {len(srows)} rows (no oracle)")
            continue
        try:
            dres = con.sql(sql)
            dcols = [c.lower() for c in dres.columns]
            drows = dres.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error {str(e)[:300]}")
            n_fail += 1
            continue
        ok_cols = sorted(c.lower() for c in scols) == sorted(dcols)
        s = norm_rows([c.lower() for c in scols], srows)
        d = norm_rows(dcols, drows)
        if ok_cols and s == d:
            print(f"PASS {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL {name}: cols_match={ok_cols} spark={len(srows)} duck={len(drows)}")
            if not ok_cols:
                print(f"  spark cols: {scols}\n  duck cols:  {dcols}")
            else:
                sd, ss = set(d), set(s)  # hoist: O(rows), not O(rows^2)
                diff_s = [r for r in s if r not in sd][:3]
                diff_d = [r for r in d if r not in ss][:3]
                print(f"  spark-only: {diff_s}\n  duck-only:  {diff_d}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
