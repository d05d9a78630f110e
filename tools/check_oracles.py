"""Local replica of the driver's correctness gate: run every queries()
entry in Spark and its oracle_sql() in DuckDB at a given sf dir, compare
row count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entry_mod  # noqa: E402
from fuzzycat_spark import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    return str(v)


def canon(rows, cols):
    return sorted(",".join(norm_cell(r[c]) for c in cols) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"SKIP {name}: no oracle ({len(srows)} spark rows)")
            continue
        try:
            ddf = con.sql(oracles[name])
            dcols = ddf.columns
            drows = [dict(zip(dcols, row)) for row in ddf.fetchall()]
        except Exception as e:
            print(f"FAIL {name}: duckdb error {type(e).__name__}: {str(e)[:300]}")
            failures += 1
            continue
        cols_sorted = sorted(scols)
        problems = []
        if sorted(dcols) != cols_sorted:
            problems.append(f"schema spark={sorted(scols)} duckdb={sorted(dcols)}")
        elif len(srows) != len(drows):
            problems.append(f"rows spark={len(srows)} duckdb={len(drows)}")
        else:
            cs, cd = canon(srows, cols_sorted), canon(drows, cols_sorted)
            if cs != cd:
                diff = [
                    (a, b) for a, b in zip(cs, cd) if a != b
                ][:3]
                problems.append(f"values differ, first diffs: {diff}")
        took = time.time() - t0
        if problems:
            print(f"FAIL {name} ({took:.1f}s, {len(srows)} rows): " + "; ".join(problems))
            failures += 1
        else:
            print(f"OK   {name} ({took:.1f}s, {len(srows)} rows)")
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
