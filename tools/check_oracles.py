"""Mimic the driver's correctness gate: run every queries() entry on Spark
and its oracle_sql() on DuckDB at the given SF, compare row count + schema
names + order-insensitive value multiset (columns sorted by name, values
stringified with float rounding)."""

from __future__ import annotations

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as E

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def norm_val(v):
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        return f"{v:.6g}"
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(norm_val(r[i]) for i in order) for r in rows)


def main():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    from vtcomposite_spark.schema import get_spark
    spark = get_spark(app="oracle-check", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")

    only = sys.argv[1:] or None
    qs = E.queries()
    os_ = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as ex:
            failures.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error {str(ex)[:200]}")
            continue
        if name not in os_:
            print(f"ROWS-ONLY {name}: {len(srows)} rows")
            continue
        try:
            rel = con.sql(os_[name])
            dcols = [c for c in rel.columns]
            drows = rel.fetchall()
        except Exception as ex:
            failures.append((name, f"duckdb error: {ex}"))
            print(f"FAIL {name}: duckdb error {str(ex)[:200]}")
            continue
        ok_schema = sorted(scols) == sorted(dcols)
        a = norm_rows(scols, srows)
        b = norm_rows(dcols, drows)
        if not ok_schema:
            failures.append((name, f"schema {scols} vs {dcols}"))
            print(f"FAIL {name}: schema {scols} vs {dcols}")
        elif len(srows) != len(drows):
            failures.append((name, f"rowcount {len(srows)} vs {len(drows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(drows)}")
        elif a != b:
            diff_a = list((a - b).items())[:3]
            diff_b = list((b - a).items())[:3]
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: values; spark-only={diff_a} duck-only={diff_b}")
        else:
            print(f"OK   {name}: {len(srows)} rows")
    print(f"\n{len(failures)} failures" if failures else "\nALL OK")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
