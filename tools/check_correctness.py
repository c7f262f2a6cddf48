"""Local twin of the driver's correctness gate: run every __spark_entry__
query on a VANILLA Spark session AND its DuckDB oracle at sf0.01, compare
row count, schema (column names), and sorted values.

Usage: python tools/check_correctness.py [query ...]   (default: all)
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return v


def main(names: list[str]) -> int:
    import __spark_entry__ as entry
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("correctness-check")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    todo = names or list(qs)
    failures = 0
    for name in todo:
        try:
            sdf = qs[name](spark, SF_DIR)
            spark_rows = [tuple(norm(v) for v in r) for r in sdf.collect()]
            spark_cols = list(sdf.columns)
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: spark err {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        if name not in oracles:
            print(f"....  {name}: no_oracle ({len(spark_rows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            o_cols = [d[0] for d in res.description]
            o_rows = [tuple(norm(v) for v in r) for r in res.fetchall()]
        except Exception as ex:  # noqa: BLE001
            print(f"FAIL {name}: oracle err {type(ex).__name__}: {str(ex)[:200]}")
            failures += 1
            continue
        # driver compare: sort columns by name, then sort rows
        s_idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        o_idx = sorted(range(len(o_cols)), key=lambda i: o_cols[i])
        s_sorted = sorted(tuple(r[i] for i in s_idx) for r in spark_rows)
        o_sorted = sorted(tuple(r[i] for i in o_idx) for r in o_rows)
        cols_ok = sorted(spark_cols) == sorted(o_cols)
        rows_ok = len(spark_rows) == len(o_rows)
        vals_ok = s_sorted == o_sorted
        if cols_ok and rows_ok and vals_ok:
            print(f"PASS  {name}: {len(spark_rows)} rows")
        else:
            failures += 1
            print(
                f"FAIL  {name}: rows {len(spark_rows)}/{len(o_rows)} "
                f"cols_ok={cols_ok} vals_ok={vals_ok}"
            )
            if not cols_ok:
                print(f"      spark={sorted(spark_cols)} oracle={sorted(o_cols)}")
            if not vals_ok and rows_ok:
                for a, b in zip(s_sorted, o_sorted):
                    if a != b:
                        print(f"      first diff: spark={a} oracle={b}")
                        break
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
