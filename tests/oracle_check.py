"""Standalone Spark-vs-DuckDB oracle comparison (mirrors the driver's check).

Usage: python tests/oracle_check.py [sf_dir] [query ...]
Compares row count, column names, and the order-insensitive multiset of
canonicalized row values for every query that has an oracle.
"""

from __future__ import annotations

import math
import os
import sys
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and float repr noise at the comparison layer
        return round(v, 9) + 0.0
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def rows_to_multiset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = {}
    for r in rows:
        key = tuple(canon(r[i]) for i in order)
        out[key] = out.get(key, 0) + 1
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from heliport_spark.plans import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        import time

        t0 = time.time()
        df = fn(spark, sf_dir)
        spark_rows = df.collect()
        spark_cols = df.columns
        dt_spark = time.time() - t0
        if sql is None:
            print(f"{name}: rows-only, {len(spark_rows)} rows ({dt_spark:.1f}s)")
            continue
        t0 = time.time()
        res = con.execute(sql)
        duck_cols = [d[0] for d in res.description]
        duck_rows = res.fetchall()
        dt_duck = time.time() - t0
        status = []
        if len(spark_rows) != len(duck_rows):
            status.append(f"ROWCOUNT {len(spark_rows)} vs {len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            status.append(f"SCHEMA {sorted(spark_cols)} vs {sorted(duck_cols)}")
        if not status:
            ms_s = rows_to_multiset(spark_rows, spark_cols)
            ms_d = rows_to_multiset(duck_rows, duck_cols)
            if ms_s != ms_d:
                only_s = {k: c for k, c in ms_s.items() if ms_d.get(k) != c}
                only_d = {k: c for k, c in ms_d.items() if ms_s.get(k) != c}
                status.append(
                    f"VALUES spark-only={list(only_s.items())[:3]} "
                    f"duck-only={list(only_d.items())[:3]}"
                )
        if status:
            failures.append(name)
            print(f"{name}: MISMATCH {' | '.join(status)}")
        else:
            print(
                f"{name}: OK {len(spark_rows)} rows "
                f"(spark {dt_spark:.1f}s, duck {dt_duck:.1f}s)"
            )
    print("\nFAILED:" if failures else "\nALL OK", failures if failures else "")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
