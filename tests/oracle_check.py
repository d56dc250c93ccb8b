"""Standalone Spark-vs-DuckDB oracle comparison (mirrors the driver's check).

Usage: python tests/oracle_check.py [sf_dir] [query ...]

Replicates the driver's canonicalizer: both results are converted to pandas,
columns sorted by name, rows sorted by all columns, then compared CELL-EXACT
— dtypes included, floats unrounded. This is deliberately stricter than a
"same numbers" check: DuckDB's sum(INTEGER) is HUGEINT (→ float64/object in
pandas) while Spark's is LONG, and that dtype drift fails the driver's value
hash even when the numbers match (VERDICT r01 "What's wrong" #1). Flat scalar
columns only — array cells are unhashable/unsortable in the driver too.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd


def _canon_frame(pdf: pd.DataFrame) -> pd.DataFrame:
    """Driver-shaped canonical form: name-sorted columns, all-column row sort."""
    pdf = pdf[sorted(pdf.columns)]
    if len(pdf):
        pdf = pdf.sort_values(list(pdf.columns), kind="mergesort")
    return pdf.reset_index(drop=True)


def compare_frames(sp: pd.DataFrame, dp: pd.DataFrame) -> "list[str]":
    """Return a list of mismatch descriptions (empty = bit-exact match)."""
    probs: list[str] = []
    if len(sp) != len(dp):
        probs.append(f"ROWCOUNT {len(sp)} vs {len(dp)}")
    if sorted(sp.columns) != sorted(dp.columns):
        probs.append(f"SCHEMA {sorted(sp.columns)} vs {sorted(dp.columns)}")
    if probs:
        return probs
    sp, dp = _canon_frame(sp), _canon_frame(dp)
    for c in sp.columns:
        a, b = sp[c], dp[c]
        # integer WIDTH is driver-tolerated (int32 year() vs BIGINT passed the
        # r01 hash); int-vs-float / object is not (HUGEINT → float64/object)
        if a.dtype.kind in "iu":
            a = a.astype("int64")
        if b.dtype.kind in "iu":
            b = b.astype("int64")
        if str(a.dtype) != str(b.dtype):
            probs.append(f"DTYPE {c}: spark={a.dtype} duck={b.dtype}")
            continue
        if a.dtype.kind == "f":
            ok = np.array_equal(a.to_numpy(), b.to_numpy(), equal_nan=True)
        else:
            av, bv = a.to_numpy(), b.to_numpy()
            ok = bool(
                np.all((av == bv) | (pd.isna(av) & pd.isna(bv)))
            ) if len(av) else True
        if not ok:
            bad = [
                (i, a.iloc[i], b.iloc[i])
                for i in range(len(a))
                if not (
                    (pd.isna(a.iloc[i]) and pd.isna(b.iloc[i]))
                    or a.iloc[i] == b.iloc[i]
                )
            ][:3]
            probs.append(f"VALUES {c}: {bad}")
    return probs


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import time

    import duckdb

    import __spark_entry__ as entrymod
    from heliport_spark.plans import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = {**entrymod.queries(), **entrymod.extra_queries()}
    oracles = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sql = oracles.get(name)
        t0 = time.time()
        df = fn(spark, sf_dir)
        sp = df.toPandas()
        dt_spark = time.time() - t0
        if sql is None:
            # rows-only queries still go through the driver canonicalizer:
            # verify every cell is a hashable scalar (VERDICT r01 #2)
            bad_cols = [
                c for c in sp.columns
                if len(sp) and isinstance(sp[c].iloc[0], (list, dict, np.ndarray))
            ]
            if bad_cols:
                failures.append(name)
                print(f"{name}: UNHASHABLE array/map columns {bad_cols}")
            else:
                print(f"{name}: rows-only, {len(sp)} rows ({dt_spark:.1f}s)")
            continue
        t0 = time.time()
        dp = con.execute(sql).df()
        dt_duck = time.time() - t0
        probs = compare_frames(sp, dp)
        if probs:
            failures.append(name)
            print(f"{name}: MISMATCH {' | '.join(probs)}")
        else:
            print(
                f"{name}: OK {len(sp)} rows "
                f"(spark {dt_spark:.1f}s, duck {dt_duck:.1f}s)"
            )
    print("\nFAILED:" if failures else "\nALL OK", failures if failures else "")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
