"""Driver-contract conformance: every oracle query must match DuckDB exactly
(row count + schema + order-insensitive value multiset), mirroring the
driver's CORRECTNESS check at sf0.01."""

import duckdb
import pytest

import __spark_entry__ as entrymod
from tests.oracle_check import rows_to_multiset

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


_ORACLES = entrymod.oracle_sql()
_QUERIES = entrymod.queries()


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_match(name, spark, duck):
    df = _QUERIES[name](spark, SF)
    spark_rows = df.collect()
    res = duck.execute(_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(df.columns) == sorted(duck_cols)
    assert len(spark_rows) == len(duck_rows)
    assert rows_to_multiset(spark_rows, df.columns) == rows_to_multiset(
        duck_rows, duck_cols
    )


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = _QUERIES[name](spark, SF)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(20).collect()
    assert len(rows) > 0
    assert {"clip_id", "lang", "confidence", "keep", "scrubbed_text"} <= set(
        df.columns
    )
