"""Driver-contract conformance: every oracle query must match DuckDB
BIT-EXACTLY (row count + schema + dtype class + unrounded values), mirroring
the driver's CORRECTNESS value-hash at sf0.01 (see tests/oracle_check.py)."""

import duckdb
import numpy as np
import pytest

import __spark_entry__ as entrymod
from tests.oracle_check import compare_frames

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
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
    sp = _QUERIES[name](spark, SF).toPandas()
    dp = duck.execute(_ORACLES[name]).df()
    assert compare_frames(sp, dp) == []


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark):
    df = _QUERIES[name](spark, SF)
    pdf = df.toPandas()
    assert len(df.schema.fields) > 0
    # the driver canonicalizer sorts/hashes cells — arrays/maps break it
    for c in pdf.columns:
        if len(pdf):
            assert not isinstance(
                pdf[c].iloc[0], (list, dict, np.ndarray)
            ), f"{name}.{c} is not a flat scalar column"


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(20).collect()
    assert len(rows) > 0
    assert {"clip_id", "lang", "confidence", "keep", "scrubbed_text"} <= set(
        df.columns
    )
