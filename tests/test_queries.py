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


_ORACLES = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
_QUERIES = {**entrymod.queries(), **entrymod.extra_queries()}


def test_every_oracle_has_a_query():
    assert set(_ORACLES) <= set(_QUERIES)


def test_driver_registry_at_cap():
    """The driver's correctness pass covers only the first 50 registered
    queries (VERDICT r04 #2): the registry must sit exactly at the cap so
    nothing silently falls off, with the overflow parked in extra_queries."""
    assert len(entrymod.queries()) == 50
    assert set(entrymod.extra_queries()).isdisjoint(entrymod.queries())
    # every extra oracle has an extra query; rows-only extras (the four
    # standalone audio-prep queries whose chained form is the registered
    # audio_suite entry) carry no SQL twin
    assert set(entrymod.extra_oracle_sql()) <= set(entrymod.extra_queries())


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


_CAP_ORACLES = [
    n for n in (
        "dedup_minhash_lsh",
        "simhash_pairs",
        "dedup_minhash_estimate",
        "dedup_materialize",
    ) if n in _ORACLES
]


@pytest.mark.parametrize("name", _CAP_ORACLES)
def test_oracle_match_in_overflow_regime(name, spark, tmp_path_factory):
    """The MAX_BUCKET cap's DuckDB mirror (row_number + representative-link
    UNION) is only meaningful ABOVE the cap — and sf0.01 never overflows a
    bucket, so the driver's green rows exercise only the identity regime.
    This fixture piles 350 exact-dup docs (> MAX_BUCKET=256) into one
    bucket plus 150 distinct docs and re-runs the full Spark-vs-DuckDB
    comparison there."""
    import shutil as sh

    base = tmp_path_factory.mktemp("overflow_sf")
    for t in entrymod.TABLES:
        sh.copy(f"{SF}/{t}.parquet", base / f"{t}.parquet")
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, dup, "eng", "synth", len(dup)) for i in range(350)] + [
        (
            350 + j,
            f"distinct document number {j} with some variable words "
            f"{'x' * (j % 7)} {j * 17} content tail",
            "eng",
            "synth",
            40,
        )
        for j in range(150)
    ]
    spark.createDataFrame(
        rows, "doc_id: long, text: string, lang: string, source: string, n_chars: long"
    ).coalesce(1).write.mode("overwrite").parquet(str(base / "documents.parquet"))
    con = duckdb.connect()
    try:
        con.execute("SET TimeZone='UTC'")
        for t in entrymod.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{base}/{t}.parquet/*.parquet')"
                if t == "documents"
                else f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{base}/{t}.parquet')"
            )
        sp = _QUERIES[name](spark, str(base)).toPandas()
        dp = con.execute(_ORACLES[name]).df()
        assert compare_frames(sp, dp) == []
        assert len(sp) > 0
    finally:
        con.close()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.limit(20).collect()
    assert len(rows) > 0
    assert {"clip_id", "lang", "confidence", "keep", "scrubbed_text"} <= set(
        df.columns
    )


def test_token_oracles_blank_doc_parity(spark, tmp_path):
    """Latent-divergence guard: DuckDB string_split_regex('') returns ['']
    while Spark's words_expr maps blank text to no tokens — the token-based
    oracles carry an explicit blank-doc filter so BOTH sides emit nothing
    for empty/whitespace-only documents (review r3: word_counts/ngram_probs/
    posting_lists/char_trigrams previously lacked the guard)."""
    import duckdb

    rows = [
        (1, "hello world hello", "en", "s", 17),
        (2, "", "en", "s", 0),
        (3, " \n\t ", "de", "s", 4),
        (4, "welt hello", "de", "s", 10),
    ]
    import pandas as pd

    sf = str(tmp_path)
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(f"{sf}/documents.parquet")  # single FILE (like the driver fixtures)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    for name in ("word_counts", "char_trigrams", "ngram_probs", "posting_lists"):
        sp = _QUERIES[name](spark, sf).toPandas()
        dp = con.execute(_ORACLES[name]).df()
        assert compare_frames(sp, dp) == [], name
        # and no empty-string gram leaked through either side
        if "gram" in sp.columns:
            assert not (sp["gram"] == "").any(), name
    con.close()
