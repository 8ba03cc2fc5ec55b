"""The correctness gate, self-run: every corpus query vs its DuckDB oracle
at sf0.01 (the driver's t2 scale), exact value comparison."""

from __future__ import annotations

import pytest

from project_crypto_data_engineering_gcp_spark.plans import all_queries

from .conftest import SF_ORACLE, SF_SMOKE
from .oracle_harness import assert_frames_match, run_duckdb

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    df = q.fn(spark, SF_ORACLE)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors driver fallback
        return
    duck = run_duckdb(q.oracle, SF_ORACLE)
    assert_frames_match(df, duck, name)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_at_smoke_sf(spark, name):
    """Every query also runs (rows >= 0, stable schema) at sf0.001."""
    df = QUERIES[name].fn(spark, SF_SMOKE)
    assert df.columns, name
    assert df.count() >= 0


def test_check_window_priority_order():
    """The driver's correctness gate reads ~50 entries in dict order; pin
    that the priority list (a) names only real queries, (b) leads the
    registry, and (c) puts every crypto/TPC-H/curation query inside the
    50-entry window."""
    from project_crypto_data_engineering_gcp_spark.plans.corpus import (
        CHECK_WINDOW_PRIORITY,
    )

    names = list(QUERIES)
    missing = [n for n in CHECK_WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"priority names not in registry: {missing}"
    assert names[: len(CHECK_WINDOW_PRIORITY)] == list(CHECK_WINDOW_PRIORITY)
    window = set(names[:50])
    tpch = {n for n in QUERIES if n.split("_")[0] in {f"q{i}" for i in range(1, 23)}}
    core_curation = {
        "curate_hash_split",
        "curate_quota_per_lang",
        "curate_decontaminate",
        "curate_pack_sequences",
        "curate_quality_cut",
        "curate_mix_sources",
    }
    must_cover = (
        {n for n in QUERIES if n.startswith("crypto_")} | tpch | core_curation
    )
    uncovered = sorted(must_cover - window)
    assert not uncovered, f"outside driver check window: {uncovered}"


def test_no_hugeint_oracle_columns():
    """DuckDB SUM(integer) yields HUGEINT, which the driver's type-sensitive
    value hash treats differently from Spark's bigint (round-1 red rows
    events_sessionized / text_quality_by_lang). Mechanically DESCRIBE every
    oracle and reject HUGEINT output columns — they must be CAST AS BIGINT."""
    import duckdb

    from project_crypto_data_engineering_gcp_spark.sources.tables import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_SMOKE}/{t}.parquet')"
        )
    offenders = {}
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        cols = [
            (c, t)
            for c, t, *_ in con.execute(f"DESCRIBE {q.oracle}").fetchall()
            if t in ("HUGEINT", "UHUGEINT")
        ]
        if cols:
            offenders[name] = cols
    assert not offenders, f"uncast HUGEINT oracle columns: {offenders}"


def test_harness_detects_corruption(spark):
    """Meta-test: the differential harness must actually FAIL on a value,
    row-count, or column-name corruption (guards against a silently-weak
    comparator making every parity test vacuous)."""
    import pandas as pd
    import pytest as _pytest

    from .oracle_harness import assert_frames_match

    df = spark.createDataFrame([(1, 2.5), (2, 3.5)], "k int, v double")
    good = pd.DataFrame({"k": [1, 2], "v": [2.5, 3.5]})
    assert_frames_match(df, good, "sanity")
    with _pytest.raises(AssertionError):
        assert_frames_match(df, good.assign(v=[2.5, 3.500001]), "value")
    with _pytest.raises(AssertionError):
        assert_frames_match(df, good.iloc[:1], "rows")
    with _pytest.raises(AssertionError):
        assert_frames_match(df, good.rename(columns={"v": "w"}), "cols")
