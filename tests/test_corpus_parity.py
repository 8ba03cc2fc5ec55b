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
    """The driver's correctness gate reads ~50 entries in dict order; the
    window ROTATES per round so every query accumulates a driver row. Pin
    that the priority list (a) names only real queries, (b) leads the
    registry, and (c) every registered query with no green row in ANY
    recorded CORRECTNESS_r*.json sits inside the 50-entry window — i.e.
    after this round's check, cumulative coverage is total."""
    import glob
    import json
    import os

    from project_crypto_data_engineering_gcp_spark.plans.corpus import (
        CHECK_WINDOW_PRIORITY,
    )

    names = list(QUERIES)
    missing = [n for n in CHECK_WINDOW_PRIORITY if n not in QUERIES]
    assert not missing, f"priority names not in registry: {missing}"
    assert names[: len(CHECK_WINDOW_PRIORITY)] == list(CHECK_WINDOW_PRIORITY)
    # the sanctioned never-checked set = the 50-entry window plus the
    # explicit rollover queue (priority entries 51+, first in line for
    # the next round's window — see the ROLLOVER comment in corpus.py)
    window = set(names[: max(50, len(CHECK_WINDOW_PRIORITY))])

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for path in glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json")):
        with open(path) as f:
            checked.update(json.load(f))
    never_checked = {n for n in QUERIES if n not in checked}
    uncovered = sorted(never_checked - window)
    assert not uncovered, f"never driver-checked AND outside window: {uncovered}"


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
