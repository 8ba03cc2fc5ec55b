"""Quirk Q7 property test (r9 verdict task 7): the reference dashboard
joins its gold tables on (symbol, data_referencia) — and symbol is NOT
unique (reference `5-sql:33-42`; real CoinCap data carries duplicate
tickers). Two distinct assets sharing a symbol therefore FAN OUT: each
overview row for the symbol left-joins every supply/dominance/mover row
for it, multiplying rows and cross-contaminating per-asset metrics
(asset A's row surfaces asset B's percent_market_cap and vice versa).

We preserve the reference's join-on-symbol semantics verbatim (quirk
doc, SURVEY §2.11 Q7) rather than "fixing" it to join on id — so this
test pins the documented behavior two ways:

  1. differentially — Spark pipeline vs the DuckDB oracle over the SAME
     forged-collision silver, bit-exact (the fuzz-style gate), and
  2. analytically — the collision symbol's row count is exactly the
     product of the per-table match counts, and both assets' dominance
     values appear under BOTH asset ids (the cross-contamination).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from project_crypto_data_engineering_gcp_spark.fixtures import silver_rows
from project_crypto_data_engineering_gcp_spark.plans import crypto_pipeline as cp
from project_crypto_data_engineering_gcp_spark.plans.queries_crypto import (
    ANALYSIS_AT,
    PROCESSED_AT,
    _SILVER_PARQUET,
)
import duckdb

from tests.oracle_harness import assert_frames_match

_SCHEMA = pa.schema(
    [
        ("id", pa.string()),
        ("rank", pa.int32()),
        ("symbol", pa.string()),
        ("name", pa.string()),
        ("supply", pa.float64()),
        ("max_supply", pa.float64()),
        ("market_cap_usd", pa.float64()),
        ("volume_usd_24hr", pa.float64()),
        ("price_usd", pa.float64()),
        ("change_percent_24hr", pa.float64()),
        ("vwap_24hr", pa.float64()),
        ("explorer", pa.string()),
        ("data_referencia", pa.string()),
        ("data_processamento", pa.string()),
    ]
)


@pytest.fixture(scope="module")
def forged(tmp_path_factory):
    """Silver replica with ONE forged symbol collision: the asset with
    the second id adopts the first id's symbol across every snapshot."""
    rows = silver_rows(PROCESSED_AT)
    ids = sorted({r["id"] for r in rows})
    a, b = ids[0], ids[1]
    sym = next(r["symbol"] for r in rows if r["id"] == a)
    for r in rows:
        if r["id"] == b:
            r["symbol"] = sym
    path = str(tmp_path_factory.mktemp("q7") / "silver_forged.parquet")
    cols = {k: [r[k] for r in rows] for k in rows[0]}
    pq.write_table(pa.table(cols, schema=_SCHEMA), path)
    return path, a, b, sym


def _spark_dashboard(spark, silver_parquet: str):
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    silver = spark.read.parquet(silver_parquet)
    latest = cp.latest_assets(silver, cache=False)
    gold = {
        "daily_overview": cp.daily_overview(latest, ANALYSIS_AT),
        "top_gainers_losers": cp.top_gainers_losers(latest, analysis_at=ANALYSIS_AT),
        "market_dominance": cp.market_dominance(latest, ANALYSIS_AT),
        "supply_dynamics": cp.supply_dynamics(latest, ANALYSIS_AT),
    }
    return cp.dashboard(spark, gold)


def test_q7_collision_matches_oracle(spark, forged):
    """Spark and DuckDB agree bit-exactly on the fanned-out dashboard —
    the oracle is the registered crypto_dashboard SQL retargeted at the
    forged silver (identical input bytes for both engines)."""
    import __spark_entry__ as entrymod

    path, *_ = forged
    oracle = entrymod.oracle_sql()["crypto_dashboard"].replace(
        _SILVER_PARQUET, path
    )
    assert path in oracle  # the registered oracle still reads the replica
    con = duckdb.connect()
    try:
        duck = con.execute(oracle).df()
    finally:
        con.close()
    assert_frames_match(
        _spark_dashboard(spark, path), duck, "q7_symbol_collision_dashboard"
    )


def test_q7_fanout_and_cross_contamination(spark, forged):
    """The collision's row count is the LEFT-join product of per-table
    match counts, and each colliding asset's row carries the OTHER
    asset's dominance values too."""
    path, a, b, sym = forged
    dash = _spark_dashboard(spark, path).cache()
    try:
        rows = dash.where(f"symbol = '{sym}'").collect()
        n_ov = 2  # both assets survive `latest` (partitioned by id)
        n_sd = n_md = 2  # supply/dominance are per-latest-row views
        n_tg = len(
            {
                (r["name"], r["tipo_movimento"])
                for r in rows
                if r["tipo_movimento"] is not None
            }
        )
        expected = n_ov * n_sd * n_md * max(n_tg, 1)
        assert len(rows) == expected, (
            f"Q7 fan-out drifted: {len(rows)} rows for collided symbol "
            f"{sym!r}, expected {n_ov}x{n_sd}x{n_md}x{max(n_tg, 1)}"
        )
        # cross-contamination: under EACH id, both dominance values occur
        pcts_by_id = {
            i: {r["percent_market_cap"] for r in rows if r["id"] == i}
            for i in (a, b)
        }
        assert pcts_by_id[a] == pcts_by_id[b] and len(pcts_by_id[a]) == 2
        # non-collided symbols stay 1:1 — exactly one row each
        other = dash.where(f"symbol <> '{sym}'")
        assert other.count() == other.select("id").distinct().count()
    finally:
        dash.unpersist()
