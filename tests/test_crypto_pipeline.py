"""Crypto medallion pipeline tests: golden-replay of the fixture payloads
(FIXTURES.md §A) + DuckDB differential oracles for every Gold table +
quirk decisions (SURVEY §2.11) + ledger idempotency e2e."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.plans.crypto_pipeline import (
    bronze_to_silver,
    daily_overview,
    dashboard,
    latest_assets,
    market_dominance,
    supply_dynamics,
    top_gainers_losers,
)
from project_crypto_data_engineering_gcp_spark.plans.runner import (
    run_dashboard,
    run_gold,
    run_pipeline,
    run_silver,
)
from project_crypto_data_engineering_gcp_spark.sources.json_source import read_raw_json

from .fixtures_crypto import N_ASSETS, SNAPSHOT_TS_MS, write_fixture_landing
from .oracle_harness import assert_frames_match

ANALYSIS_AT = "2026-01-01 00:00:00"
PROCESSED_AT = "2026-01-01 00:00:00"


@pytest.fixture(scope="module")
def landing(tmp_path_factory):
    d = tmp_path_factory.mktemp("landing")
    write_fixture_landing(str(d))
    return str(d)


@pytest.fixture(scope="module")
def silver(spark, landing):
    raw = read_raw_json(spark, f"{landing}/coincap_data_*.json")
    return bronze_to_silver(raw, processed_at=PROCESSED_AT).drop("_source_file").cache()


@pytest.fixture(scope="module")
def silver_duck(spark, silver, tmp_path_factory):
    """Silver written to parquet and registered in DuckDB — the oracle
    input for the Gold differential tests."""
    path = str(tmp_path_factory.mktemp("silver_pq") / "assets")
    silver.drop("tokens").write.mode("overwrite").parquet(path)
    return path


def _duck(silver_path: str, sql: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW silver AS SELECT * FROM "
        f"read_parquet('{silver_path}/*.parquet')"
    )
    con.execute(
        """CREATE VIEW latest AS
           SELECT * EXCLUDE (data_referencia),
                  CAST(data_referencia AS TIMESTAMP) AS data_referencia
           FROM silver
           QUALIFY ROW_NUMBER() OVER (
               PARTITION BY id ORDER BY CAST(data_referencia AS TIMESTAMP) DESC) = 1"""
    )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


# ---------------------------------------------------------------- silver


def test_silver_schema_and_counts(silver):
    assert silver.count() == N_ASSETS * len(SNAPSHOT_TS_MS)
    types = dict(silver.dtypes)
    assert types["rank"] == "int"
    assert types["supply"] == "double"
    assert types["data_referencia"] == "string"  # quirk Q3
    assert types["tokens"] == "map<string,array<string>>"  # superset: kept
    # null propagation per fixture rates
    assert silver.filter(F.col("max_supply").isNull()).count() > 0
    assert silver.filter(F.col("explorer").isNull()).count() > 0


def test_latest_assets_is_argmax(spark, silver, silver_duck):
    latest = latest_assets(silver, cache=False).drop("tokens")
    duck = _duck(silver_duck, "SELECT * FROM latest")
    assert_frames_match(latest, duck, "latest_assets")


# ---------------------------------------------------------------- gold


def test_daily_overview(silver, silver_duck):
    got = daily_overview(latest_assets(silver, cache=False), ANALYSIS_AT)
    duck = _duck(
        silver_duck,
        f"""
        SELECT id, name, symbol, rank,
               ROUND(price_usd, 8) AS price_usd,
               ROUND(market_cap_usd, 2) AS market_cap_usd,
               ROUND(volume_usd_24hr, 2) AS volume_usd_24hr,
               ROUND(change_percent_24hr, 4) AS change_percent_24hr,
               ROUND(vwap_24hr, 8) AS vwap_24hr,
               ROUND(supply, 0) AS supply,
               ROUND(max_supply, 0) AS max_supply,
               explorer, data_referencia,
               TIMESTAMP '{ANALYSIS_AT}' AS data_processamento_analise
        FROM latest
        """,
    )
    assert_frames_match(got, duck, "daily_overview")


def test_top_gainers_losers(silver, silver_duck):
    got = top_gainers_losers(latest_assets(silver, cache=False), analysis_at=ANALYSIS_AT)
    duck = _duck(
        silver_duck,
        f"""
        WITH base AS (SELECT * FROM latest WHERE change_percent_24hr IS NOT NULL),
        g AS (SELECT name, symbol, change_percent_24hr, price_usd, data_referencia,
                     'Ganhador' AS tipo_movimento
              FROM base ORDER BY change_percent_24hr DESC, id LIMIT 10),
        p AS (SELECT name, symbol, change_percent_24hr, price_usd, data_referencia,
                     'Perdedor' AS tipo_movimento
              FROM base ORDER BY change_percent_24hr ASC, id LIMIT 10)
        SELECT name, symbol,
               ROUND(change_percent_24hr, 4) AS change_percent_24hr,
               ROUND(price_usd, 8) AS price_usd,
               tipo_movimento, data_referencia,
               TIMESTAMP '{ANALYSIS_AT}' AS data_processamento_analise
        FROM (SELECT * FROM g UNION ALL SELECT * FROM p) u
        """,
    )
    assert_frames_match(got, duck, "top_gainers_losers")


def test_market_dominance(silver, silver_duck):
    got = market_dominance(latest_assets(silver, cache=False), ANALYSIS_AT)
    duck = _duck(
        silver_duck,
        f"""
        WITH base AS (SELECT * FROM latest WHERE market_cap_usd IS NOT NULL),
        tot AS (SELECT SUM(market_cap_usd) AS total FROM base)
        SELECT name, symbol,
               ROUND(market_cap_usd, 2) AS market_cap_usd,
               ROUND(market_cap_usd / total * 100, 4) AS percent_market_cap,
               data_referencia,
               TIMESTAMP '{ANALYSIS_AT}' AS data_processamento_analise
        FROM base, tot
        """,
    )
    assert_frames_match(got, duck, "market_dominance")


def test_supply_dynamics(silver, silver_duck):
    got = supply_dynamics(latest_assets(silver, cache=False), ANALYSIS_AT)
    duck = _duck(
        silver_duck,
        f"""
        SELECT name, symbol,
               ROUND(supply, 0) AS supply,
               ROUND(max_supply, 0) AS max_supply,
               ROUND(market_cap_usd / supply, 8) AS market_cap_per_unit_supply,
               CASE WHEN max_supply IS NULL THEN 'Não Definido'
                    WHEN supply >= max_supply THEN 'Próximo do Limite'
                    ELSE 'Disponível' END AS status_oferta_maxima,
               data_referencia,
               TIMESTAMP '{ANALYSIS_AT}' AS data_processamento_analise
        FROM latest
        WHERE supply IS NOT NULL AND supply > 0 AND market_cap_usd IS NOT NULL
        """,
    )
    assert_frames_match(got, duck, "supply_dynamics")
    # planted asset 5 hits the 'Próximo do Limite' branch
    rows = got.filter(F.col("symbol") == "SYM005").collect()
    assert rows and rows[0]["status_oferta_maxima"] == "Próximo do Limite"


def test_supply_round_keeps_double(silver):
    # quirk Q2: round(supply, 0) stays DoubleType
    got = supply_dynamics(latest_assets(silver, cache=False), ANALYSIS_AT)
    assert dict(got.dtypes)["supply"] == "double"


def test_gainers_losers_q1_history_mode(silver):
    # quirk Q1 reproduction: losers drawn from FULL history can repeat ids
    latest = latest_assets(silver, cache=False)
    got = top_gainers_losers(
        latest, full_history=silver, analysis_at=ANALYSIS_AT,
        losers_over_history=True,
    )
    losers = got.filter(F.col("tipo_movimento") == "Perdedor")
    assert losers.count() == 10
    # with 3 snapshots the worst asset appears once per snapshot in history
    top_loser_names = [r["name"] for r in losers.collect()]
    assert len(set(top_loser_names)) < 10


# ---------------------------------------------------------------- dashboard


def test_dashboard(spark, silver, silver_duck):
    latest = latest_assets(silver, cache=False)
    gold = {
        "daily_overview": daily_overview(latest, ANALYSIS_AT),
        "top_gainers_losers": top_gainers_losers(latest, analysis_at=ANALYSIS_AT),
        "market_dominance": market_dominance(latest, ANALYSIS_AT),
        "supply_dynamics": supply_dynamics(latest, ANALYSIS_AT),
    }
    got = dashboard(spark, gold)
    # all assets of the latest snapshot, enriched; row count preserved
    # (tipo_movimento null for non-movers — LEFT JOIN semantics)
    assert got.count() == N_ASSETS
    movers = got.filter(F.col("tipo_movimento").isNotNull()).count()
    assert movers == 20
    assert got.filter(F.col("percent_market_cap").isNull()).count() == 0


# ---------------------------------------------------------------- runner e2e


def test_pipeline_e2e_and_ledger_idempotency(spark, landing, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    dash1 = run_pipeline(
        spark, f"{landing}/coincap_data_*.json", out,
        processed_at=PROCESSED_AT, analysis_at=ANALYSIS_AT,
    )
    assert dash1.count() == N_ASSETS

    from project_crypto_data_engineering_gcp_spark.plans.runner import (
        read_gold_history,
        read_silver,
    )

    silver_rows = read_silver(spark, out).count()
    assert silver_rows == N_ASSETS * len(SNAPSHOT_TS_MS)

    # re-run: ledger makes silver append a no-op (exactly-once)
    appended = run_silver(spark, f"{landing}/coincap_data_*.json", out)
    assert appended == 0
    assert read_silver(spark, out).count() == silver_rows

    # silver is partitioned by snapshot date inside the txlog staging
    # dirs (scale: partition pruning through the manifest read)
    data_root = os.path.join(out, "silver", "assets", "data")
    parts = {
        p
        for stage in os.listdir(data_root)
        for p in os.listdir(os.path.join(data_root, stage))
        if p.startswith("dt=")
    }
    assert parts, "expected dt= hive partitions inside staging dirs"
    # ... and the append-history sinks are transactional (S5): a commit
    # log exists for silver, NOT for the overwrite serving copies
    assert os.path.isdir(os.path.join(out, "silver", "assets", "_txlog"))

    # gold dual-sink: serving overwritten, history appended (quirk Q4)
    run_gold(spark, out, analysis_at=ANALYSIS_AT)
    hist = read_gold_history(spark, out, "daily_overview")
    serv = spark.read.parquet(os.path.join(out, "gold", "serving", "daily_overview"))
    assert not os.path.isdir(
        os.path.join(out, "gold", "serving", "daily_overview", "_txlog")
    )
    assert hist.count() == 2 * serv.count()
    assert run_dashboard(spark, out).count() == N_ASSETS


def test_http_ingest_with_fixture_fetcher(spark, tmp_path):
    """S1 HTTP source parity: injectable fetcher -> validation ->
    replay-stable landing -> full pipeline consumes it."""
    import json

    from project_crypto_data_engineering_gcp_spark.sources.http_source import (
        fixture_fetcher,
        ingest_snapshot,
    )

    from .fixtures_crypto import snapshot_payload

    doc = tmp_path / "payload.json"
    doc.write_text(json.dumps(snapshot_payload(0)))
    landing = tmp_path / "landing_http"
    path = ingest_snapshot(fixture_fetcher(str(doc)), str(landing))
    assert path.endswith(".json") and "coincap_data_" in path
    # replay-stable: re-ingesting the same payload overwrites, not duplicates
    assert ingest_snapshot(fixture_fetcher(str(doc)), str(landing)) == path
    assert len(list(landing.iterdir())) == 1

    import pytest as _pytest

    with _pytest.raises(ValueError, match="malformed"):
        ingest_snapshot(lambda: {"nope": 1}, str(landing))


def test_corrupt_json_quarantined_not_fatal(spark, tmp_path):
    """One malformed landing document must not wedge ingestion: valid
    snapshots flow to Silver, the bad one shows up in the quarantine view."""
    from project_crypto_data_engineering_gcp_spark.sources.json_source import (
        read_corrupt_json,
    )

    landing = tmp_path / "landing_bad"
    write_fixture_landing(str(landing), n_snapshots=2)
    (landing / "coincap_data_99990101_000000.json").write_text("{ not json !!!")

    glob = f"{landing}/coincap_data_*.json"
    silver = bronze_to_silver(
        read_raw_json(spark, glob), processed_at=PROCESSED_AT
    )
    assert silver.count() == N_ASSETS * 2
    bad = read_corrupt_json(spark, glob).collect()
    assert len(bad) == 1 and "99990101" in bad[0]["_source_file"]


def test_gold_history_schema_evolution(spark, landing, tmp_path):
    """Reference S7 semantics: an evolved gold table (new column) appends
    to history, and the merged-schema read surfaces the union schema with
    NULLs for pre-evolution rows."""
    from project_crypto_data_engineering_gcp_spark.plans.runner import (
        read_gold_history,
        run_gold,
        run_silver,
    )

    out = str(tmp_path / "out_evo")
    run_silver(spark, f"{landing}/coincap_data_*.json", out, processed_at=PROCESSED_AT)
    run_gold(spark, out, analysis_at=ANALYSIS_AT)

    # simulate evolution: append a batch carrying an extra column
    # through the transactional history sink (reference S7: Delta's
    # mergeSchema-at-write; txlog resolves the union schema at read)
    from project_crypto_data_engineering_gcp_spark.sources.sinks import write_history

    evolved = (
        read_gold_history(spark, out, "daily_overview")
        .withColumn("risk_score", F.round(F.col("rank") * 0.1, 4))
    )
    write_history(
        evolved,
        str(tmp_path / "out_evo" / "gold" / "history" / "daily_overview"),
        merge_schema=True,
    )

    merged = read_gold_history(spark, out, "daily_overview")
    assert "risk_score" in merged.columns
    assert merged.filter(F.col("risk_score").isNull()).count() == N_ASSETS
    assert merged.filter(F.col("risk_score").isNotNull()).count() == N_ASSETS
