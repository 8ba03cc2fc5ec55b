"""Deterministic crypto-shaped demo data (FIXTURES.md §A1).

Synthesizes CoinCap-style snapshot payloads with the reference sample's
measured null rates and planted edge cases: >=3 distinct snapshot
timestamps (exercises the latest-snapshot window), >=10-asset positive
and negative changePercent tails (top-K), one asset at supply >=
maxSupply, nulls for maxSupply / vwap24Hr / explorer, and a tokens map
(dropped by the reference, kept by this engine). Pure arithmetic — no
RNG — so every run, every engine, and the pure-Python oracle replica see
identical values.

Used by tests (golden replay) and by plans/queries_crypto.py (the
driver-checked crypto corpus queries).
"""

from __future__ import annotations

from datetime import datetime, timezone

N_ASSETS = 40
SNAPSHOT_TS_MS = (1748056129137, 1748059729137, 1748063329137)  # 1h apart


def _asset(i: int, snap: int) -> dict:
    # deterministic pseudo-values; drift by snapshot index so latest != first
    price = round(10000.0 / (i + 1) + snap * (1.0 + i % 7), 8)
    supply = float(1_000_000 + i * 57_123)
    max_supply = None if i % 2 == 0 else float(2_000_000 + i * 57_123)
    if i == 5:  # planted: supply >= maxSupply -> "Próximo do Limite"
        max_supply = supply
    change = round(((-1) ** i) * (i * 0.37 + snap * 0.11), 10)
    return {
        "id": f"asset-{i:03d}",
        "rank": str(i + 1),
        "symbol": f"SYM{i:03d}",
        "name": f"Asset {i:03d}",
        "supply": f"{supply:.16f}",
        "maxSupply": None if max_supply is None else f"{max_supply:.16f}",
        "marketCapUsd": f"{price * supply:.16f}",
        "volumeUsd24Hr": f"{price * supply / 20:.16f}",
        "priceUsd": f"{price:.16f}",
        "changePercent24Hr": f"{change:.16f}",
        "vwap24Hr": None if i % 16 == 3 else f"{price * 0.99:.16f}",
        "explorer": None if i % 8 == 2 else f"https://example.org/{i:03d}",
        "tokens": {"1": [f"0x{i:040x}"], "56": []} if i % 3 == 0 else None,
    }


def snapshot_payload(snap_idx: int) -> dict:
    return {
        "data": [_asset(i, snap_idx) for i in range(N_ASSETS)],
        "timestamp": SNAPSHOT_TS_MS[snap_idx],
    }


def write_fixture_landing(landing_dir: str, n_snapshots: int = 3) -> list[str]:
    from .sources.json_source import write_raw_snapshot

    return [
        write_raw_snapshot(snapshot_payload(s), landing_dir)
        for s in range(n_snapshots)
    ]


def silver_rows(processed_at: str) -> list[dict]:
    """Pure-Python replica of the Bronze->Silver transform
    (plans/crypto_pipeline.bronze_to_silver, sans tokens): the oracle-side
    ground truth. float(decimal-string) and Spark's string->double cast
    are both correctly-rounded IEEE, so values are bit-identical."""
    rows = []
    for snap_idx, ts_ms in enumerate(SNAPSHOT_TS_MS):
        data_ref = datetime.fromtimestamp(ts_ms // 1000, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )
        for a in snapshot_payload(snap_idx)["data"]:
            rows.append(
                {
                    "id": a["id"],
                    "rank": int(a["rank"]),
                    "symbol": a["symbol"],
                    "name": a["name"],
                    "supply": float(a["supply"]),
                    "max_supply": None if a["maxSupply"] is None else float(a["maxSupply"]),
                    "market_cap_usd": float(a["marketCapUsd"]),
                    "volume_usd_24hr": float(a["volumeUsd24Hr"]),
                    "price_usd": float(a["priceUsd"]),
                    "change_percent_24hr": float(a["changePercent24Hr"]),
                    "vwap_24hr": None if a["vwap24Hr"] is None else float(a["vwap24Hr"]),
                    "explorer": a["explorer"],
                    "data_referencia": data_ref,
                    "data_processamento": processed_at,
                }
            )
    return rows
