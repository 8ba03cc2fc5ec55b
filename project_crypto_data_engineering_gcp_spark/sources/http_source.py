"""HTTP REST ingest (reference S1): fetch a market snapshot and land it.

The reference's Cloud Run function (`1-cloud_function_get_data.py:34-69`)
GETs the CoinCap assets endpoint with bearer auth and uploads the JSON to
object storage. Here the fetcher is injectable (the test/CI environment
has no network egress): production passes a ``requests``-backed callable,
tests pass a fixture loader — everything after the fetch (validation,
replay-stable naming, landing) is identical and covered by tests.

Ingest is driver-side by design: one ~65 KB document per call (SURVEY
§6), nothing to distribute. The SCALE path is many snapshots over time,
which the landing directory + streaming file source already handle.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from .json_source import write_raw_snapshot

Fetcher = Callable[[], dict]


def default_fetcher(
    url: str = "https://rest.coincap.io/v3/assets",
    api_key: str | None = None,
) -> Fetcher:
    """Production fetcher over ``requests`` (import-gated: the library and
    network may be absent in hermetic environments)."""

    def fetch() -> dict:
        try:
            import requests  # noqa: PLC0415
        except ImportError as e:  # pragma: no cover - env without requests
            raise RuntimeError("requests not available in this environment") from e
        headers = {"Authorization": f"Bearer {api_key}"} if api_key else {}
        resp = requests.get(url, headers=headers, timeout=30)
        resp.raise_for_status()
        return resp.json()

    return fetch


def ingest_snapshot(fetch: Fetcher, landing_dir: str) -> str:
    """Fetch one snapshot, validate the envelope, land it with the
    replay-stable payload-timestamp name (quirk Q8). Returns the path."""
    payload = fetch()
    if not isinstance(payload, dict) or "data" not in payload or "timestamp" not in payload:
        raise ValueError(
            f"malformed snapshot envelope: keys={sorted(payload) if isinstance(payload, dict) else type(payload)}"
        )
    if not isinstance(payload["data"], list):
        raise ValueError("snapshot 'data' must be a list of assets")
    return write_raw_snapshot(payload, landing_dir)


def fixture_fetcher(path: str) -> Fetcher:
    """Test fetcher replaying a stored payload document."""

    def fetch() -> dict:
        with open(path, encoding="utf-8") as f:
            return json.load(f)

    return fetch
