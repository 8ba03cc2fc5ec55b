"""Test-side re-export of the package's deterministic crypto fixture
(moved to project_crypto_data_engineering_gcp_spark.fixtures so the
driver-checked crypto corpus queries can share it)."""

from __future__ import annotations

from project_crypto_data_engineering_gcp_spark.fixtures import (  # noqa: F401
    N_ASSETS,
    SNAPSHOT_TS_MS,
    snapshot_payload,
    write_fixture_landing,
)

__test__ = False
