from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from project_crypto_data_engineering_gcp_spark.session import get_spark  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"

# The stream/tx suites run in a FRESH child JVM driven by
# tests/test_aa_stream_tx_chunk.py (r13, r12 VERDICT item 2): the
# environment kills any single JVM at ~26-32 min (SCALE.md
# "~30-minute single-process ceiling"), and one process running the
# whole suite crosses it — r11/r12's driver verify died at ~94% with
# the shared SparkContext shut down mid-stream-fuzz. Splitting the
# ~12-14 min stream/tx group into a subprocess keeps BOTH JVMs under
# the ceiling while `pytest tests/` remains ONE pytest process. The
# group below is exactly the r12 chunk that was re-run in a fresh
# process (50 tests, all stateful-streaming / txlog / Python-worker
# heavy). Inside the child (env guard) the files collect normally.
STREAM_TX_CHILD_FILES = (
    "test_streaming.py",
    "test_stateful_streaming.py",
    "test_stream_txn_fuzz.py",
    "test_tx_table.py",
    "test_udtf_chunker.py",
)
_CHILD_ENV = "SPARK_GRAFT_STREAM_TX_CHILD"


def pytest_collection_modifyitems(config, items):
    if os.environ.get(_CHILD_ENV):
        return
    keep, moved = [], []
    for item in items:
        if os.path.basename(str(item.fspath)) in STREAM_TX_CHILD_FILES:
            moved.append(item)
        else:
            keep.append(item)
    if moved:
        items[:] = keep
        config.hook.pytest_deselected(items=moved)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("spark_graft_tests", shuffle_partitions=8)
    yield s
    s.stop()
