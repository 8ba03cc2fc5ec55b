"""Contract test for the Delta txnAppId/txnVersion branch of
``write_history`` — WITHOUT delta-spark on the classpath.

The r9 high-severity ADVICE bug (hash-derived txnVersions under one
appId silently dropping ~half of all new batches) lived exactly in the
``history_format()=='delta'`` branch, which this sandbox never
executes: delta-spark isn't installed, so every pipeline test runs the
txlog fallback and the (appId, version) pairs the runner hands to
Delta were never checked against Delta's OWN skip semantics.

This module closes that class at the contract level: a fake history
store applies Delta's documented idempotent-writes rule — an
application-transactional write is SKIPPED iff its txnVersion is <=
the last recorded version for that txnAppId on that table (Delta
`OptimisticTransaction.txnVersion` semantics, public docs
"Idempotent writes in foreachBatch") — and the real ``run_silver`` /
streaming epoch sequences run against it. If the runner's batch-
identity scheme regresses to anything Delta would mis-skip (or
mis-apply), these tests go red without needing the package.

Reference parity: the reference appends Silver/Gold history as Delta
(`2-spark_coincap_raw_to_silver.py:65`, `3-spark_curated_analytics_full.py:86-90`);
exactly-once across crash/replay is our superset hardening of S5/S9.
"""

from __future__ import annotations

import os

import pytest

from project_crypto_data_engineering_gcp_spark.fixtures import (
    N_ASSETS,
    snapshot_payload,
    write_fixture_landing,
)
from project_crypto_data_engineering_gcp_spark.plans import runner
from project_crypto_data_engineering_gcp_spark.sources.json_source import (
    write_raw_snapshot,
)

PROCESSED_AT = "2024-01-02 03:04:05"


class FakeDeltaHistoryStore:
    """In-memory stand-in for a set of Delta tables that implements the
    txnAppId/txnVersion skip rule EXACTLY as Delta documents it:

      for a write carrying (appId, version), if the table has already
      committed a transaction for that appId with recorded version
      >= this version, the write is a silent no-op; otherwise the
      rows append and the (appId -> version) watermark advances.

    Writes without ``txn`` always append (plain Delta append).
    """

    def __init__(self) -> None:
        self.rows: dict[str, list[dict]] = {}
        self.txns: dict[tuple[str, str], int] = {}
        self.applied: list[tuple[str, str, int]] = []
        self.skipped: list[tuple[str, str, int]] = []

    # signature mirrors sources.sinks.write_history
    def write_history(
        self,
        df,
        path: str,
        *,
        partition_by=None,
        merge_schema: bool = False,
        txn: tuple[str, int] | None = None,
    ) -> None:
        if txn is not None:
            app_id, version = txn
            last = self.txns.get((path, app_id))
            if last is not None and version <= last:
                self.skipped.append((path, app_id, version))
                return
            self.txns[(path, app_id)] = version
            self.applied.append((path, app_id, version))
        self.rows.setdefault(path, []).extend(
            r.asDict() for r in df.collect()
        )

    def count(self, path: str) -> int:
        return len(self.rows.get(path, []))


def test_fake_store_matches_delta_skip_rule(spark):
    """The fake itself implements <=, not ==: a LOWER version after a
    higher one must also skip (that ordering is exactly what the old
    hash-derived-version scheme produced)."""
    store = FakeDeltaHistoryStore()
    df = spark.range(3)
    store.write_history(df, "t", txn=("app", 5))
    store.write_history(df, "t", txn=("app", 5))  # exact replay: skip
    store.write_history(df, "t", txn=("app", 2))  # lower: skip (<= rule)
    store.write_history(df, "t", txn=("app", 6))  # higher: apply
    store.write_history(df, "t", txn=("other", 0))  # fresh appId: apply
    store.write_history(df, "t")  # no txn: plain append
    assert store.count("t") == 4 * 3
    assert [v for (_, a, v) in store.applied if a == "app"] == [5, 6]
    assert [(a, v) for (_, a, v) in store.skipped] == [("app", 5), ("app", 2)]


@pytest.fixture()
def fake_store(monkeypatch):
    store = FakeDeltaHistoryStore()
    monkeypatch.setattr(runner, "write_history", store.write_history)
    return store


def _landing(tmp_path_factory, n_snapshots=2) -> str:
    landing = str(tmp_path_factory.mktemp("landing"))
    write_fixture_landing(landing, n_snapshots=n_snapshots)
    return landing


def test_run_silver_crash_replay_is_exactly_once(
    spark, tmp_path_factory, fake_store, monkeypatch
):
    """Crash between the history commit and the ledger record, then
    rerun: the rerun re-reads the SAME unledgered files, producing the
    identical batch digest — under Delta's rule that is an exact
    (appId, 0) repeat and must be skipped, leaving each row exactly
    once. This is the precise sequence the r9 ADVICE bug corrupted."""
    landing = _landing(tmp_path_factory)
    out = str(tmp_path_factory.mktemp("out"))
    glob = f"{landing}/coincap_data_*.json"
    spath = runner.silver_path(out)

    real_record = runner.record_ingested
    calls = {"n": 0}

    def crash_once(out_dir, counts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash after commit, before ledger")
        return real_record(out_dir, counts)

    monkeypatch.setattr(runner, "record_ingested", crash_once)
    with pytest.raises(OSError, match="simulated crash"):
        runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT)
    committed = fake_store.count(spath)
    assert committed == N_ASSETS * 2  # the commit itself succeeded

    # restart: same files, same digest -> Delta skips, ledger records
    n = runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT)
    assert n == N_ASSETS * 2  # runner reports the batch it processed...
    assert fake_store.count(spath) == committed  # ...but no row duplicated
    assert len(fake_store.skipped) == 1
    (_, app_replay, v_replay) = fake_store.skipped[0]
    (_, app_first, v_first) = fake_store.applied[0]
    assert (app_replay, v_replay) == (app_first, v_first)

    # and a THIRD run is a ledger no-op: nothing even reaches the sink
    assert runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT) == 0
    assert len(fake_store.applied) == 1


def test_run_silver_new_batch_gets_fresh_app_id(
    spark, tmp_path_factory, fake_store
):
    """Every genuinely new batch must carry a DISTINCT appId (version
    pinned at 0) so Delta never skips it. Under the pre-r9 scheme
    (one appId, digest-derived versions) the second batch here had a
    ~50% chance of a lower digest and silent loss."""
    landing = _landing(tmp_path_factory)
    out = str(tmp_path_factory.mktemp("out"))
    glob = f"{landing}/coincap_data_*.json"
    spath = runner.silver_path(out)

    assert runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT) > 0
    write_raw_snapshot(snapshot_payload(2), landing)
    assert runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT) > 0

    assert fake_store.count(spath) == N_ASSETS * 3
    assert not fake_store.skipped
    apps = [a for (_, a, _) in fake_store.applied]
    vers = [v for (_, _, v) in fake_store.applied]
    assert len(set(apps)) == 2, "each batch needs its own appId"
    assert vers == [0, 0]
    assert all(a.startswith("run_silver:") for a in apps)


def test_run_silver_residual_duplication_is_the_documented_one(
    spark, tmp_path_factory, fake_store, monkeypatch
):
    """The runner documents ONE residual hole (runner.py run_silver
    docstring): if NEW files land between a crashed commit and the
    rerun, the batch identity changes, Delta sees a fresh appId, and
    the crashed batch's rows duplicate. Pin that the hole is exactly
    that — duplication, never loss — so any future change to the
    identity scheme that silently WIDENS or NARROWS it shows up here."""
    landing = _landing(tmp_path_factory)
    out = str(tmp_path_factory.mktemp("out"))
    glob = f"{landing}/coincap_data_*.json"
    spath = runner.silver_path(out)

    real_record = runner.record_ingested
    calls = {"n": 0}

    def crash_once(out_dir, counts):
        calls["n"] += 1
        if calls["n"] == 1:
            raise OSError("simulated crash")
        return real_record(out_dir, counts)

    monkeypatch.setattr(runner, "record_ingested", crash_once)
    with pytest.raises(OSError):
        runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT)

    write_raw_snapshot(snapshot_payload(2), landing)  # new file pre-rerun
    runner.run_silver(spark, glob, out, processed_at=PROCESSED_AT)

    # crashed batch (2 snapshots) committed twice + the new snapshot once
    assert fake_store.count(spath) == N_ASSETS * 2 + N_ASSETS * 3
    assert not fake_store.skipped  # identity changed -> Delta can't help
    # loss never happens: the new file's rows are present exactly once
    dts = [r["dt"] for r in fake_store.rows[spath]]
    assert len([d for d in set(dts)]) >= 1 and len(dts) == N_ASSETS * 5


def test_stream_epoch_sequence_contract():
    """The streaming sink pins appId to the OUTPUT PATH and version to
    the foreachBatch epoch (streaming/incremental.py:77). Replay of an
    acked epoch after a checkpoint-ack crash must skip; later epochs
    (including gaps after recovered failures) must apply."""
    store = FakeDeltaHistoryStore()

    class _Rows:
        def __init__(self, n):
            self._n = n

        def collect(self):
            return [type("R", (), {"asDict": lambda self2: {"i": 1}})()
                    for _ in range(self._n)]

    app = f"stream_silver:{os.path.realpath('/tmp/out/silver')}"
    store.write_history(_Rows(4), "silver", txn=(app, 0))
    store.write_history(_Rows(5), "silver", txn=(app, 1))
    store.write_history(_Rows(5), "silver", txn=(app, 1))  # epoch replay
    store.write_history(_Rows(2), "silver", txn=(app, 3))  # gap is fine
    assert store.count("silver") == 4 + 5 + 2
    assert [v for (_, _, v) in store.applied] == [0, 1, 3]
    assert [v for (_, _, v) in store.skipped] == [1]
