"""ACID properties of the transactional manifest table (sources/tx_table)
— the local-FS stand-in for the environment-blocked Delta sink (S5;
reference 2-spark_processed_assats_list.py:65)."""

from __future__ import annotations

import json
import os

import pytest

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.sources import tx_table as tx


def _ids(df) -> list[int]:
    return sorted(r[0] for r in df.select("id").collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    s0 = tx.commit(spark.range(0, 3), t, "append")
    assert s0.version == 0
    s1 = tx.commit(spark.range(3, 5), t, "append")
    assert s1.version == 1
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 3, 4]
    s2 = tx.commit(spark.range(10, 12), t, "overwrite")
    assert _ids(tx.read(spark, t)) == [10, 11]
    # time travel: every prior snapshot still reads exactly as committed
    assert _ids(tx.read(spark, t, version=0)) == [0, 1, 2]
    assert _ids(tx.read(spark, t, version=1)) == [0, 1, 2, 3, 4]
    assert tx.snapshot(t).version == s2.version == 2


def test_uncommitted_write_is_invisible(spark, tmp_path):
    """Atomicity: data staged without a manifest (a crashed writer) must
    never surface in reads."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 3), t, "append")
    orphan = os.path.join(t, "data", "v99999999-0")
    spark.range(100, 105).write.parquet(orphan)
    assert _ids(tx.read(spark, t)) == [0, 1, 2]
    assert tx.snapshot(t).version == 0


def test_commit_conflict_retries_to_next_version(spark, tmp_path):
    """Optimistic concurrency: if another writer claims version N
    between our snapshot and our commit, the commit retries at N+1 and
    the APPEND composes over the winner's rows."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 2), t, "append")

    real_link = os.link
    raced = {"done": False}

    def race_once(src, dst):
        if not raced["done"]:
            raced["done"] = True
            # a concurrent writer wins version 1 first
            winner = tx.commit(spark.range(50, 52), t, "append")
            assert winner.version == 1
        return real_link(src, dst)

    os.link = race_once
    try:
        snap = tx.commit(spark.range(2, 4), t, "append")
    finally:
        os.link = real_link
    # the raced attempt's rename hit FileExistsError and retried
    assert snap.version == 2
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 3, 50, 51]


def test_exactly_one_winner_per_version(spark, tmp_path):
    """The commit point (hard-link-if-absent) admits exactly one
    manifest per version even when a second one is attempted directly."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 2), t, "append")
    target = os.path.join(t, "_txlog", "00000000.json")
    with pytest.raises(FileExistsError):
        with open(os.path.join(t, "_txlog", ".tmp-x"), "w") as fh:
            json.dump({"version": 0, "mode": "append", "files": []}, fh)
        os.link(os.path.join(t, "_txlog", ".tmp-x"), target)


def test_vacuum_reclaims_unreferenced_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 2), t, "append")
    tx.commit(spark.range(2, 4), t, "append")
    tx.commit(spark.range(9, 11), t, "overwrite")
    tx.commit(spark.range(11, 13), t, "append")
    deleted = tx.vacuum(t, keep_last=2, retention_seconds=0)
    # versions 0/1's files are gone, their manifests dropped
    assert deleted, "expected v0/v1 parquet files to be reclaimed"
    with pytest.raises(FileNotFoundError):
        tx.read(spark, t, version=0)
    # the kept snapshots still read exactly
    assert _ids(tx.read(spark, t, version=2)) == [9, 10]
    assert _ids(tx.read(spark, t)) == [9, 10, 11, 12]


def test_silver_history_roundtrip(spark, tmp_path):
    """The S5 shape end-to-end: two incremental Silver appends as two
    versions; the latest snapshot is the union, the first is replayable
    — the reference's Delta history semantics on the crypto rows."""
    from project_crypto_data_engineering_gcp_spark.fixtures import (
        write_fixture_landing,
    )
    from project_crypto_data_engineering_gcp_spark.plans.crypto_pipeline import (
        bronze_to_silver,
    )
    from project_crypto_data_engineering_gcp_spark.sources.json_source import (
        read_raw_json,
    )

    landing = tmp_path / "landing"
    write_fixture_landing(str(landing))
    raw = read_raw_json(spark, f"{landing}/coincap_data_*.json")
    silver = bronze_to_silver(raw, processed_at="2024-01-01T00:00:00")
    t = str(tmp_path / "silver_assets")
    s0 = tx.commit(silver, t, "append")
    s1 = tx.commit(silver, t, "append")
    n = silver.count()
    assert tx.read(spark, t, version=s0.version).count() == n
    assert tx.read(spark, t, version=s1.version).count() == 2 * n


def test_model_based_history(spark, tmp_path):
    """Model-based check: a deterministic pseudo-random sequence of
    append/overwrite commits must leave EVERY version's snapshot equal
    to an in-memory model of the history — the cumulative-correctness
    property that single-op tests can miss (e.g. an append that bases
    itself on the wrong prior snapshot)."""
    import random

    rng = random.Random(20260814)
    t = str(tmp_path / "tbl")
    model: list[list[int]] = []  # model[v] = expected ids at version v
    nxt = 0
    for _ in range(8):
        k = rng.randint(1, 4)
        ids = list(range(nxt, nxt + k))
        nxt += k
        mode = rng.choice(["append", "overwrite"])
        snap = tx.commit(spark.range(ids[0], ids[-1] + 1), t, mode)
        prev = model[-1] if (model and mode == "append") else []
        model.append([*prev, *ids])
        assert snap.version == len(model) - 1
    for v, expected in enumerate(model):
        assert _ids(tx.read(spark, t, version=v)) == sorted(expected), v


def test_partitioned_commit_prunes_and_time_travels(spark, tmp_path):
    """Partitioned txlog table: hive-style key=value staging layout is
    recovered as a partition column at read, a filter on it reaches the
    scan as a PartitionFilter (the scale contract Delta gives
    partitioned tables), and partition_by is pinned per table."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, "2025-05-24"), (2, "2025-05-24"), (3, "2025-05-25")],
        "id int, dt string",
    )
    tx.commit(df, t, "append", partition_by=["dt"])
    tx.commit(
        spark.createDataFrame([(4, "2025-05-26")], "id int, dt string"),
        t,
        "append",
        partition_by=["dt"],
    )
    back = tx.read(spark, t)
    assert set(back.columns) == {"id", "dt"}
    assert _ids(back) == [1, 2, 3, 4]
    assert _ids(tx.read(spark, t, version=0)) == [1, 2, 3]

    plan = (
        back.filter("dt = '2025-05-24'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "dt" in plan.split("PartitionFilters", 1)[1][:200]

    with pytest.raises(ValueError, match="partition_by mismatch"):
        tx.commit(spark.range(5), t, "append")


def test_merge_schema_read_across_commits(spark, tmp_path):
    """Reference S7 semantics on the txlog stand-in: a later append may
    carry a new column; merge_schema read surfaces the union schema with
    NULL for pre-evolution rows."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.createDataFrame([(1, "a")], "id int, v string"), t, "append")
    tx.commit(
        spark.createDataFrame([(2, "b", 9.5)], "id int, v string, extra double"),
        t,
        "append",
    )
    merged = tx.read(spark, t, merge_schema=True)
    assert "extra" in merged.columns
    rows = {r["id"]: r["extra"] for r in merged.collect()}
    assert rows == {1: None, 2: 9.5}


def test_compact_collapses_stage_groups(spark, tmp_path):
    """compact() (Delta's OPTIMIZE) rewrites the live snapshot into one
    staging group; contents unchanged, pre-compact versions still
    time-travel until vacuumed."""
    t = str(tmp_path / "tbl")
    for lo in range(0, 6, 2):
        tx.commit(
            spark.createDataFrame(
                [(i, f"2025-05-{24 + i % 2:02d}") for i in range(lo, lo + 2)],
                "id int, dt string",
            ),
            t,
            "append",
            partition_by=["dt"],
        )
    before = tx.snapshot(t)
    snap = tx.compact(spark, t)
    assert snap.mode == "overwrite" and snap.partition_by == ("dt",)
    stages = {tx._stage_of(t, f) for f in snap.files}
    assert len(stages) == 1 < len({tx._stage_of(t, f) for f in before.files})
    assert _ids(tx.read(spark, t)) == list(range(6))
    assert _ids(tx.read(spark, t, version=before.version)) == list(range(6))


def test_pipeline_e2e_on_txlog_version_as_of(spark, tmp_path):
    """R6 verdict task 2, the acceptance test: the crypto pipeline runs
    end-to-end with the txlog manifest table as its gated ACID sink —
    each ingest batch is one atomic Silver version, Silver reads
    VERSION AS OF (time travel), and Gold history appends land in the
    commit log while the serving copies stay plain overwrite parquet
    (reference 2-spark_processed_assats_list.py:65,
    3-spark_curated_analytics_full.py:86-90)."""
    from project_crypto_data_engineering_gcp_spark.fixtures import (
        N_ASSETS,
        write_fixture_landing,
    )
    from project_crypto_data_engineering_gcp_spark.plans.runner import (
        read_gold_history,
        read_silver,
        run_gold,
        run_silver,
        silver_path,
    )

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")

    # batch 1: two snapshot files -> Silver version 0
    write_fixture_landing(landing, n_snapshots=2)
    assert run_silver(spark, f"{landing}/coincap_data_*.json", out) == 2 * N_ASSETS
    # batch 2: one NEW file (replay-stable names; ledger skips the rest)
    write_fixture_landing(landing, n_snapshots=3)
    assert run_silver(spark, f"{landing}/coincap_data_*.json", out) == N_ASSETS

    assert tx.snapshot(silver_path(out)).version == 1
    assert read_silver(spark, out).count() == 3 * N_ASSETS
    assert read_silver(spark, out, version=0).count() == 2 * N_ASSETS  # VERSION AS OF

    # gold: two runs -> history has 2 versions, serving stays overwrite
    run_gold(spark, out)
    run_gold(spark, out)
    hist_path = os.path.join(out, "gold", "history", "daily_overview")
    assert tx.snapshot(hist_path).version == 1
    assert read_gold_history(spark, out, "daily_overview").count() == 2 * N_ASSETS
    assert (
        read_gold_history(spark, out, "daily_overview", version=0).count()
        == N_ASSETS
    )
    serving = os.path.join(out, "gold", "serving", "daily_overview")
    assert not os.path.isdir(os.path.join(serving, tx._LOG_DIR))
    assert spark.read.parquet(serving).count() == N_ASSETS


def test_model_based_history_partitioned(spark, tmp_path):
    """The model-based cumulative-correctness property, partitioned
    variant: random append/overwrite commits AGAINST A PARTITIONED
    table must leave every version's snapshot equal to the in-memory
    model, with the partition column surviving the per-stage basePath
    reconstruction at every version."""
    import random

    rng = random.Random(20260815)
    t = str(tmp_path / "tbl")
    model: list[list[int]] = []
    nxt = 0
    for _ in range(6):
        k = rng.randint(1, 4)
        ids = list(range(nxt, nxt + k))
        nxt += k
        mode = rng.choice(["append", "overwrite"])
        df = spark.createDataFrame(
            [(i, f"2025-06-{(i % 3) + 1:02d}") for i in ids], "id int, dt string"
        )
        snap = tx.commit(df, t, mode, partition_by=["dt"])
        prev = model[-1] if (model and mode == "append") else []
        model.append([*prev, *ids])
        assert snap.version == len(model) - 1
        assert snap.partition_by == ("dt",)
    for v, expected in enumerate(model):
        back = tx.read(spark, t, version=v)
        assert _ids(back) == sorted(expected), v
        # partition column reconstructed correctly for every row
        bad = back.filter(
            back.dt != F.concat(F.lit("2025-06-0"), (back.id % 3) + 1)
        ).count()
        assert bad == 0, v


def test_vacuum_retention_protects_fresh_staging(spark, tmp_path):
    """An unreferenced-but-FRESH staging dir may be an in-flight commit
    that has not linked its manifest yet — vacuum must leave it alone
    inside the retention window and reclaim it only after (code-review
    r7: the rmtree race against a live writer)."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 2), t, "append")
    tx.commit(spark.range(2, 4), t, "append")
    tx.commit(spark.range(9, 11), t, "overwrite")
    # simulate an in-flight writer: staged data, no manifest yet
    orphan = os.path.join(t, "data", "v00000099-inflight")
    spark.range(100, 102).write.parquet(orphan)

    deleted = tx.vacuum(t, keep_last=1, retention_seconds=3600)
    assert os.path.isdir(orphan), "fresh staging dir must survive vacuum"
    assert not any("v00000099-inflight" in f for f in deleted)

    deleted = tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert not os.path.isdir(orphan), "aged-out staging dir is reclaimed"

    with pytest.raises(ValueError, match="keep_last"):
        tx.vacuum(t, keep_last=0)


def test_txn_marker_makes_commit_idempotent(spark, tmp_path):
    """A replayed (app_id, txn_version) commit writes NOTHING and
    returns the original snapshot — the foreachBatch exactly-once
    contract (crash between commit and checkpoint ack replays the
    epoch; code-review r7)."""
    t = str(tmp_path / "tbl")
    s0 = tx.commit(spark.range(0, 3), t, "append", txn=("streamA", 7))
    s1 = tx.commit(spark.range(0, 3), t, "append", txn=("streamA", 7))
    assert s1.version == s0.version == 0
    assert _ids(tx.read(spark, t)) == [0, 1, 2]  # not duplicated
    # a DIFFERENT epoch commits normally
    s2 = tx.commit(spark.range(3, 5), t, "append", txn=("streamA", 8))
    assert s2.version == 1
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 3, 4]


def test_compact_refuses_lost_update(spark, tmp_path):
    """compact() pins its overwrite to the snapshot version it read: a
    concurrent append landing in between must surface as CommitConflict,
    never be silently overwritten away (code-review r7)."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 3), t, "append")
    snap = tx.snapshot(t)
    df = tx.read(spark, t)
    tx.commit(spark.range(10, 12), t, "append")  # concurrent appender wins
    with pytest.raises(tx.CommitConflict, match="moved past expected base"):
        tx.commit(
            df, t, "overwrite", expected_base_version=snap.version
        )
    # the append's rows are intact
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 10, 11]


def test_legacy_parquet_dir_adopted_as_version_zero(spark, tmp_path):
    """A pre-txlog plain-parquet table (partitioned, written by an older
    release) is adopted in place as version 0 on the first txlog append
    — prior rows COMPOSE with the new batch instead of being shadowed
    (code-review r7: the silent-data-loss upgrade path)."""
    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "2025-06-01"), (2, "2025-06-02")], "id int, dt string"
    ).write.partitionBy("dt").parquet(t)

    tx.commit(
        spark.createDataFrame([(3, "2025-06-03")], "id int, dt string"),
        t,
        "append",
        partition_by=["dt"],
    )
    back = tx.read(spark, t)
    assert _ids(back) == [1, 2, 3]
    assert set(back.columns) == {"id", "dt"}
    # the adopted layout is version 0, the append version 1
    assert tx.read(spark, t, version=0).count() == 2
    assert tx.snapshot(t, 0).mode == "adopt"


def test_read_history_never_surfaces_uncommitted_staging(spark, tmp_path):
    """sinks.read_history falls back to raw parquet ONLY for a genuine
    pre-txlog layout: a table whose first commit crashed after staging
    (data under data/, empty log) must raise, not serve the uncommitted
    rows (code-review r7)."""
    from project_crypto_data_engineering_gcp_spark.sources.sinks import (
        read_history,
    )

    t = str(tmp_path / "tbl")
    os.makedirs(os.path.join(t, "_txlog"))
    spark.range(5).write.parquet(os.path.join(t, "data", "v00000000-dead"))
    with pytest.raises(Exception):
        read_history(spark, t).count()

    # the genuine legacy layout still reads
    t2 = str(tmp_path / "tbl2")
    spark.range(3).write.parquet(t2)
    assert read_history(spark, t2).count() == 3


def test_vacuum_retention_preserves_txn_markers(spark, tmp_path):
    """Manifests inside the retention window survive vacuum even beyond
    keep_last, so a replayed streaming epoch still finds its idempotency
    marker (code-review r7: dropping young manifests reintroduced the
    duplicate-epoch bug the markers exist to prevent)."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 2), t, "append", txn=("streamZ", 1))
    tx.commit(spark.range(2, 4), t, "append")
    tx.commit(spark.range(4, 6), t, "append")

    tx.vacuum(t, keep_last=1, retention_seconds=3600)
    # the young v0 manifest (and its marker) survived keep_last=1
    replay = tx.commit(spark.range(0, 2), t, "append", txn=("streamZ", 1))
    assert replay.version == 0
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 3, 4, 5]  # no duplicates

    # outside the retention window the marker is reclaimable — documented
    tx.vacuum(t, keep_last=1, retention_seconds=0)
    with pytest.raises(FileNotFoundError):
        tx.snapshot(t, 0)


def test_concurrent_commit_storm(spark, tmp_path):
    """Commit storm: 4 threads x 3 appends each race on one partitioned
    table. Invariants: versions come out contiguous 0..11, every commit
    wins exactly one version, and the final snapshot holds every
    writer's rows exactly once (the optimistic-concurrency composition
    the protocol promises, exercised end-to-end rather than via the
    single-race monkeypatch test)."""
    import threading

    t = str(tmp_path / "tbl")
    results: list[int] = []
    errors: list[Exception] = []
    lock = threading.Lock()

    def writer(base: int) -> None:
        try:
            for j in range(3):
                lo = base * 100 + j * 10
                df = spark.createDataFrame(
                    [(i, f"2025-07-{(i % 2) + 1:02d}") for i in range(lo, lo + 5)],
                    "id int, dt string",
                )
                snap = tx.commit(
                    df, t, "append", partition_by=["dt"], max_retries=20
                )
                with lock:
                    results.append(snap.version)
        except Exception as exc:  # pragma: no cover - failure reporting
            with lock:
                errors.append(exc)

    threads = [threading.Thread(target=writer, args=(b,)) for b in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()

    assert not errors, errors
    assert sorted(results) == list(range(12))  # one version per commit
    expected = sorted(
        i for b in range(4) for j in range(3)
        for i in range(b * 100 + j * 10, b * 100 + j * 10 + 5)
    )
    assert _ids(tx.read(spark, t)) == expected  # all rows, exactly once


def test_commit_refuses_corrupt_base(spark, tmp_path):
    """The post-link existence check covers the INHERITED base files,
    not just the writer's own staged ones: an append over a snapshot
    whose data was reclaimed (retention-window violation upstream) must
    roll its just-linked manifest back and hard-error — never commit a
    manifest propagating dangling paths, never silently retry (ADVICE
    r8: the stalled-writer race would otherwise let a concurrent
    appender pin the retracted version and inherit its dangling file
    list)."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 3), t, "append")
    victim = tx.snapshot(t).files[0]
    os.unlink(victim)  # simulate the vacuumed-under-retention-violation base
    with pytest.raises(RuntimeError, match="corrupt base"):
        tx.commit(spark.range(3, 5), t, "append")
    # the rolled-back version is not visible: latest is still v0
    assert tx.snapshot(t).version == 0
    assert not os.path.exists(os.path.join(t, "_txlog", "00000001.json"))


def test_adopt_legacy_partition_mismatch_raises(spark, tmp_path):
    """_adopt_legacy infers the partition spec from the legacy layout's
    key=value directories instead of trusting the caller: a mismatched
    first commit must raise, not silently drop the partition column
    from the adopted rows at read time (ADVICE r8)."""
    # hive-partitioned legacy adopted by an UNPARTITIONED first commit
    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "2025-06-01"), (2, "2025-06-02")], "id int, dt string"
    ).write.partitionBy("dt").parquet(t)
    with pytest.raises(ValueError, match="encodes partition_by=\\['dt'\\]"):
        tx.commit(spark.range(3, 5), t, "append")
    assert tx._versions(t) == []  # nothing was adopted or committed

    # unpartitioned legacy adopted by a PARTITIONED first commit
    t2 = str(tmp_path / "tbl2")
    spark.range(3).write.parquet(t2)
    with pytest.raises(ValueError, match="encodes partition_by=\\[\\]"):
        tx.commit(
            spark.createDataFrame([(9, "2025-06-09")], "id int, dt string"),
            t2,
            "append",
            partition_by=["dt"],
        )


def test_vacuum_reclaims_adopted_legacy_files(spark, tmp_path):
    """Adopted legacy files live OUTSIDE data/ — once every retained
    manifest stops referencing them (overwrite + vacuum) they must be
    reclaimed like any other dead file, their key=value dirs pruned,
    and has_legacy_files must flip false for the migrated table
    (ADVICE r8: the indefinite on-disk leak)."""
    t = str(tmp_path / "tbl")
    spark.createDataFrame(
        [(1, "2025-06-01"), (2, "2025-06-02")], "id int, dt string"
    ).write.partitionBy("dt").parquet(t)

    tx.commit(
        spark.createDataFrame([(3, "2025-06-03")], "id int, dt string"),
        t,
        "append",
        partition_by=["dt"],
    )
    assert _ids(tx.read(spark, t)) == [1, 2, 3]
    tx.commit(
        spark.createDataFrame([(9, "2025-06-09")], "id int, dt string"),
        t,
        "overwrite",
        partition_by=["dt"],
    )
    deleted = tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert any(os.sep + "dt=2025-06-01" + os.sep in f for f in deleted)
    assert not tx.has_legacy_files(t)
    assert not os.path.isdir(os.path.join(t, "dt=2025-06-01"))
    # the live snapshot is untouched
    assert _ids(tx.read(spark, t)) == [9]


def test_maintenance_lifecycle_ingest_compact_vacuum_time_travel(spark, tmp_path):
    """The maintenance COMPOSITION on one table (r7 verdict task 6):
    ingest batches -> OPTIMIZE-style compact -> retention-gated vacuum
    -> time travel. Compact must not cost readers any version still
    inside the retention window; only an aged-out vacuum reclaims
    them."""
    from project_crypto_data_engineering_gcp_spark.fixtures import (
        N_ASSETS,
        write_fixture_landing,
    )
    from project_crypto_data_engineering_gcp_spark.plans.runner import (
        read_silver,
        run_silver,
        silver_path,
    )

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    write_fixture_landing(landing, n_snapshots=1)
    run_silver(spark, f"{landing}/coincap_data_*.json", out)
    write_fixture_landing(landing, n_snapshots=2)
    run_silver(spark, f"{landing}/coincap_data_*.json", out)
    t = silver_path(out)
    assert tx.snapshot(t).version == 1

    snap = tx.compact(spark, t)  # one overwrite commit, version 2
    assert snap.version == 2 and snap.mode == "overwrite"
    # compact costs readers nothing: both ingest versions still read
    assert read_silver(spark, out, version=0).count() == N_ASSETS
    assert read_silver(spark, out, version=1).count() == 2 * N_ASSETS

    # retention-gated vacuum: every manifest is young, so time travel
    # SURVIVES a keep_last=1 vacuum inside the window
    tx.vacuum(t, keep_last=1, retention_seconds=3600)
    assert read_silver(spark, out, version=0).count() == N_ASSETS
    assert read_silver(spark, out, version=1).count() == 2 * N_ASSETS

    # aged out, the pre-compact versions are reclaimed; the compacted
    # snapshot (and the table's forward life) is intact
    tx.vacuum(t, keep_last=1, retention_seconds=0)
    with pytest.raises(FileNotFoundError):
        read_silver(spark, out, version=0).count()
    assert read_silver(spark, out).count() == 2 * N_ASSETS
    write_fixture_landing(landing, n_snapshots=3)
    run_silver(spark, f"{landing}/coincap_data_*.json", out)
    assert read_silver(spark, out).count() == 3 * N_ASSETS
    assert tx.snapshot(t).version == 3


def test_run_silver_replay_after_ledger_crash_is_idempotent(spark, tmp_path):
    """A crash BETWEEN the atomic Silver commit and record_ingested
    replays the same batch on restart; the txn marker derived from the
    batch's sorted source-file list must make the replayed append a
    no-op instead of doubling the rows (ADVICE r8)."""
    from project_crypto_data_engineering_gcp_spark.fixtures import (
        N_ASSETS,
        write_fixture_landing,
    )
    from project_crypto_data_engineering_gcp_spark.plans import runner
    from project_crypto_data_engineering_gcp_spark.plans.runner import (
        read_silver,
        run_silver,
        silver_path,
    )

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    write_fixture_landing(landing, n_snapshots=2)

    real_record = runner.record_ingested
    def crash(*a, **k):
        raise OSError("simulated crash after commit, before ledger")
    runner.record_ingested = crash
    try:
        with pytest.raises(OSError, match="simulated crash"):
            run_silver(spark, f"{landing}/coincap_data_*.json", out)
    finally:
        runner.record_ingested = real_record

    # restart: the ledger is empty so the SAME batch replays — the txn
    # marker must swallow the duplicate append
    assert run_silver(spark, f"{landing}/coincap_data_*.json", out) == 2 * N_ASSETS
    assert read_silver(spark, out).count() == 2 * N_ASSETS  # not doubled
    assert tx.snapshot(silver_path(out)).version == 0  # one commit total
    # and the ledger is now recorded: a rerun is a true no-op
    assert run_silver(spark, f"{landing}/coincap_data_*.json", out) == 0


def test_nested_data_dir_stays_invisible_to_legacy_machinery(spark, tmp_path):
    """A legacy layout containing a NESTED directory literally named
    'data' (table/foo/data/x.parquet) is excluded from adoption by the
    any-depth component filter — so vacuum's legacy sweep must never
    delete it either: unadopted-but-invisible files are user data, not
    reclaimable garbage (code-review r8 second pass: narrowing the
    exclusion to the table root would have vacuumed them)."""
    t = str(tmp_path / "tbl")
    nested = os.path.join(t, "foo", "data")
    spark.range(3).write.parquet(os.path.join(t, "legacy_top"))
    spark.range(100, 103).write.parquet(nested)

    # adoption sees ONLY the top-level legacy parquet
    tx.commit(spark.range(10, 12), t, "append")
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 10, 11]

    # overwrite + aged vacuum reclaims the ADOPTED legacy files...
    tx.commit(spark.range(50, 52), t, "overwrite")
    deleted = tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert any("legacy_top" in f for f in deleted)
    # ...but never the invisible nested-'data' files
    assert not any(os.sep + "foo" + os.sep in f for f in deleted)
    nested_files = [f for f in os.listdir(nested) if f.endswith(".parquet")]
    assert nested_files, "nested data/ parquet must survive vacuum"
    assert _ids(tx.read(spark, t)) == [50, 51]


def test_vacuum_never_reclaims_post_adoption_user_files(spark, tmp_path):
    """Only files actually ADOPTED at migration are reclaimable by the
    legacy sweep: a parquet landing in the table directory AFTER the
    first commit was never referenced by any manifest and is user data
    — an aged vacuum must leave it alone, even while reclaiming the
    genuinely-adopted legacy files next to it (ADVICE r9: the sweep
    used to unlink EVERY unreferenced parquet outside log/data)."""
    t = str(tmp_path / "tbl")
    spark.range(3).write.parquet(t)  # legacy layout, adopted below
    tx.commit(spark.range(10, 12), t, "append")  # v0=adopt, v1=append
    # user data lands post-adoption — no manifest ever references it
    user_dir = os.path.join(t, "user_drop")
    spark.range(100, 103).write.parquet(user_dir)

    tx.commit(spark.range(50, 52), t, "overwrite")
    deleted = tx.vacuum(t, keep_last=1, retention_seconds=0)

    # adopted legacy reclaimed...
    assert any(os.path.dirname(f) == t for f in deleted)
    # ...user files untouched (not deleted, still on disk)
    assert not any("user_drop" in f for f in deleted)
    user_files = [f for f in os.listdir(user_dir) if f.endswith(".parquet")]
    assert user_files, "post-adoption user parquet must survive vacuum"
    assert _ids(tx.read(spark, t)) == [50, 51]


def test_adoption_ledger_survives_manifest_vacuum(spark, tmp_path):
    """The adopted-file record must outlive the version-0 manifest:
    vacuum deletes old manifests, and a LATER vacuum still needs to
    know which legacy files are reclaimable. The durable adoption
    ledger (never vacuumed) carries that across (ADVICE r9)."""
    t = str(tmp_path / "tbl")
    spark.range(3).write.parquet(t)  # legacy, adopted at first commit
    tx.commit(spark.range(10, 12), t, "append")  # v1
    tx.commit(spark.range(20, 22), t, "append")  # v2

    # first vacuum: drops manifests 0 and 1; adopted files are still
    # LIVE (v2 inherits them) so they survive
    tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert not os.path.exists(os.path.join(t, "_txlog", "00000000.json"))
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 10, 11, 20, 21]

    # overwrite, then vacuum again: manifest 0 is long gone, so only
    # the ledger knows the root-level parquet was adopted — it must
    # still be reclaimed (not leak as presumed user data)
    tx.commit(spark.range(50, 52), t, "overwrite")
    deleted = tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert any(os.path.dirname(f) == t for f in deleted)
    assert not tx.has_legacy_files(t)
    assert _ids(tx.read(spark, t)) == [50, 51]


def test_commit_retries_when_pinned_base_was_retracted(spark, tmp_path, monkeypatch):
    """The post-link missing-base check distinguishes the transient
    race from genuine corruption: an appender that pinned a
    momentarily-visible version as its base (retracted by the stalled
    writer's own rollback) must RETRY against the refreshed snapshot
    and succeed — hard-erroring only when the genuinely-latest snapshot
    references missing data (ADVICE r9)."""
    t = str(tmp_path / "tbl")
    tx.commit(spark.range(0, 3), t, "append")

    real_snapshot = tx.snapshot
    calls = {"n": 0}

    def poisoned(table, version=None):
        snap = real_snapshot(table, version)
        calls["n"] += 1
        # call #1 is the partition-spec check, call #2 pins the base:
        # poison exactly the base pin with a retracted version's view —
        # one extra (now-nonexistent) data file
        if calls["n"] == 2:
            return tx.TxSnapshot(
                version=snap.version + 1,
                mode="append",
                files=snap.files
                + (os.path.join(table, "data", "vRETRACTED", "gone.parquet"),),
                partition_by=snap.partition_by,
            )
        return snap

    monkeypatch.setattr(tx, "snapshot", poisoned)
    snap = tx.commit(spark.range(3, 5), t, "append")
    assert calls["n"] > 2  # the retry actually re-read the snapshot
    assert _ids(tx.read(spark, t)) == [0, 1, 2, 3, 4]
    # the poisoned attempt's manifest was rolled back, then the retry
    # committed the SAME logical version over a healthy base
    assert snap.version == 1


def test_run_silver_txn_identity_lives_in_app_id(spark, tmp_path, monkeypatch):
    """The idempotency marker scopes the batch digest into the txn
    APP ID with a constant version — not a hash-derived version under
    one appId. Delta's txnAppId/txnVersion contract silently skips any
    write whose version is <= the last recorded one per appId, so
    unordered hash versions would drop ~half of all legitimate new
    batches under real delta-spark (ADVICE r9). Distinct batches must
    carry distinct appIds; a replay repeats (appId, 0) exactly."""
    from project_crypto_data_engineering_gcp_spark.fixtures import (
        write_fixture_landing,
    )
    from project_crypto_data_engineering_gcp_spark.plans import runner

    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")
    paths = write_fixture_landing(landing, n_snapshots=3)

    seen = []
    real = runner.write_history

    def spy(df, path, **kw):
        seen.append(kw.get("txn"))
        return real(df, path, **kw)

    monkeypatch.setattr(runner, "write_history", spy)
    # batch 1: the first two snapshot files
    os.rename(paths[2], paths[2] + ".held")
    assert runner.run_silver(spark, f"{landing}/coincap_data_*.json", out) > 0
    # batch 2: the third file released — a DIFFERENT batch identity
    os.rename(paths[2] + ".held", paths[2])
    assert runner.run_silver(spark, f"{landing}/coincap_data_*.json", out) > 0

    assert len(seen) == 2
    (app_a, ver_a), (app_b, ver_b) = seen
    assert ver_a == 0 and ver_b == 0  # constant version: monotonic per appId
    assert app_a.startswith("run_silver:") and app_b.startswith("run_silver:")
    assert app_a != app_b  # new batch => fresh appId => never skipped


def test_adoption_ledger_backfills_for_pre_ledger_tables(spark, tmp_path):
    """A table migrated BEFORE the adoption ledger existed (version-0
    adopt manifest, no adopted.json) must have its ledger backfilled on
    first read — otherwise the first vacuum that ages manifest 0 out
    destroys the adoption record and the adopted files leak forever
    (code-review r9, the upgrade-path hole in the ADVICE-r9 fix)."""
    t = str(tmp_path / "tbl")
    spark.range(3).write.parquet(t)  # legacy, adopted at first commit
    tx.commit(spark.range(10, 12), t, "append")
    # simulate the pre-ledger table: drop the ledger the adoption wrote
    os.unlink(tx._adopted_ledger_file(t))

    tx.commit(spark.range(20, 22), t, "append")  # v2
    # vacuum #1: adopted files still live (v2 inherits), manifest 0 ages
    # out — the sweep's _adopted_files call must backfill the ledger
    tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert not os.path.exists(os.path.join(t, "_txlog", "00000000.json"))
    assert os.path.exists(tx._adopted_ledger_file(t))

    # vacuum #2 after overwrite: only the backfilled ledger knows the
    # root parquet was adopted — it must be reclaimed, not leak
    tx.commit(spark.range(50, 52), t, "overwrite")
    deleted = tx.vacuum(t, keep_last=1, retention_seconds=0)
    assert any(os.path.dirname(f) == t for f in deleted)
    assert not tx.has_legacy_files(t)
    assert _ids(tx.read(spark, t)) == [50, 51]


def test_concurrent_adoption_storm(spark, tmp_path):
    """Adoption race: 4 threads race their FIRST commit onto a legacy
    parquet layout. Invariants: exactly one version-0 adopt manifest,
    one adoption ledger holding exactly the legacy files, all four
    appends land (versions contiguous), and the final frame composes
    the legacy rows with every writer's — exercising the ledger's
    link-loser-is-a-no-op path under real concurrency (r9)."""
    import threading

    t = str(tmp_path / "tbl")
    spark.range(3).write.parquet(t)  # the legacy layout all four adopt
    legacy_before = set(tx._legacy_files(t))
    errors: list[Exception] = []

    def writer(base: int) -> None:
        try:
            tx.commit(spark.range(base, base + 2), t, "append")
        except Exception as e:  # pragma: no cover - failure surface
            errors.append(e)

    threads = [
        threading.Thread(target=writer, args=(100 * (i + 1),)) for i in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    # one adopt manifest at version 0, then the four appends
    assert tx._versions(t) == [0, 1, 2, 3, 4]
    with open(os.path.join(t, "_txlog", "00000000.json")) as fh:
        assert json.load(fh)["mode"] == "adopt"
    assert tx._adopted_files(t) == legacy_before
    got = _ids(tx.read(spark, t))
    expect = [0, 1, 2] + sorted(
        x for b in (100, 200, 300, 400) for x in (b, b + 1)
    )
    assert got == expect
