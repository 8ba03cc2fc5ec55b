"""ACID properties of the transactional manifest table (sources/tx_table)
— the local-FS stand-in for the environment-blocked Delta sink (S5;
reference 2-spark_processed_assats_list.py:65)."""

from __future__ import annotations

import json
import os

import pytest

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
    deleted = tx.vacuum(t, keep_last=2)
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
