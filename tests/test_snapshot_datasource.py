"""Custom crypto_snapshots DataSource: file-per-partition parallelism and
bronze-fidelity equality with the multiline-JSON reader path."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.sources.json_source import read_raw_json
from project_crypto_data_engineering_gcp_spark.sources.snapshot_datasource import (
    register_snapshot_source,
)

from .fixtures_crypto import N_ASSETS, SNAPSHOT_TS_MS, write_fixture_landing


def test_datasource_matches_json_reader(spark, tmp_path):
    landing = str(tmp_path / "landing")
    write_fixture_landing(landing)
    register_snapshot_source(spark)

    ds = spark.read.format("crypto_snapshots").load(landing)
    assert ds.count() == N_ASSETS * len(SNAPSHOT_TS_MS)
    # one partition per snapshot file
    assert ds.rdd.getNumPartitions() == len(SNAPSHOT_TS_MS)

    via_json = (
        read_raw_json(spark, f"{landing}/coincap_data_*.json")
        .select(F.explode("data").alias("a"), "timestamp")
        .select("a.*", "timestamp")
    )
    cols = [c for c in via_json.columns if c != "tokens"]  # map not except-able
    a, b = ds.select(cols), via_json.select(cols)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0

    # bronze fidelity: numerics are still the API's decimal strings
    assert dict(ds.dtypes)["priceUsd"] == "string"

    # narrowing the glob narrows the partitions (time-ranged replay)
    one = spark.read.format("crypto_snapshots").load(
        os.path.join(landing, "coincap_data_2025052*.json")
    )
    assert one.rdd.getNumPartitions() >= 1
    assert one.count() % N_ASSETS == 0


def test_datasource_streaming_incremental_drain(spark, tmp_path):
    """The streaming side of the custom source: first AvailableNow drain
    ingests every landed snapshot; new files after a checkpointed restart
    are picked up incrementally (name-set offset = exactly-once)."""
    import json

    from project_crypto_data_engineering_gcp_spark.fixtures import snapshot_payload
    from project_crypto_data_engineering_gcp_spark.sources.json_source import (
        write_raw_snapshot,
    )

    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    write_fixture_landing(landing)
    register_snapshot_source(spark)

    def drain():
        rows = []

        def sink(batch_df, _epoch):
            rows.extend(batch_df.select("timestamp").collect())

        q = (
            spark.readStream.format("crypto_snapshots")
            .load(landing)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return rows

    first = drain()
    assert len(first) == N_ASSETS * len(SNAPSHOT_TS_MS)

    # rerun with same checkpoint: nothing new -> no duplicate rows
    assert drain() == []

    # land one more snapshot (a later timestamp -> new file name) ->
    # only its rows arrive
    new_ts = max(SNAPSHOT_TS_MS) + 3_600_000
    payload = snapshot_payload(0)
    payload["timestamp"] = new_ts
    write_raw_snapshot(payload, landing)
    inc = drain()
    assert len(inc) == N_ASSETS
    assert {r["timestamp"] for r in inc} == {new_ts}


def test_datasource_filename_filter_pushdown(spark, tmp_path):
    """A timestamp predicate prunes whole snapshot FILES at listing time
    (fewer partitions), while Spark still re-evaluates the filter exactly
    (partial pushdown -> same rows as the unpruned read + filter)."""
    landing = str(tmp_path / "landing")
    write_fixture_landing(landing)
    register_snapshot_source(spark)

    cutoff = sorted(SNAPSHOT_TS_MS)[-1]  # only the last snapshot qualifies
    full = spark.read.format("crypto_snapshots").load(landing)
    pruned = full.filter(F.col("timestamp") >= cutoff)
    assert pruned.rdd.getNumPartitions() == 1  # 2 of 3 files never open
    assert pruned.count() == N_ASSETS
    assert {r["timestamp"] for r in pruned.select("timestamp").distinct().collect()} == {cutoff}
    # exact boundary semantics stay Spark's: a strict > excludes the file's rows
    assert full.filter(F.col("timestamp") > cutoff).count() == 0
