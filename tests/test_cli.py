"""CLI lifecycle test: ingest (fixture mode) -> run -> dashboard, via the
module entry point the way a reference user would drive it."""

from __future__ import annotations

import os

from project_crypto_data_engineering_gcp_spark.__main__ import main


def test_cli_ingest_run_dashboard(spark, tmp_path, capsys):
    landing = str(tmp_path / "landing")
    out = str(tmp_path / "out")

    assert main(["ingest", "--landing", landing, "--fixture"]) == 0
    assert "landed" in capsys.readouterr().out
    assert len(os.listdir(landing)) == 1

    # main() reuses the active test session (and must NOT stop it)
    assert main(["run", "--landing", landing, "--out", out]) == 0
    assert "dashboard rows: 40" in capsys.readouterr().out
    assert main(["dashboard", "--out", out, "-n", "5"]) == 0
    assert "SYM000" in capsys.readouterr().out
    assert spark.range(1).count() == 1  # session survived


def test_cli_curate_and_compact(spark, tmp_path, capsys):
    from project_crypto_data_engineering_gcp_spark.__main__ import main

    from .conftest import SF_SMOKE

    out = str(tmp_path / "curated")
    assert main(["curate", "--sf-dir", SF_SMOKE, "--out", out]) == 0
    printed = capsys.readouterr().out
    assert "train_docs:" in printed and "raw:" in printed

    tbl = str(tmp_path / "tbl")
    spark.range(1000).repartition(10).write.parquet(tbl)
    assert main(["compact", "--path", tbl, "--sort-by", "id"]) == 0
    assert "compacted to 1 files" in capsys.readouterr().out
    assert spark.read.parquet(tbl).count() == 1000


def test_cli_dedup_stream(spark, tmp_path, capsys):
    """dedup-stream drains a landing dir and reports emitted pairs; a
    second invocation with the same checkpoint is a no-op (exactly-once
    source progress)."""
    from pyspark.sql import functions as F

    from project_crypto_data_engineering_gcp_spark.__main__ import main
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    landing = tmp_path / "landing"
    landing.mkdir()
    for i in range(2):
        docs.filter(F.col("doc_id") % 2 == i).coalesce(1).write.parquet(
            str(landing / f"chunk_{i}.parquet")
        )
    state = str(tmp_path / "state")
    rc = main(
        ["dedup-stream", "--landing", str(landing) + "/*/", "--state", state]
    )
    assert rc == 0
    out1 = capsys.readouterr().out
    assert "duplicate pairs emitted:" in out1
    n1 = spark.read.parquet(state + "/pairs").count()
    assert n1 > 0
    # re-run: checkpoint already consumed every file -> nothing new
    rc = main(
        ["dedup-stream", "--landing", str(landing) + "/*/", "--state", state]
    )
    assert rc == 0
    assert "duplicate pairs emitted: 0" in capsys.readouterr().out
    assert spark.read.parquet(state + "/pairs").count() == n1


def test_cli_tx_compact_and_vacuum(spark, tmp_path, capsys):
    """`compact --tx` runs the OPTIMIZE-style txlog rewrite + optional
    vacuum through the CLI — the maintenance loop a deployment would
    cron against the pipeline's history tables."""
    from project_crypto_data_engineering_gcp_spark.sources import tx_table as tx

    t = str(tmp_path / "txtbl")
    for lo in (0, 5, 10):
        tx.commit(spark.range(lo, lo + 5), t, "append")
    assert (
        main(
            [
                "compact", "--path", t, "--tx", "--vacuum-keep", "1",
                # retention 0: the test's versions are seconds old and the
                # point is that they CAN be reclaimed when no writer is live
                "--vacuum-retention-hours", "0",
            ]
        )
        == 0
    )
    printed = capsys.readouterr().out
    assert "compacted to version 3" in printed and "vacuumed" in printed
    assert tx.read(spark, t).count() == 15
    # pre-compact versions are vacuumed away; the compacted one remains
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        tx.read(spark, t, version=0)


def test_cli_graph_at_scale_switches_identity(spark, capsys, monkeypatch):
    """The 100-TB graph modes are operable from the CLI / env config
    without code edits (r8 verdict task 3), and flag-set output is
    IDENTITY-equal to the default: the switches change physical
    placement (co-partitioned cache / shuffle semi-joins), never
    values."""
    from project_crypto_data_engineering_gcp_spark.config import (
        _BROADCAST_SURVIVORS_VAR,
        _EDGE_PARTITIONS_VAR,
        graph_broadcast_survivors,
        graph_edge_partitions,
    )
    from project_crypto_data_engineering_gcp_spark.plans import all_queries

    from .conftest import SF_SMOKE

    # env parsing contract
    monkeypatch.delenv(_EDGE_PARTITIONS_VAR, raising=False)
    monkeypatch.delenv(_BROADCAST_SURVIVORS_VAR, raising=False)
    assert graph_edge_partitions() is None
    assert graph_broadcast_survivors() is True
    monkeypatch.setenv(_EDGE_PARTITIONS_VAR, "0")
    assert graph_edge_partitions() is None  # 0 == default mode
    monkeypatch.setenv(_EDGE_PARTITIONS_VAR, "-3")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="must be >= 0"):
        graph_edge_partitions()
    monkeypatch.setenv(_BROADCAST_SURVIVORS_VAR, "maybe")
    with _pytest.raises(ValueError, match="must be one of"):
        graph_broadcast_survivors()
    monkeypatch.delenv(_EDGE_PARTITIONS_VAR)
    monkeypatch.delenv(_BROADCAST_SURVIVORS_VAR)

    qs = all_queries()

    def rows(name):
        return sorted(map(tuple, qs[name].fn(spark, SF_SMOKE).collect()))

    # pagerank: default vs co-partitioned — bit-identical ranks
    default_pr = rows("graph_pagerank")
    monkeypatch.setenv(_EDGE_PARTITIONS_VAR, "4")
    assert rows("graph_pagerank") == default_pr
    monkeypatch.delenv(_EDGE_PARTITIONS_VAR)

    # kcore: broadcast vs shuffle-semi-join survivors — identical cores
    default_kc = rows("graph_kcore")
    monkeypatch.setenv(_BROADCAST_SURVIVORS_VAR, "0")
    assert rows("graph_kcore") == default_kc
    monkeypatch.delenv(_BROADCAST_SURVIVORS_VAR)

    # CLI front end: flags reach the query through the same env vars
    assert main(
        ["graph", "--query", "graph_bfs_distances", "--sf-dir", SF_SMOKE,
         "--edge-partitions", "4", "-n", "3"]
    ) == 0
    out = capsys.readouterr().out
    assert "graph_bfs_distances rows:" in out
    monkeypatch.delenv(_EDGE_PARTITIONS_VAR, raising=False)


def test_cli_compact_bucket_by(spark, tmp_path, capsys):
    """compact --bucket-by converts a plain parquet table into a
    bucketed layout (row-count-verified, source untouched) whose scan
    carries the bucket distribution — the CLI front end of the
    bucketed-storage mode (r9)."""
    from project_crypto_data_engineering_gcp_spark.sources.bucketing import drop_bucketed

    src = str(tmp_path / "src")
    out = str(tmp_path / "edges-b")
    spark.range(0, 5000).selectExpr(
        "id % 97 as k", "id as payload"
    ).repartition(6).write.parquet(src)

    try:
        assert main(
            ["compact", "--path", src, "--bucket-by", "k",
             "--buckets", "8", "--out", out]
        ) == 0
        printed = capsys.readouterr().out
        assert "bucketized 5000 rows into 8 buckets on k" in printed
        t = spark.table("edges_b")
        assert t.count() == 5000
        # source untouched, bucketed scan reports the distribution
        assert spark.read.parquet(src).count() == 5000
        plan = t.groupBy("k").count()._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # bucketed scan -> no shuffle
        # --tx composition refused
        import pytest as _pytest

        with _pytest.raises(SystemExit, match="does not compose"):
            main(["compact", "--path", src, "--tx", "--bucket-by", "k",
                  "--out", out + "2"])
        with _pytest.raises(SystemExit, match="requires --out"):
            main(["compact", "--path", src, "--bucket-by", "k"])
    finally:
        drop_bucketed(spark, "edges_b")


def test_cli_build_lsh_index(spark, capsys):
    """The bootstrap split: build-lsh-index persists the band index and
    the serving query then reuses it via the shared memo (no second
    build — the returned path is identical)."""
    import os

    from project_crypto_data_engineering_gcp_spark.plans.queries_dedup import (
        _MINHASH_INDEX_MEMO,
        build_minhash_band_index,
    )

    from .conftest import SF_SMOKE

    _MINHASH_INDEX_MEMO.clear()
    assert main(["build-lsh-index", "--sf-dir", SF_SMOKE]) == 0
    printed = capsys.readouterr().out
    assert "band index at " in printed
    path = printed.split("band index at ", 1)[1].strip()
    assert os.path.isdir(path) and any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    # serving reuses: same memoized path, no rebuild
    assert build_minhash_band_index(spark, SF_SMOKE) == path
