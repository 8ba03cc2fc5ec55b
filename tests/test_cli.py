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
