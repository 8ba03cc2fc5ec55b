"""Compaction maintenance: many small files -> few target-sized files,
bit-exact content, clustered stats, atomic swap."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.sources.maintenance import (
    compact_table,
    table_bytes,
)
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def _parquet_files(path):
    return [
        f
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    ]


def test_compaction_merges_small_files_bit_exact(spark, tmp_path):
    path = str(tmp_path / "li")
    li = load_table(spark, SF_SMOKE, "lineitem")
    li.repartition(40).write.parquet(path)  # simulate append-bred small files
    assert len(_parquet_files(path)) == 40
    before = sorted(tuple(r) for r in li.collect())

    n = compact_table(
        spark, path, target_file_bytes=table_bytes(spark, path), sort_cols=["l_orderkey"]
    )
    assert n == len(_parquet_files(path)) == 1
    after_df = spark.read.parquet(path)
    assert sorted(tuple(r) for r in after_df.collect()) == before

    # stats clustering: the single output file is ordered on the sort key,
    # so parquet row-group min/max stats are selective for key filters
    import pyarrow.parquet as pq

    fpath = os.path.join(path, _parquet_files(path)[0])
    keys = pq.read_table(fpath, columns=["l_orderkey"])["l_orderkey"].to_pylist()
    assert keys == sorted(keys)


def test_compaction_refuses_bad_rewrite(spark, tmp_path, monkeypatch):
    """The atomic-swap protocol must leave the live table untouched if
    the staging rewrite is wrong."""
    import project_crypto_data_engineering_gcp_spark.sources.maintenance as m

    path = str(tmp_path / "t")
    spark.range(100).write.parquet(path)

    real_read = spark.read.parquet

    class FakeRead:
        def __init__(self, session):
            self._s = session

        def parquet(self, p):
            df = real_read(p)
            return df.limit(50) if "__compact_" in p else df

    monkeypatch.setattr(
        type(spark), "read", property(lambda s: FakeRead(s)), raising=False
    )
    with pytest.raises(RuntimeError, match="row-count mismatch"):
        m.compact_table(spark, path, target_file_bytes=10**9)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == 100  # live table intact


def test_morton_col_matches_python_interleave(spark):
    from project_crypto_data_engineering_gcp_spark.sources.maintenance import (
        morton_col,
    )

    def py_morton(a, b, bits=16):
        out = 0
        for i in range(bits):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    rows = [(i * 37 % 65536, i * 101 % 65536) for i in range(200)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", morton_col("a", "b")).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == py_morton(a, b)


def test_compact_with_morton_clustering(spark, tmp_path):
    """compact_table + a materialized Morton key = multi-dim clustered
    files; the sort key column is orderable and rows survive bit-exact."""
    from pyspark.sql import functions as F

    from project_crypto_data_engineering_gcp_spark.sources.maintenance import (
        compact_table,
        morton_col,
    )
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    from .conftest import SF_SMOKE

    path = str(tmp_path / "liz")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumn(
        "zkey", morton_col("l_orderkey", "l_partkey")
    )
    li.repartition(8).write.parquet(path)
    n = compact_table(spark, path, target_file_bytes=10**9, sort_cols=["zkey"])
    assert n == 1
    back = spark.read.parquet(path)
    assert back.count() == li.count()
    import pyarrow.parquet as pq

    f = [x for x in os.listdir(path) if x.endswith(".parquet")][0]
    zs = pq.read_table(os.path.join(path, f), columns=["zkey"])["zkey"].to_pylist()
    assert zs == sorted(zs)
