"""Persisted IVF index: build -> query must be bit-identical to the
in-memory cell-partitioned operator, and the serving scan must prune
unprobed cells at the partition level."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.operators.ann_index import (
    build_ivf_index,
    query_ivf_index,
)
from project_crypto_data_engineering_gcp_spark.operators.similarity import (
    ivf_topk_distributed,
)
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

from .conftest import SF_SMOKE

N_CELLS, N_PROBE, K, N_QUERIES = 16, 4, 5, 20


def test_persisted_index_matches_inmemory(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_cells=N_CELLS)

    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    served = query_ivf_index(
        spark, path, queries, k=K, n_probe=N_PROBE
    )
    direct = ivf_topk_distributed(
        emb,
        k=K,
        query_filter=F.col("vec_id") < N_QUERIES,
        n_cells=N_CELLS,
        n_probe=N_PROBE,
    )
    a = {tuple(r) for r in served.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b and len(a) == N_QUERIES * K


def test_persisted_index_prunes_unprobed_cells(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_cells=N_CELLS)

    served = query_ivf_index(
        spark,
        path,
        emb.filter(F.col("vec_id") < 2),  # few queries -> few probed cells
        k=K,
        n_probe=N_PROBE,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    # partition pruning surfaces as a PartitionFilters IN-list on cell
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters", 1)[1][:200]
    assert "cell" in seg
