"""Persisted PQ codes index: the compressed serving tier must answer
bit-identically to the inline operator, and its query plan must read
only the codes + codebook artifacts for the corpus side (the 100 TB
point of PQ: original vectors never open at serve time)."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.operators.pq import (
    build_pq_index,
    query_pq_index,
)
from project_crypto_data_engineering_gcp_spark.plans.queries_similarity import (
    PQ_CODES,
    PQ_M,
    PQ_SUBDIM,
    TOPK_K,
    TOPK_QUERIES,
    sim_pq_topk,
)
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_persisted_pq_matches_inline(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=PQ_M, subdim=PQ_SUBDIM, n_codes=PQ_CODES)
    served = query_pq_index(
        spark,
        path,
        emb.filter(F.col("vec_id") < TOPK_QUERIES),
        m=PQ_M,
        subdim=PQ_SUBDIM,
        k=TOPK_K,
    )
    direct = sim_pq_topk(spark, SF_SMOKE)
    a = {tuple(r) for r in served.collect()}
    b = {tuple(r) for r in direct.collect()}
    assert a == b and len(a) == TOPK_QUERIES * TOPK_K


def test_persisted_pq_corpus_side_reads_only_codes(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    path = str(tmp_path / "pq")
    build_pq_index(emb, path, m=PQ_M, subdim=PQ_SUBDIM, n_codes=PQ_CODES)
    served = query_pq_index(
        spark,
        path,
        emb.filter(F.col("vec_id") < 2),
        m=PQ_M,
        subdim=PQ_SUBDIM,
        k=TOPK_K,
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        served.explain("formatted")
    plan = buf.getvalue()
    # exactly one embeddings scan: the 2 QUERY vectors (queries carry
    # their own embeddings by contract); the corpus side is codes-only
    assert plan.count("embeddings.parquet") == 1
    assert "codes" in plan and "_codebook" in plan
