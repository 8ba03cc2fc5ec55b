"""Python UDTF demonstrator vs the JVM fast path.

The UDTF chunker must be row-for-row identical to
curate_chunk_overlap's expression form (which is DuckDB-oracle-checked,
so equality here makes the UDTF transitively exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.udtf_chunker import (
    register_chunk_udtf,
)
from project_crypto_data_engineering_gcp_spark.plans.corpus import get_query
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def test_udtf_matches_jvm_chunker(spark):
    name = register_chunk_udtf(spark)
    docs = load_table(spark, SF_ORACLE, "documents").limit(300)
    docs.createOrReplaceTempView("sg_udtf_docs")
    got = spark.sql(
        f"""SELECT d.doc_id, c.chunk_idx, c.chunk_text, c.n_tokens
            FROM sg_udtf_docs d, LATERAL {name}(d.text) c"""
    )
    want = (
        get_query("curate_chunk_overlap")
        .fn(spark, SF_ORACLE)
        .join(docs.select("doc_id"), "doc_id", "left_semi")
    )
    key = ["doc_id", "chunk_idx"]
    assert got.count() == want.count()
    mism = (
        got.join(want.withColumnRenamed("chunk_text", "w_text")
                 .withColumnRenamed("n_tokens", "w_n"), key)
        .filter(
            (F.col("chunk_text") != F.col("w_text"))
            | (F.col("n_tokens") != F.col("w_n"))
        )
        .count()
    )
    assert mism == 0


def test_udtf_registration_returns_name(spark):
    assert register_chunk_udtf(spark, "sg_chunk2") == "sg_chunk2"


def test_udtf_constants_lock_step():
    """The UDTF's size/stride must stay in lock-step with the canonical
    curate_chunk_overlap constants — structural pin so a retune of one
    side fails fast here, not only via output drift."""
    from project_crypto_data_engineering_gcp_spark.functions import (
        udtf_chunker,
    )
    from project_crypto_data_engineering_gcp_spark.plans import (
        queries_curation,
    )

    assert udtf_chunker.CHUNK_SIZE == queries_curation.CHUNK_SIZE
    assert udtf_chunker.CHUNK_STRIDE == queries_curation.CHUNK_STRIDE
