"""Multimodal plumbing tests: the mapInPandas extractor's real fields
must agree with the expression-based query; the stubbed decode must be
deterministic and clearly refuse in strict mode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.operators.multimodal import (
    _decode_stub,
    as_media_frame,
    extract_media_meta,
)
from project_crypto_data_engineering_gcp_spark.plans.queries_multimodal import (
    mm_payload_meta,
)
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_mapinpandas_meta_matches_expression_meta(spark):
    media = as_media_frame(load_table(spark, SF_SMOKE, "documents"))
    via_pandas = extract_media_meta(media).select("doc_id", "n_bytes", "sha256")
    via_expr = mm_payload_meta(spark, SF_SMOKE).select("doc_id", "n_bytes", "sha256")
    assert via_pandas.exceptAll(via_expr).count() == 0
    assert via_expr.exceptAll(via_pandas).count() == 0


def test_decode_stub_deterministic_and_bounded(spark):
    media = as_media_frame(load_table(spark, SF_SMOKE, "documents"))
    a = extract_media_meta(media).orderBy("doc_id").collect()
    b = extract_media_meta(media).orderBy("doc_id").collect()
    assert a == b  # replay-stable fake decode
    for r in a[:50]:
        assert 16 <= r["width"] < 256 and 16 <= r["height"] < 256
        assert 1 <= r["channels"] <= 4


def test_decode_stub_strict_refuses():
    with pytest.raises(NotImplementedError):
        _decode_stub(b"payload", strict=True)


def test_frame_sample_offsets(spark):
    from project_crypto_data_engineering_gcp_spark.plans.queries_multimodal import (
        mm_frame_sample,
    )

    frames = mm_frame_sample(spark, SF_SMOKE)
    assert frames.filter(F.col("frame_offset") % 64 != 0).count() == 0
    assert frames.groupBy("doc_id").count().agg(F.max("count")).collect()[0][0] <= 4


def test_byte_histogram_matches_pure_python(spark):
    from collections import Counter

    from project_crypto_data_engineering_gcp_spark.operators.multimodal import (
        N_HIST_BINS,
        byte_histogram,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    media = as_media_frame(docs)
    got = {}
    for r in byte_histogram(media).collect():
        got.setdefault(r["doc_id"], {})[r["bin"]] = r
    for r in docs.select("doc_id", "text").limit(20).collect():
        payload = r["text"].encode("utf-8")
        counts = Counter(b >> 4 for b in payload)
        rows = got[r["doc_id"]]
        assert sorted(rows) == list(range(N_HIST_BINS))  # all bins, zeros too
        for i in range(N_HIST_BINS):
            row = rows[i]
            assert row["n_bytes"] == len(payload)
            assert row["n_in_bin"] == counts.get(i, 0)
            assert row["density"] == counts.get(i, 0) / len(payload)
        assert abs(sum(rows[i]["density"] for i in rows) - 1.0) < 1e-9
