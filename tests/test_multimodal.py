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


def test_binaryfile_media_ingestion(spark, tmp_path):
    """Real media ingestion path: binaryFile scan -> multimodal frame,
    with listing-level glob pruning, length pushdown, and the engine's
    stable 60-bit path hash as doc_id; the ingested frame feeds the same
    multimodal operators as the documents-derived one."""
    from project_crypto_data_engineering_gcp_spark.operators.multimodal import (
        extract_media_meta,
    )
    from project_crypto_data_engineering_gcp_spark.sources.media_source import (
        read_media_dir,
        write_media_fixture,
    )

    d = str(tmp_path / "media")
    write_media_fixture(
        d,
        {
            "a.jpg": b"\xff\xd8\xff" + b"x" * 64,
            "b.png": b"\x89PNG" + b"y" * 32,
            "c.wav": b"RIFF" + b"z" * 128,
            "notes.txt": b"not media",
        },
    )
    media = read_media_dir(spark, d, glob="*.{jpg,png,wav}")
    rows = {r["source_path"].rsplit("/", 1)[-1]: r for r in media.collect()}
    assert set(rows) == {"a.jpg", "b.png", "c.wav"}  # txt pruned at listing
    assert rows["a.jpg"]["media_type"] == "image/jpeg"
    assert rows["c.wav"]["media_type"] == "audio/wav"
    assert rows["b.png"]["n_bytes"] == 36
    assert bytes(rows["b.png"]["content"])[:4] == b"\x89PNG"
    assert len({r["doc_id"] for r in rows.values()}) == 3  # distinct stable ids

    # size pushdown: only files <= 50 bytes survive, and the filter is
    # applied on the file-index length, not after reading payloads
    small = read_media_dir(spark, d, glob="*.{jpg,png,wav}", max_bytes=50)
    assert {r["source_path"].rsplit("/", 1)[-1] for r in small.collect()} == {"b.png"}

    # the ingested frame drives the same operators as as_media_frame
    meta = extract_media_meta(media.select("doc_id", "content", "media_type"))
    assert meta.count() == 3
    assert {c for c in ("width", "height", "channels")} <= set(meta.columns)


def test_byte_histogram_arrow_matches_pandas_path(spark):
    """The zero-copy mapInArrow histogram must be bit-identical to the
    mapInPandas one (same long format, same IEEE densities)."""
    from project_crypto_data_engineering_gcp_spark.operators.multimodal import (
        byte_histogram,
        byte_histogram_arrow,
    )

    media = as_media_frame(load_table(spark, SF_SMOKE, "documents"))
    a = byte_histogram_arrow(media)
    b = byte_histogram(media)
    assert a.columns == b.columns
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() == b.count() > 0


def test_byte_histogram_handles_edge_payloads(spark):
    """Empty and non-ASCII payloads: zero-byte docs emit all-zero bins
    (density 0, not NaN); multi-byte UTF-8 counts raw bytes."""
    from project_crypto_data_engineering_gcp_spark.operators.multimodal import (
        N_HIST_BINS,
        byte_histogram,
        byte_histogram_arrow,
    )

    docs = spark.createDataFrame(
        [(1, ""), (2, "καλημέρα"), (3, "\x00\x7f")], "doc_id long, text string"
    )
    media = as_media_frame(docs)
    for fn in (byte_histogram, byte_histogram_arrow):
        rows = {(r["doc_id"], r["bin"]): r for r in fn(media).collect()}
        assert len(rows) == 3 * N_HIST_BINS
        assert all(rows[(1, b)]["n_in_bin"] == 0 for b in range(N_HIST_BINS))
        assert all(rows[(1, b)]["density"] == 0.0 for b in range(N_HIST_BINS))
        greek_bytes = "καλημέρα".encode("utf-8")
        assert sum(rows[(2, b)]["n_in_bin"] for b in range(N_HIST_BINS)) == len(greek_bytes)
        assert rows[(3, 0)]["n_in_bin"] == 1 and rows[(3, 7)]["n_in_bin"] == 1
