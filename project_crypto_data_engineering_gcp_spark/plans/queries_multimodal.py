"""Multimodal-column corpus queries (BASELINE.json north star).

The payload bytes here are UTF-8 text stand-ins (the container has no
codec libraries and the testdata has no real media), so the *byte-level*
operators — length, content hash, frame slicing — are real and
oracle-checked; the decode step is the documented stub in
operators/multimodal.py, exercised by the rows-only query + pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import as_media_frame, extract_media_meta, sample_frames
from ..sources.tables import load_table
from .corpus import corpus_query

FRAME_STRIDE = 64
N_FRAMES = 4


@corpus_query(
    "mm_payload_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           'image/fake' AS media_type
    FROM documents
    """,
)
def mm_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload hygiene scan, pure-expression form: exact byte
    length + content sha256 on the binary column. Column pruning means a
    metadata-only query like this never reads payload bytes it does not
    select at scale."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.octet_length("content").alias("n_bytes"),
        F.sha2("content", 256).alias("sha256"),
        "media_type",
    )


@corpus_query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id, frame_idx, frame_offset,
           substr(text, frame_offset + 1, {FRAME_STRIDE}) AS frame_text
    FROM (
        SELECT doc_id, text, unnest(range(0, {N_FRAMES})) AS frame_idx,
               unnest(range(0, {N_FRAMES})) * {FRAME_STRIDE} AS frame_offset
        FROM documents
    ) t
    WHERE frame_offset < octet_length(encode(text))
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video-like payloads): {N_FRAMES} evenly
    spaced byte offsets per payload, sliced JVM-side via posexplode —
    the row-explosion shape a real frame extractor would feed."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=N_FRAMES, frame_stride_bytes=FRAME_STRIDE)


@corpus_query("mm_media_meta_stub", oracle=None)
def mm_media_meta_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas metadata extraction with the STUBBED
    decode (deterministic fake dimensions — see operators/multimodal.py).
    No SQL oracle (Python-side decode); tests cross-check n_bytes/sha256
    against the expression-based mm_payload_meta."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return extract_media_meta(media)
