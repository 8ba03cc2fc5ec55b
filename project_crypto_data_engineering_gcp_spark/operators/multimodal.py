"""Multimodal column operators: opaque ``binary`` payloads + typed metadata.

Design (BASELINE.json north star, "multimodal columns"): media travels as
an opaque ``binary`` column plus a typed metadata struct; all per-byte
work (decode, feature-extract, resize, frame-sample) runs as Arrow-batched
``mapInPandas`` so payload bytes never cross the JVM<->Python boundary
row-at-a-time. Schemas, partitioning behavior, UDF signatures, and batch
shapes are real and tested; the actual codec calls are STUBBED — this
container has no image/audio libraries — behind ``_decode_stub`` below:

  * with a real codec library installed, replace ``_decode_stub`` with the
    library call (the surrounding plumbing is unchanged);
  * until then it is a DETERMINISTIC FAKE: pseudo-dimensions derived from
    the payload's md5, so pipelines exercise realistic value distributions
    and stay replay-stable. It raises ``NotImplementedError`` when
    ``strict=True`` to make the stub impossible to mistake for a decoder.

Scale: payloads stay columnar (Arrow) end-to-end; a 100 TB corpus feeds
batches of ~10k rows per task with no driver involvement. Binary columns
compress poorly — production tables keep payloads in their own parquet
column chunk (automatic) and prune it unless selected (column pruning
makes metadata-only queries never touch the bytes).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, sha256 string, "
    "width int, height int, channels int"
)


def as_media_frame(docs: DataFrame, media_type: str = "image/fake") -> DataFrame:
    """Build a multimodal frame from the documents table: payload bytes =
    UTF-8 encoding of the text (stand-in for real media), plus media type.
    Real ingestion would read payload files via ``binaryFile`` format."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.lit(media_type).alias("media_type"),
    )


def _make_decode_stub(strict: bool = False):
    """Build the decode stub as a LOCAL function so cloudpickle ships it
    by value inside worker closures (no package import on workers).

    STUB — NOT a real decoder. Deterministic fake dimensions from the
    payload hash; swap for PIL/ffmpeg in a codec-equipped deployment."""

    def decode(payload: bytes) -> tuple[int, int, int]:
        import hashlib as _hashlib  # stdlib: importable on any worker

        if strict:
            raise NotImplementedError(
                "media decode requires a codec library not present in this "
                "environment; the stub provides deterministic fake metadata"
            )
        h = _hashlib.md5(payload).digest()
        return 16 + h[0] % 240, 16 + h[1] % 240, 1 + h[2] % 4

    return decode


def _decode_stub(payload: bytes, *, strict: bool = False) -> tuple[int, int, int]:
    """Driver-side convenience wrapper over :func:`_make_decode_stub`."""
    return _make_decode_stub(strict)(payload)


def extract_media_meta(media: DataFrame, *, strict: bool = False) -> DataFrame:
    """Decode/inspect payloads via Arrow-batched ``mapInPandas``: exact
    byte length + sha256 (real), dimensions (stubbed decode). One pass,
    partition-parallel, no shuffle."""

    # NOTE: the worker closure must be self-contained — referencing the
    # module-level _decode_stub would make cloudpickle serialize it by
    # reference, requiring this package on every worker's PYTHONPATH
    # (breaks when the host application put the repo on sys.path only).
    decode = _make_decode_stub(strict)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["content"]
            dims = [decode(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(len).astype("int64"),
                    "sha256": payloads.map(
                        lambda p: hashlib.sha256(p).hexdigest()
                    ),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "channels": pd.Series([d[2] for d in dims], dtype="int32"),
                }
            )

    return media.mapInPandas(op, schema=MEDIA_META_SCHEMA)


def sample_frames(
    media: DataFrame, *, n_frames: int = 4, frame_stride_bytes: int = 64
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emits ``n_frames``
    (doc_id, frame_idx, frame_offset, frame_bytes) rows per payload —
    offsets are evenly spaced, the per-frame byte slice is real; the
    decode of each slice would go through ``_decode_stub``'s replacement.
    Row-explosion stays JVM-side (posexplode over a sequence)."""
    return (
        media.select(
            "doc_id",
            F.octet_length("content").alias("n_bytes"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_frames - 1)),
                    lambda i: i * F.lit(frame_stride_bytes),
                )
            ).alias("frame_idx", "frame_offset"),
            F.col("content"),
        )
        .filter(F.col("frame_offset") < F.col("n_bytes"))
        .select(
            "doc_id",
            "frame_idx",
            "frame_offset",
            F.substring(
                F.col("content").cast("string"), F.col("frame_offset") + 1, frame_stride_bytes
            ).alias("frame_text"),
        )
    )
