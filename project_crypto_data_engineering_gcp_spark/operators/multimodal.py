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


RESIZE_META_SCHEMA = (
    "doc_id long, width int, height int, channels int, "
    "target_w int, target_h int, scale_x double, scale_y double, "
    "n_bytes_out long"
)


def resize_media_meta(
    media: DataFrame, *, target_w: int, target_h: int, strict: bool = False
) -> DataFrame:
    """Resize plumbing: per payload, the (stub-)decoded source dimensions,
    the requested target box, the float scale factors a real resampler
    would apply, and the output byte budget (capped at the source size —
    the fake payload can't be upsampled). The actual pixel resample is the
    stubbed step; everything around it — Arrow batching, schema, the
    metadata arithmetic — is the real pipeline shape."""

    decode = _make_decode_stub(strict)  # local: ships by value (see above)

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode(p) for p in pdf["content"]]
            w = pd.Series([d[0] for d in dims], dtype="int32")
            h = pd.Series([d[1] for d in dims], dtype="int32")
            c = pd.Series([d[2] for d in dims], dtype="int32")
            n_bytes = pdf["content"].map(len).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w,
                    "height": h,
                    "channels": c,
                    "target_w": target_w,
                    "target_h": target_h,
                    "scale_x": (target_w / w.astype("float64")).round(6),
                    "scale_y": (target_h / h.astype("float64")).round(6),
                    "n_bytes_out": pd.concat(
                        [n_bytes, (target_w * target_h * c).astype("int64")], axis=1
                    ).min(axis=1),
                }
            )

    return media.mapInPandas(op, schema=RESIZE_META_SCHEMA)


N_HIST_BINS = 16


def byte_histogram(media: DataFrame) -> DataFrame:
    """Feature extraction over raw payload bytes: a {N_HIST_BINS}-bin
    byte-value histogram (high nibble), normalized densities — the cheap
    content-type / corruption signal computed before any codec runs.
    numpy ``bincount`` over the whole Arrow batch at once; no Python
    per-byte loop, no shuffle.

    Output is LONG format — one (doc_id, bin, n_in_bin, density) row per
    bin, all {N_HIST_BINS} bins emitted (zeros included) — so downstream
    aggregation, the driver's order-insensitive hash, and SQL oracles all
    work on scalar columns (array columns crash the driver canonicalizer,
    round-1 ERR). density = n_in_bin / n_bytes as a single IEEE double
    division of two exact ints — bit-identical in numpy, Spark, and
    DuckDB with NO rounding step (round() tie behavior differs between
    engines; plain division doesn't)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # self-contained closure: no package import

        bins = np.arange(N_HIST_BINS, dtype=np.int32)
        for pdf in batches:
            out_ids, out_bins, out_counts, out_bytes = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["content"]):
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                counts = np.bincount(arr >> 4, minlength=N_HIST_BINS)
                out_ids.append(np.full(N_HIST_BINS, doc_id, dtype=np.int64))
                out_bins.append(bins)
                out_counts.append(counts.astype(np.int64))
                out_bytes.append(np.full(N_HIST_BINS, len(arr), dtype=np.int64))
            if not out_ids:
                continue
            n_in_bin = np.concatenate(out_counts)
            n_bytes = np.concatenate(out_bytes)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(out_ids),
                    "n_bytes": n_bytes,
                    "bin": np.concatenate(out_bins),
                    "n_in_bin": n_in_bin,
                    "density": n_in_bin / np.maximum(n_bytes, 1),
                }
            )

    return media.mapInPandas(
        op,
        schema="doc_id long, n_bytes long, bin int, n_in_bin long, density double",
    )


def byte_histogram_arrow(media: DataFrame) -> DataFrame:
    """``byte_histogram`` on the zero-copy path: ``mapInArrow`` hands the
    worker raw Arrow RecordBatches, so payload bytes are read STRAIGHT
    from the BinaryArray's data buffer — no pandas materialization, no
    per-payload Python objects, and the whole batch's histogram is one
    vectorized ``np.add.at`` over (row-index, nibble) pairs instead of a
    per-row loop. Bit-identical output to :func:`byte_histogram`
    (tested); prefer this variant when payloads dominate the batch size.
    """

    def op(batches):
        import numpy as np
        import pyarrow as pa

        bins = np.arange(N_HIST_BINS, dtype=np.int32)
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            doc_id = rb.column(rb.schema.get_field_index("doc_id")).to_numpy(
                zero_copy_only=False
            )
            content = rb.column(rb.schema.get_field_index("content"))
            if isinstance(content, pa.ChunkedArray):  # pragma: no cover
                content = content.combine_chunks()
            # BinaryArray layout: buffers = [validity, int32 offsets, data]
            offsets = np.frombuffer(content.buffers()[1], dtype=np.int32)[
                content.offset : content.offset + n + 1
            ]
            data = np.frombuffer(content.buffers()[2], dtype=np.uint8)
            lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
            # nibble histogram for ALL rows at once: scatter-add on
            # (row, nibble) — no per-payload Python loop at all
            row_of_byte = np.repeat(np.arange(n), lengths)
            nibbles = data[offsets[0] : offsets[-1]] >> 4
            counts = np.zeros((n, N_HIST_BINS), dtype=np.int64)
            np.add.at(counts, (row_of_byte, nibbles), 1)
            n_bytes = np.repeat(lengths, N_HIST_BINS)
            flat = counts.reshape(-1)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(doc_id, N_HIST_BINS), pa.int64()),
                    pa.array(n_bytes, pa.int64()),
                    pa.array(np.tile(bins, n), pa.int32()),
                    pa.array(flat, pa.int64()),
                    pa.array(flat / np.maximum(n_bytes, 1), pa.float64()),
                ],
                names=["doc_id", "n_bytes", "bin", "n_in_bin", "density"],
            )

    return media.select("doc_id", "content").mapInArrow(
        op,
        schema="doc_id long, n_bytes long, bin int, n_in_bin long, density double",
    )


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
