"""Binary media ingestion via Spark's ``binaryFile`` source.

The multimodal operators (operators/multimodal.py) consume an opaque
``content: binary`` column plus typed metadata. In the corpus queries that
frame is derived from the documents table (``as_media_frame``); THIS module
is the real ingestion path for media lakes: ``spark.read.format
("binaryFile")`` scans a directory tree of image/audio/video files into
(path, modificationTime, length, content) rows — distributed, predicate-
pushable on path/length, and with the payload readable lazily per row
group.

Scale: binaryFile splits by FILE (one row per file, files never split
across tasks), so a 100 TB media lake parallelizes by file count;
``pathGlobFilter`` prunes by extension at the listing level and
``spark.sql.files.maxPartitionBytes`` groups small files per task. The
payload column prunes away for metadata-only queries exactly like any
other parquet column once persisted.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# extension -> media type for the typed-metadata column; opaque payloads
# carry their container type, decode is the operators' concern
MEDIA_TYPES = {
    ".jpg": "image/jpeg",
    ".jpeg": "image/jpeg",
    ".png": "image/png",
    ".gif": "image/gif",
    ".wav": "audio/wav",
    ".mp3": "audio/mpeg",
    ".mp4": "video/mp4",
    ".mkv": "video/x-matroska",
    ".bin": "application/octet-stream",
}


def media_type_col(path: str = "path") -> F.Column:
    """Map a file path to its media type via extension (JVM expression —
    a CASE chain over lower-cased suffix matches, no UDF)."""
    lowered = F.lower(F.col(path))
    expr = F.lit("application/octet-stream")
    # build the CASE chain in reverse so earlier entries win
    for ext, mtype in reversed(list(MEDIA_TYPES.items())):
        expr = F.when(lowered.endswith(ext), F.lit(mtype)).otherwise(expr)
    return expr


def read_media_dir(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    max_bytes: int | None = None,
) -> DataFrame:
    """Scan a media directory into the engine's multimodal frame:
    (doc_id, content, media_type, source_path, n_bytes, modified_at).

    ``glob`` prunes files at LISTING time (pathGlobFilter — cheaper than
    a post-scan filter); ``max_bytes`` pushes a length predicate down to
    the file index so oversized payloads are never read. doc_id is a
    60-bit hash of the path — stable across re-ingestions, join-able
    with the md5 scheme used everywhere else in the engine."""
    from ..functions.hashing import md5_long

    reader = spark.read.format("binaryFile")
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    if max_bytes is not None:
        df = df.filter(F.col("length") <= max_bytes)
    return df.select(
        md5_long("path").alias("doc_id"),
        "content",
        media_type_col("path").alias("media_type"),
        F.col("path").alias("source_path"),
        F.col("length").alias("n_bytes"),
        F.col("modificationTime").alias("modified_at"),
    )


def write_media_fixture(dirpath: str, payloads: dict[str, bytes]) -> None:
    """Test helper: materialize named payloads as files."""
    os.makedirs(dirpath, exist_ok=True)
    for name, data in payloads.items():
        with open(os.path.join(dirpath, name), "wb") as f:
            f.write(data)
