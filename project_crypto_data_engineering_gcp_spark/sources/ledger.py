"""Ingest ledger: exactly-once file ingestion without mutating the source.

The reference marks raw files processed by RENAMING them
(`2-spark_processed_assats_list.py:69-87` — `X.json` -> `read_X.json`), a
protocol that mutates the landing zone and races concurrent readers. The
engine keeps an append-only parquet ledger of ingested source files
instead: new-file discovery is an anti-join of the current listing against
the ledger. Idempotent re-runs, no source mutation, and the same idea
scales to object stores (the listing is driver-side metadata, the
anti-join is on file paths — thousands of rows, broadcast).

The Structured Streaming file source + checkpoint (streaming/incremental)
is the fully-managed alternative; the ledger serves the batch path and
keeps ingestion auditable as a table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

LEDGER_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType(), False),
        T.StructField("ingested_at", T.TimestampType(), False),
        T.StructField("n_rows", T.LongType(), False),
    ]
)


def _ledger_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_ingest_ledger")


def read_ledger(spark: SparkSession, out_dir: str) -> DataFrame:
    path = _ledger_path(out_dir)
    try:
        return spark.read.schema(LEDGER_SCHEMA).parquet(path)
    except Exception:
        return spark.createDataFrame([], LEDGER_SCHEMA)


def filter_new_files(raw: DataFrame, ledger: DataFrame) -> DataFrame:
    """Keep only rows from files not yet in the ledger (left anti join on
    the path — broadcast-sized metadata)."""
    seen = F.broadcast(ledger.select(F.col("source_file").alias("_source_file")))
    return raw.join(seen, on="_source_file", how="left_anti")


def record_ingested(out_dir: str, per_file_counts: DataFrame) -> None:
    """Append (file, ts, rows) rows; call after the Silver write commits
    so a crash between write and record only ever re-processes (the Silver
    sink dedups on re-ingest via replay-stable snapshot identity)."""
    entries = per_file_counts.select(
        F.col("_source_file").alias("source_file"),
        F.current_timestamp().alias("ingested_at"),
        F.col("n_rows").cast("long").alias("n_rows"),
    )
    entries.write.mode("append").parquet(_ledger_path(out_dir))
