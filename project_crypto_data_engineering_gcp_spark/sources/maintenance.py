"""Table-layout maintenance: compaction + stats clustering.

Long-running ingest (the Silver append path, any streaming sink) breeds
small files: every micro-batch/partition write emits its own parquet
part, and a year of appends turns a table scan into millions of file
opens. ``compact_table`` is the maintenance pass a 100 TB lake schedules
per partition:

  * coalesce many small parts into ~``target_file_bytes`` files (fewer
    splits, fewer object-store requests, full scan bandwidth), and
  * ``sortWithinPartitions`` on the query keys, which CLUSTERS values so
    parquet row-group min/max stats become selective — a point/range
    filter then skips whole row groups instead of scanning everything.

The rewrite is atomic-by-rename: written to a staging dir, validated
(row count must match), then swapped in; a crash mid-compaction leaves
the live table untouched. On object stores the same protocol runs
against a manifest/table format (Delta/Iceberg OPTIMIZE); the parquet
form here keeps the engine dependency-free.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import SparkSession, functions as F


def table_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes of the table's data files (driver-side listing —
    metadata-sized, not data-sized)."""
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def compact_table(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 256 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Rewrite a parquet table into ~target-sized, optionally
    stats-clustered files. Returns the number of files after compaction.

    Scale notes: the repartition count derives from actual on-disk bytes
    (not row counts — rows vary wildly in width); the sort is WITHIN
    partitions only (no global sort / range exchange — clustering needs
    local order for row-group stats, not total order)."""
    size = table_bytes(spark, path)
    n_files = max(1, -(-size // target_file_bytes))  # ceil, >= 1

    df = spark.read.parquet(path)
    expected = df.count()
    out = df.repartition(n_files)
    if sort_cols:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_cols])

    staging = f"{path.rstrip('/')}__compact_{uuid.uuid4().hex[:8]}"
    out.write.mode("overwrite").parquet(staging)
    got = spark.read.parquet(staging).count()
    if got != expected:  # never swap in a bad rewrite
        shutil.rmtree(staging, ignore_errors=True)
        raise RuntimeError(
            f"compaction row-count mismatch for {path}: {expected} -> {got}"
        )
    backup = f"{path.rstrip('/')}__precompact_{uuid.uuid4().hex[:8]}"
    os.rename(path, backup)
    os.rename(staging, path)
    shutil.rmtree(backup)
    return sum(
        1
        for f in os.listdir(path)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def morton_col(a: str, b: str, *, bits: int = 16) -> "F.Column":
    """Z-order (Morton) interleave of two non-negative integer columns'
    low ``bits`` bits — the multi-dimensional clustering key for
    :func:`compact_table`: sorting by the Morton code keeps rows close
    in BOTH dimensions close in the file, so parquet row-group min/max
    stats prune point/range filters on EITHER column (the poor man's
    Delta/Iceberg Z-ORDER, as a pure JVM expression).

    Bit-interleave as a closed-form expression: sum over i of
    bit_i(a) << 2i | bit_i(b) << (2i+1) — 2*bits output bits."""
    code = F.lit(0).cast("long")
    ca, cb = F.col(a).cast("long"), F.col(b).cast("long")
    for i in range(bits):
        code = (
            code
            + (F.shiftright(ca, i).bitwiseAND(1) * F.lit(1 << (2 * i)))
            + (F.shiftright(cb, i).bitwiseAND(1) * F.lit(1 << (2 * i + 1)))
        )
    return code
