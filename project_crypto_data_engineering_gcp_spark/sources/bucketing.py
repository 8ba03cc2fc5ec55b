"""Bucketed table storage: the durable twin of in-memory co-partitioning.

The r8 co-partitioning result (SCALE.md "PageRank co-partitioning
experiment") showed an ``InMemoryRelation`` of ``repartition(P, key) +
sortWithinPartitions(key)`` preserves Catalyst partitioning/ordering, so
iterative joins stop re-exchanging the loop-invariant side. That mode
pays a cache build per RUN and holds the frame in executor memory — at
100 TB the edge frame may not fit. ``bucketBy`` is the storage-level
answer (the real-cluster idiom the guide's "Partitioning & shuffle"
section names): pre-shuffle ONCE at write time, and every subsequent
read — cold, from any job — scans hash-bucketed files whose scan
reports the bucket distribution, letting sort-merge joins and
aggregations on the bucket key elide the Exchange entirely.

Spark constraint, documented: bucketed tables go through the session
catalog (``saveAsTable`` — a path-only ``parquet(path)`` write cannot
record bucket metadata), so these helpers take BOTH a table name and an
explicit ``path`` (external table: dropping the catalog entry keeps the
files). Readers must come back through ``spark.table(name)`` /
:func:`read_bucketed` — a raw ``spark.read.parquet(path)`` sees plain
files and forfeits the bucket distribution.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    *,
    buckets: int,
    key: str,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed parquet table: hash-bucketed
    into ``buckets`` files per partition on ``key`` and (by default)
    sorted by it within each bucket — the one-time shuffle that every
    later join/agg on ``key`` stops paying. Pick ``buckets`` like a
    shuffle partition count at the table's full scale (e.g. the
    cluster's parallelism), NOT per-increment: bucket count is fixed at
    creation for the table's lifetime."""
    writer = df.write.bucketBy(buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).mode(mode).format("parquet").saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table BY NAME — the catalog carries the bucket
    spec that makes downstream joins exchange-free."""
    return spark.table(name)


def register_bucketed(
    spark: SparkSession,
    name: str,
    path: str,
    *,
    buckets: int,
    key: str,
    sort: bool = True,
) -> DataFrame:
    """Register an EXISTING bucketed-table directory in this session's
    catalog and return it — the cross-session half of the contract: the
    files written by :func:`write_bucketed` outlive the writing
    session, but the bucket spec lives in the catalog, so a fresh job
    (the normal case on a cluster: write once, read from every
    subsequent job) must re-declare it. The (buckets, key, sort)
    arguments MUST match the write — a mismatched declaration makes
    Spark trust bucket pruning/distribution that the files do not
    satisfy, i.e. silent wrong results. Schema is inferred from the
    parquet files themselves.

    A PRE-EXISTING catalog entry under ``name`` is verified against the
    requested (buckets, key, location) and a mismatch raises — CREATE
    IF NOT EXISTS alone would silently keep a stale spec, which is
    exactly the wrong-results hazard above (code-review r9)."""
    schema = spark.read.parquet(path).schema
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    sorted_by = f"SORTED BY (`{key}`) " if sort else ""
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS `{name}` ({cols}) USING PARQUET"
        f" CLUSTERED BY (`{key}`) {sorted_by}INTO {buckets} BUCKETS"
        f" LOCATION '{path}'"
    )
    rows = spark.sql(f"DESCRIBE FORMATTED `{name}`").collect()
    meta = {r["col_name"]: r["data_type"] for r in rows}
    got_buckets = meta.get("Num Buckets", "").strip()
    got_key = meta.get("Bucket Columns", "").strip()
    got_sort = meta.get("Sort Columns", "").strip()
    got_loc = meta.get("Location", "").strip()
    want_loc = os.path.realpath(path)
    want_sort = f"[`{key}`]" if sort else "[]"
    # catalog column section = rows before the first blank separator
    got_cols = []
    for r in rows:
        if not r["col_name"].strip():
            break
        got_cols.append((r["col_name"], r["data_type"]))
    # name comparison is case-insensitive: a Hive metastore lowercases
    # column names in DESCRIBE output while the parquet schema keeps the
    # original case (code-review r9 pass 3)
    got_cols = [(n.lower(), t) for n, t in got_cols]
    want_cols = [(f.name.lower(), f.dataType.simpleString()) for f in schema]
    if (
        got_buckets != str(buckets)
        or got_key != f"[`{key}`]"
        or got_sort != want_sort  # a stale SORTED BY would let Spark
        # elide a sort the files don't satisfy (code-review r9 pass 2)
        or os.path.realpath(got_loc.removeprefix("file:")) != want_loc
        or got_cols != want_cols  # stale schema: files rewritten with
        # new/retyped columns under the same spec (same pass)
    ):
        raise ValueError(
            f"catalog already holds table {name!r} with a different"
            f" spec than requested/on-disk (buckets={got_buckets!r} vs"
            f" {buckets}, key={got_key!r} vs {key!r},"
            f" sort={got_sort!r} vs {want_sort!r},"
            f" location={got_loc!r} vs {want_loc!r},"
            f" columns={got_cols!r} vs {want_cols!r})"
            f" — trusting it would let Spark assume a distribution,"
            f" ordering, or schema the files do not satisfy;"
            f" drop_bucketed() the stale entry first"
        )
    return spark.table(name)


def bucketize_table(
    spark: SparkSession,
    path: str,
    out: str,
    name: str,
    *,
    buckets: int,
    key: str,
    sort: bool = True,
) -> int:
    """Convert a plain parquet table into a bucketed layout at ``out``
    (registered as ``name``) — the one-time pre-shuffle that makes every
    later join/agg on ``key`` exchange-free (the `compact --bucket-by`
    CLI maintenance action). Row-count-verified like
    ``maintenance.compact_table``: a bad rewrite raises and the catalog
    entry is dropped; the source is never touched. Returns the row
    count."""
    if buckets <= 0:
        raise ValueError(
            f"buckets must be positive, got {buckets} (fail before the"
            " full source scan, not inside saveAsTable after it)"
        )
    df = spark.read.parquet(path)
    expected = df.count()
    write_bucketed(df, name, out, buckets=buckets, key=key, sort=sort)
    got = spark.table(name).count()
    if got != expected:
        drop_bucketed(spark, name)
        raise RuntimeError(
            f"bucketize row-count mismatch for {path}: {expected} -> {got}"
        )
    return got


def drop_bucketed(spark: SparkSession, name: str) -> None:
    """Drop the catalog entry (external table: data files stay)."""
    spark.sql(f"DROP TABLE IF EXISTS {name}")
