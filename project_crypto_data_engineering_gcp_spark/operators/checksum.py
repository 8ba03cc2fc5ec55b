"""Orderless bucketed table checksum: the O(1)-state equality pre-check.

``operators/diff.py::table_diff`` tells you exactly WHAT changed between
two snapshots, but it costs a full-outer join of both tables. At 100 TB
you want a gate that answers "did anything change, and roughly where?"
without ever shuffling one table against the other. The classic answer
is an orderless checksum: hash every row to a 60-bit integer, XOR the
hashes per key-bucket, and compare the two 16-row summaries. XOR is
commutative/associative with identity 0, so the aggregate is
map-combinable, order-independent, and insensitive to partitioning —
each side reduces to ``buckets`` rows of constant state in a single
scan, and the only join in the whole comparison is summary-vs-summary.

Bucketing by a hash OF THE KEY (not of the row) localizes a mismatch:
an edited row keeps its bucket, so the failing bucket names the key
range to hand to ``table_diff`` for the expensive row-level pass. Two
independently-salted row hashes are XOR'd side by side so a mismatch
must defeat both 60-bit spaces at once (a single 60-bit XOR can be
fooled by an even number of identical flips; the second salt makes the
coincidence astronomically unlikely).

The reference pipeline overwrites its serving tables on every trigger
(reference ``main.py``: append raw + overwrite trusted); this is the
capability that verifies a re-load reproduced the table without paying
for a diff.

Cross-engine: the row hash is the shared salted-md5 60-bit scheme
(functions/hashing.py), and both Spark and DuckDB provide a ``bit_xor``
aggregate over BIGINT, so the DuckDB oracle computes bit-identical
summaries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.hashing import md5_long

#: canonical column separator inside the row string; rows are rendered as
#: ``cast(col1 as string) || '|' || ...`` identically in both engines.
SEP = "|"


def table_checksum(
    df: DataFrame,
    keys: list[str],
    cols: list[str],
    *,
    buckets: int = 16,
    salt: str = "cksum-v1:",
) -> DataFrame:
    """Reduce ``df`` to ``buckets`` rows of orderless checksum state.

    Output columns: ``bucket`` (BIGINT in [0, buckets)), ``n_rows``
    (BIGINT), ``xor_h1`` / ``xor_h2`` (BIGINT XOR of two independently
    salted 60-bit row hashes). Two frames with identical (keys + cols)
    content produce identical summaries regardless of row order or
    partitioning.

    Columns are rendered with CAST(x AS STRING); callers must
    canonicalize floats/timestamps to integer or string forms first
    (the same doctrine every oracle-paired query follows). NULL renders
    as the literal ``\\N`` so NULL and ``''`` hash differently — in the
    bucket key too (concat_ws silently DROPS null segments, so the key
    columns are coalesced the same way as the row string; ADVICE r6).

    Known limitation, documented rather than escaped: string values
    containing the ``|`` separator (or a literal ``\\N``) can alias to
    the same rendered row as a different tuple — e.g. keys
    ``('a|b', 'c')`` and ``('a', 'b|c')``. The checksum is a
    change-detection gate, not a cryptographic commitment; callers whose
    key domains may contain ``|`` should pre-hash those columns (e.g.
    ``md5_long``) into collision-free surrogates first.
    """
    if not keys or not cols:
        raise ValueError("table_checksum: keys and cols must be non-empty")
    rendered = [
        F.coalesce(F.col(c).cast("string"), F.lit("\\N")) for c in keys + cols
    ]
    row_str = F.concat_ws(SEP, *rendered)
    key_str = F.concat_ws(
        SEP, *[F.coalesce(F.col(k).cast("string"), F.lit("\\N")) for k in keys]
    )
    return (
        df.select(
            F.pmod(md5_long(key_str, salt + "bk:"), F.lit(buckets))
            .cast("bigint")
            .alias("bucket"),
            md5_long(row_str, salt + "h1:").alias("h1"),
            md5_long(row_str, salt + "h2:").alias("h2"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.bit_xor("h1").alias("xor_h1"),
            F.bit_xor("h2").alias("xor_h2"),
        )
    )


def checksum_compare(
    summary_a: DataFrame, summary_b: DataFrame
) -> DataFrame:
    """Join two :func:`table_checksum` summaries into a per-bucket verdict.

    Output: ``bucket``, ``n_a``/``n_b`` (0 when the bucket is absent on a
    side), and ``bucket_match`` — true iff counts and both XOR states
    agree. The join is summary-vs-summary (``buckets`` rows a side):
    broadcast-sized by construction no matter how large the inputs were.
    """
    a = summary_a.select(
        "bucket",
        F.col("n_rows").alias("n_a"),
        F.col("xor_h1").alias("x1_a"),
        F.col("xor_h2").alias("x2_a"),
    )
    b = summary_b.select(
        "bucket",
        F.col("n_rows").alias("n_b"),
        F.col("xor_h1").alias("x1_b"),
        F.col("xor_h2").alias("x2_b"),
    )
    j = a.join(b, "bucket", "full_outer")
    zero = F.lit(0).cast("bigint")
    return j.select(
        "bucket",
        F.coalesce("n_a", zero).alias("n_a"),
        F.coalesce("n_b", zero).alias("n_b"),
        (
            F.coalesce("n_a", zero).eqNullSafe(F.coalesce("n_b", zero))
            & F.coalesce("x1_a", zero).eqNullSafe(F.coalesce("x1_b", zero))
            & F.coalesce("x2_a", zero).eqNullSafe(F.coalesce("x2_b", zero))
        ).alias("bucket_match"),
    )
