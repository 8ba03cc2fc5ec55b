"""Bloom-filter runtime pruning as pure DataFrame algebra.

Spark's own runtime row-group filtering builds a Bloom filter on a
join's build side and pushes it into the probe scan. This module
reifies the same idea as a composable operator, for plans where the
automatic rewrite doesn't fire (semi-joins assembled across pipeline
stages, persisted build sides, non-scan probes):

* ``bloom_bitmap`` folds the build keys into a FIXED-size bitmap
  relation — at most ``m_bits / 64`` rows of (bucket, 64-bit mask),
  regardless of build cardinality. 2^20 bits = 16,384 longs = 128 KiB
  broadcast, whether the build side has 10^4 or 10^9 keys. That fixed
  footprint is the whole point of a Bloom filter: an exact key set
  broadcast grows with the data; the bitmap does not.
* ``bloom_prune`` pre-filters the probe by a broadcast equi-join on
  the bucket plus a bitwise membership test. The surviving rows then
  flow into whatever exact join follows — at scale, the shuffle sees
  only survivors, which is where the win is (probe_rows x (1 - sel)
  rows never leave the scan stage).

No false negatives by construction (every build key's bit is OR-ed
into the bitmap), so a downstream EXACT join sees every true match —
the filter is semantically transparent, which is why corpus queries
composing it can be checked against a plain semi-join oracle. False
positives (bounded by ~n/m for the single-hash variant) cost only
wasted rows in the exact join, never wrong results.

Hashing uses Spark's native ``xxhash64`` — JVM-side, whole-stage
codegen — precisely because transparency means the oracle never needs
to reproduce the hash.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

DEFAULT_M_BITS = 1 << 20  # 128 KiB bitmap


def _bucket_and_bit(key: Column, m_bits: int) -> tuple[Column, Column]:
    h = F.pmod(F.xxhash64(key), F.lit(m_bits))
    return (h / 64).cast("long"), (h % 64).cast("int")


def bloom_bitmap(
    keys: DataFrame, key_col: str, m_bits: int = DEFAULT_M_BITS
) -> DataFrame:
    """Fold ``keys[key_col]`` into a (bucket, mask) bitmap relation with
    at most ``m_bits / 64`` rows. ``bit_or`` partial-aggregates map-side,
    so the build is one scan + one bounded shuffle."""
    bucket, bit = _bucket_and_bit(F.col(key_col), m_bits)
    return (
        keys.select(bucket.alias("bb_bucket"), bit.alias("bb_bit"))
        .groupBy("bb_bucket")
        .agg(F.bit_or(F.expr("shiftleft(CAST(1 AS BIGINT), bb_bit)")).alias("bb_mask"))
    )


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = DEFAULT_M_BITS,
) -> DataFrame:
    """Keep only probe rows whose key MIGHT be in the build set: broadcast
    the bitmap, equi-join on the bucket, test the bit. Probe columns pass
    through unchanged; rows hashing to an absent bucket or an unset bit
    are dropped before any downstream shuffle.

    The probe must not already carry the reserved internal columns
    (``bb_bucket``/``bb_bit``/``bb_mask``) — ``withColumn`` would
    silently REPLACE a same-named probe column and the final ``drop``
    would erase it, corrupting the caller's data without error."""
    reserved = {"bb_bucket", "bb_bit", "bb_mask"} & set(probe.columns)
    if reserved:  # ValueError, not assert: survives python -O
        raise ValueError(
            f"bloom_prune reserved column(s) {sorted(reserved)} present in probe"
        )
    bucket, bit = _bucket_and_bit(F.col(key_col), m_bits)
    probed = probe.withColumn("bb_bucket", bucket).withColumn("bb_bit", bit)
    return (
        probed.join(F.broadcast(bitmap), "bb_bucket", "inner")
        .filter(F.expr("(shiftright(bb_mask, bb_bit) & CAST(1 AS BIGINT)) = 1"))
        .drop("bb_bucket", "bb_bit", "bb_mask")
    )
