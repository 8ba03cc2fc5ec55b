"""Skew-tolerant two-stage ("salted") aggregation.

A groupBy on a low-cardinality or hot-keyed column sends every row of a
hot key to one reducer — at 100 TB a single task ends up with the whole
key. Salting splits each key into ``salt_buckets`` sub-keys for a partial
aggregate, then re-aggregates the partials without the salt: two small
shuffles instead of one pathological one. The result is identical for
any aggregate with an associative merge (sum/count/min/max, and exact
decimal sums — the engine's money math — merge exactly).

AQE's skew-join handling covers JOIN skew at runtime; aggregation skew
on known-hot keys is where explicit salting still earns its keep.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    *,
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation: stage 1 groups on (keys + salt) computing
    ``partial_aggs`` (aliased); stage 2 groups on keys computing
    ``final_aggs`` over the partial columns.

    The salt is derived from a high-cardinality hash of the whole row's
    partition id + a monotonic id — cheap, uniform, and deterministic
    within a run (the FINAL result is independent of the salt values, so
    run-to-run determinism of the output is preserved)."""
    salted = df.withColumn(
        "__salt", (F.spark_partition_id() * 131071 + F.monotonically_increasing_id()) % salt_buckets
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    salt_buckets: int = 8,
) -> DataFrame:
    """Skew-split inner equi-join: the big side gets a per-row salt (same
    derivation as :func:`salted_aggregate` — result-independent), the
    small side is replicated ``salt_buckets`` ways via an exploded
    sequence, and the join runs on (keys + salt). A hot key's rows land
    on ``salt_buckets`` reducers instead of one; output is identical to
    the plain join, salt dropped.

    This is the static form of what AQE's skew-join does adaptively —
    it earns its keep when the skew is known ahead of time (a
    low-cardinality join key like an event type or country code), where
    splitting pre-shuffle beats detecting post-shuffle. Cost: the small
    side shuffles ``salt_buckets``x its size."""
    b = big.withColumn(
        "__salt",
        (F.spark_partition_id() * 131071 + F.monotonically_increasing_id())
        % salt_buckets,
    )
    s = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return b.join(s, on=[*on, "__salt"], how="inner").drop("__salt")
