"""Scale-safe global ROW_NUMBER: range-partition + partition-offset.

A plain ``ROW_NUMBER() OVER (ORDER BY ...)`` (no PARTITION BY) funnels
the entire input through ONE window task — the classic single-partition
chokepoint that works at sf0.1 and dies on a 1000-executor cluster.
``global_rank`` produces the identical rank column with every stage
parallel:

1. ``repartitionByRange`` on the order columns — contiguous, sorted key
   ranges per partition (Spark samples boundaries; equal keys land in
   one partition, and our callers always include a unique tiebreaker so
   the order is strict).
2. rank WITHIN each range partition — a window PARTITIONED by the
   captured ``spark_partition_id`` (parallel, no global funnel).
3. add the number of rows in all PRECEDING range partitions — computed
   from the tiny per-partition count frame (``<= num_partitions`` rows)
   with a triangular self-join (no window at all, no driver collect)
   and broadcast back.

Cost: one range shuffle + one hash shuffle on the partition id, both
parallel. The triangular join is O(P^2) on a P-row frame where P is the
partition COUNT (a config constant), never data-sized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "__gr_pid"
_CNT = "__gr_cnt"
_OFF = "__gr_off"


def _check_reserved(df: DataFrame, rank_col: str, op: str) -> None:
    """Caller-contract guard. ValueError, not assert: a bare assert is
    stripped under ``python -O``, silently restoring the data-corruption
    path (reserved/rank column collisions produce wrong ranks, not
    errors)."""
    for reserved in (_PID, _CNT, _OFF):
        if reserved in df.columns:
            raise ValueError(f"{op}: reserved column {reserved!r} already present")
    if rank_col in df.columns:
        raise ValueError(f"{op}: rank_col {rank_col!r} already present")


def global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = global ROW_NUMBER under ``order_cols``.

    ``order_cols`` must define a STRICT total order (include a unique
    tiebreaker) — equal keys would otherwise be ranked by an arbitrary
    within-partition order. All other columns pass through unchanged.
    """
    _check_reserved(df, rank_col, "global_rank")

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # Materialize the pid-tagged frame ONCE (kcore_peel discipline): the
    # counts branch and the ranked branch below would otherwise compile
    # to independent range-shuffle exchanges, leaving __gr_pid
    # consistency to Spark's runtime stage reuse + deterministic range
    # sampling — correct today but an implicit invariant, and two
    # redundant range shuffles per call.
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False  # lazy: same plan cut + persist-backed single
        # evaluation (both branches scan the SAME compiled RDD, so pid
        # consistency holds); materialization rides the caller's action
        # instead of a dedicated driver-blocking job here (r12)
    )

    counts = tagged.groupBy(_PID).agg(F.count(F.lit(1)).alias(_CNT))
    a, b = counts.alias("a"), counts.alias("b")
    offsets = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.coalesce(F.sum(f"b.{_CNT}"), F.lit(0)).alias(_OFF))
    )

    w = Window.partitionBy(_PID).orderBy(*order_cols)
    return (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(rank_col, (F.col(_OFF) + F.row_number().over(w)).cast("bigint"))
        .drop(_PID, _OFF)
    )


def grouped_global_rank(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    rank_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``rank_col`` = ROW_NUMBER within each ``group_cols`` group
    under ``order_cols`` — WITHOUT partitioning the window by the group
    (a low-cardinality group column would funnel data-sized groups
    through one task each; 5 priorities over a 100 TB fact table is 5
    tasks). Same machinery as global_rank with the group prefixed to the
    range key: range-partition on (group, order), rank within each range
    partition RESTARTING per group, and add the count of rows in the
    same group in preceding partitions (per-(partition, group) counts —
    at most P x |groups-touching-2-partitions| rows, still bounded by
    the partition count since ranges are contiguous)."""
    _check_reserved(df, rank_col, "grouped_global_rank")

    keys = [*group_cols, *order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    # single evaluation of the pid tagging — see global_rank
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False  # lazy: same plan cut + persist-backed single
        # evaluation (both branches scan the SAME compiled RDD, so pid
        # consistency holds); materialization rides the caller's action
        # instead of a dedicated driver-blocking job here (r12)
    )

    counts = tagged.groupBy(_PID, *group_cols).agg(
        F.count(F.lit(1)).alias(_CNT)
    )
    a, b = counts.alias("a"), counts.alias("b")
    same_group = [
        F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}")) for g in group_cols
    ]
    cond = F.col(f"b.{_PID}") < F.col(f"a.{_PID}")
    for c in same_group:
        cond = cond & c
    offsets = (
        a.join(b, cond, "left")
        .groupBy(
            F.col(f"a.{_PID}").alias(_PID),
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
        )
        .agg(F.coalesce(F.sum(f"b.{_CNT}"), F.lit(0)).alias(_OFF))
    )

    # NULL-SAFE final join: a plain name-based equi-join would silently
    # DROP every row whose group key is NULL (NULL = NULL never matches)
    # even though the offsets were computed null-safely above — the join
    # condition must use eqNullSafe end to end so NULL groups rank as
    # their own group, exactly like ROW_NUMBER() PARTITION BY does.
    t, o = tagged.alias("t"), offsets.alias("o")
    jcond = F.col(f"t.{_PID}") == F.col(f"o.{_PID}")
    for g in group_cols:
        jcond = jcond & F.col(f"t.{g}").eqNullSafe(F.col(f"o.{g}"))
    w = Window.partitionBy(_PID, *group_cols).orderBy(*order_cols)
    return (
        t.join(F.broadcast(o), jcond)
        .select("t.*", f"o.{_OFF}")
        .withColumn(rank_col, (F.col(_OFF) + F.row_number().over(w)).cast("bigint"))
        .drop(_PID, _OFF)
    )


def _null_aware_cum(off: Column, win: Column) -> Column:
    """SQL running-SUM NULL semantics for the offset + within-partition
    split: SUM() OVER ignores NULL inputs and is NULL only while NO
    non-null value has been seen yet. The partition offset is kept
    UN-coalesced (NULL iff no prior partition contributed a non-null
    partial), so the cumulative is NULL iff offset AND window sum are
    both NULL; otherwise missing sides contribute 0. A blanket
    ``coalesce(off, 0) + win`` would instead return NULL for any row
    whose range partition OPENS with a run of NULLs even when preceding
    partitions carried real values (r10 advisor finding)."""
    return F.when(off.isNull() & win.isNull(), F.lit(None)).otherwise(
        F.coalesce(off, F.lit(0)) + F.coalesce(win, F.lit(0))
    )


def global_prefix_sum(
    df: DataFrame,
    order_cols: list[Column | str],
    sum_cols: list[str],
    num_partitions: int | None = None,
    prefix: str = "cum_",
) -> DataFrame:
    """Append ``{prefix}{c}`` = inclusive running SUM of each ``sum_cols``
    under the global ``order_cols`` order — the distributed SCAN
    primitive, built exactly like :func:`global_rank`: range-partition,
    per-partition running sums under a pid-partitioned window (parallel),
    plus the total of all preceding partitions from the tiny per-partition
    sums frame (triangular join, broadcast back).

    ``order_cols`` must define a STRICT total order. A plain
    ``SUM() OVER (ORDER BY ...)`` funnels the input through one window
    task; this keeps every stage parallel, which is what running totals,
    CDFs, and offset/packing computations need at 100 TB. NULL values in
    ``sum_cols`` follow SQL SUM() OVER semantics exactly (ignored by the
    sum; the running value is NULL only before the first non-null) —
    see :func:`_null_aware_cum`.
    """
    _check_reserved(df, prefix + sum_cols[0], "global_prefix_sum")
    for c in sum_cols:
        if prefix + c in df.columns:
            raise ValueError(
                f"global_prefix_sum: output column {prefix + c!r} already present"
            )

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # single evaluation of the pid tagging — see global_rank
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False  # lazy: same plan cut + persist-backed single
        # evaluation (both branches scan the SAME compiled RDD, so pid
        # consistency holds); materialization rides the caller's action
        # instead of a dedicated driver-blocking job here (r12)
    )

    parts = tagged.groupBy(_PID).agg(
        *[F.sum(c).alias(f"{_CNT}{c}") for c in sum_cols]
    )
    a, b = parts.alias("a"), parts.alias("b")
    # offsets stay UN-coalesced: NULL iff no preceding partition carries
    # a non-null partial (SUM over an empty/all-NULL set) — the
    # null-aware combine below needs that distinction
    offsets = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(*[F.sum(f"b.{_CNT}{c}").alias(f"{_OFF}{c}") for c in sum_cols])
    )

    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.join(F.broadcast(offsets), _PID)
    for c in sum_cols:
        out = out.withColumn(
            prefix + c, _null_aware_cum(F.col(f"{_OFF}{c}"), F.sum(c).over(w))
        )
    return out.drop(_PID, *[f"{_OFF}{c}" for c in sum_cols])


def grouped_global_prefix_sum(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    sum_cols: list[str],
    num_partitions: int | None = None,
    prefix: str = "cum_",
) -> DataFrame:
    """Append ``{prefix}{c}`` = inclusive running SUM of each
    ``sum_cols`` within each ``group_cols`` group under ``order_cols``
    — WITHOUT partitioning the window by the group (a low-cardinality
    group would funnel data-sized groups through one task each: 25
    brands over a 100 TB pre-aggregate is 25 tasks). The grouped twin
    of :func:`global_prefix_sum`, built like :func:`grouped_global_rank`:
    range-partition on (group, order), run the prefix window RESTARTING
    per group within each range partition, and add the same-group sums
    from preceding partitions (per-(partition, group) partials —
    bounded by the partition count, since ranges are contiguous).
    ``order_cols`` must be a strict total order within each group.
    NULLs in ``sum_cols`` follow SQL SUM() OVER semantics (ignored;
    running value NULL only before the group's first non-null) — see
    :func:`_null_aware_cum`.

    Measured tradeoff (SCALE.md r10 sweep): the eager localCheckpoint
    is DATA-SIZED, so when the consumer only needs to LOCATE a
    cumulative boundary (median/quantile), domain-bounded bucket
    refinement beats this operator decisively (20 s vs 507 s at x100).
    Reach for it only when every row needs its prefix value (running
    totals, CDF columns, packing offsets) AND the group count is too
    small for a partitioned window to parallelize."""
    for c in sum_cols:
        if prefix + c in df.columns:
            raise ValueError(
                f"grouped_global_prefix_sum: output column "
                f"{prefix + c!r} already present"
            )
    _check_reserved(df, prefix + sum_cols[0], "grouped_global_prefix_sum")

    keys = [*group_cols, *order_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *keys)
        if num_partitions
        else df.repartitionByRange(*keys)
    )
    # single evaluation of the pid tagging — see global_rank
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False  # lazy: same plan cut + persist-backed single
        # evaluation (both branches scan the SAME compiled RDD, so pid
        # consistency holds); materialization rides the caller's action
        # instead of a dedicated driver-blocking job here (r12)
    )

    parts = tagged.groupBy(_PID, *group_cols).agg(
        *[F.sum(c).alias(f"{_CNT}{c}") for c in sum_cols]
    )
    a, b = parts.alias("a"), parts.alias("b")
    cond = F.col(f"b.{_PID}") < F.col(f"a.{_PID}")
    for g in group_cols:
        cond = cond & F.col(f"a.{g}").eqNullSafe(F.col(f"b.{g}"))
    # UN-coalesced offsets — see global_prefix_sum / _null_aware_cum
    offsets = (
        a.join(b, cond, "left")
        .groupBy(
            F.col(f"a.{_PID}").alias(_PID),
            *[F.col(f"a.{g}").alias(g) for g in group_cols],
        )
        .agg(*[F.sum(f"b.{_CNT}{c}").alias(f"{_OFF}{c}") for c in sum_cols])
    )

    # NULL-SAFE final join — see grouped_global_rank
    t, o = tagged.alias("t"), offsets.alias("o")
    jcond = F.col(f"t.{_PID}") == F.col(f"o.{_PID}")
    for g in group_cols:
        jcond = jcond & F.col(f"t.{g}").eqNullSafe(F.col(f"o.{g}"))
    w = (
        Window.partitionBy(_PID, *group_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = t.join(F.broadcast(o), jcond).select(
        "t.*", *[f"o.{_OFF}{c}" for c in sum_cols]
    )
    for c in sum_cols:
        out = out.withColumn(
            prefix + c, _null_aware_cum(F.col(f"{_OFF}{c}"), F.sum(c).over(w))
        )
    return out.drop(_PID, *[f"{_OFF}{c}" for c in sum_cols])


def global_prefix_min(
    df: DataFrame,
    order_cols: list[Column | str],
    min_col: str,
    out_col: str = "prefix_min",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``out_col`` = EXCLUSIVE running MIN of ``min_col`` over all
    STRICTLY PRECEDING rows under the global ``order_cols`` order (NULL
    for the first row) — the scan primitive skyline/dominance queries
    need, built exactly like :func:`global_prefix_sum`: range-partition,
    per-partition exclusive running min under a pid-partitioned window
    (parallel), combined with the min over all PRECEDING partitions from
    the tiny per-partition minima frame (triangular join, broadcast
    back). min is commutative/idempotent, so the exclusive-within ⊕
    preceding-partitions split is exact.

    ``order_cols`` must define a STRICT total order (unique tiebreaker).
    """
    _check_reserved(df, out_col, "global_prefix_min")

    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        if num_partitions
        else df.repartitionByRange(*order_cols)
    )
    # single evaluation of the pid tagging — see global_rank
    tagged = ranged.withColumn(_PID, F.spark_partition_id()).localCheckpoint(
        eager=False  # lazy: same plan cut + persist-backed single
        # evaluation (both branches scan the SAME compiled RDD, so pid
        # consistency holds); materialization rides the caller's action
        # instead of a dedicated driver-blocking job here (r12)
    )

    parts = tagged.groupBy(_PID).agg(F.min(min_col).alias(_CNT))
    a, b = parts.alias("a"), parts.alias("b")
    offsets = (
        a.join(b, F.col(f"b.{_PID}") < F.col(f"a.{_PID}"), "left")
        .groupBy(F.col(f"a.{_PID}").alias(_PID))
        .agg(F.min(f"b.{_CNT}").alias(_OFF))  # NULL for partition 0
    )

    w = (
        Window.partitionBy(_PID)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.least(F.min(min_col).over(w), F.col(_OFF)))
        .drop(_PID, _OFF)
    )


def _idiv(a: Column, b: Column) -> Column:
    """Exact floor-division of non-negative INTEGER columns of any
    magnitude: ``(a - pmod(a, b)) / b`` in DECIMAL(38,0) — the dividend
    is made exactly divisible first, so the decimal division's result is
    an integer representable at any scale (no double rounding, unlike a
    plain ``(a / b).cast('bigint')`` which goes through IEEE double and
    loses exactness past 2^53)."""
    a38 = a.cast("decimal(38,0)")
    b38 = b.cast("decimal(38,0)")
    return ((a38 - F.pmod(a38, b38)) / b38).cast("bigint")


def ntile_from_rank(rank: Column, n_rows: Column, n_buckets: int) -> Column:
    """SQL ``NTILE(n_buckets)`` bucket from a 1-based global rank and the
    total row count (a broadcast 1-row aggregate, never a collect).

    NTILE semantics: with ``q = N div n`` and ``r = N mod n``, the first
    ``r`` buckets hold ``q+1`` rows and the rest hold ``q`` — exact
    integer arithmetic end to end (``_idiv``: decimal floor-division, no
    IEEE-double detour), so buckets match any engine's NTILE bit-for-bit
    at ANY row count, including past 2^53.
    """
    q = _idiv(n_rows, F.lit(n_buckets))
    r = n_rows % n_buckets
    big = r * (q + 1)  # rows covered by the size-(q+1) buckets
    return (
        F.when(rank <= big, _idiv(rank - 1, q + 1) + 1)
        .otherwise(r + _idiv(rank - big - 1, F.greatest(q, F.lit(1))) + 1)
        .cast("int")
    )
