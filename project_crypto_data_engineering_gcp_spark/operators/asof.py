"""As-of (point-in-time) join — superset operator (SURVEY §2.3 notes the
reference's W1 dedup is the degenerate "as-of latest" case).

Spark has no native ASOF JOIN; the scalable composition used here is the
union-tag + window trick:

  1. tag left rows (probe) and right rows (reference) and union them on a
     common schema,
  2. one hash shuffle on the join keys, sort by (ts, tag) within key,
  3. ``last(right_payload, ignorenulls=True)`` over rows-unbounded-preceding
     carries the most recent reference row forward onto each probe row,
  4. filter back to probe rows.

Cost: ONE shuffle of (left + right) on the key — same as a regular
sort-merge join, with no range-explosion. This beats per-key
``applyInPandas``+``pd.merge_asof`` (Python/Arrow transfer of all data) and
beats range-bucketed equi-join (duplication factor) for dense reference
streams. Skewed keys are handled by AQE; a 100 TB run would additionally
pre-bucket both sides on the key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    *,
    suffix: str = "_asof",
    right_tiebreakers: Sequence[str] = (),
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the nearest
    right row with the same ``on`` keys (left-outer semantics; NULLs when
    no match):

      * ``direction="backward"`` (default): latest right row with
        ``right_ts <= left_ts``; ties on ``right_ts`` resolve to the
        GREATEST ``right_tiebreakers`` ("most recently observed").
      * ``direction="forward"``: earliest right row with
        ``right_ts >= left_ts``; ties resolve to the SMALLEST
        tiebreakers ("first following").

    ``tolerance_seconds`` bounds the match distance (pandas
    ``merge_asof(tolerance=...)``): a carried reference further than the
    tolerance yields NULL payloads instead. Same single-shuffle plan —
    the tolerance is a post-carry mask, not a join-condition explosion.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    on = list(on)
    pay_cols = [f"{p}{suffix}" for p in payload]
    tb_cols = [f"__tb{i}" for i in range(len(right_tiebreakers))]

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__ref_ts"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(c)
          for t, c in zip(right_tiebreakers, tb_cols)],
        *[F.lit(None).cast(right.schema[p].dataType).alias(c) for p, c in zip(payload, pay_cols)],
        F.struct(*[c for c in left.columns]).alias("__row"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        F.col(right_ts).alias("__ref_ts"),
        *[F.col(t).alias(c) for t, c in zip(right_tiebreakers, tb_cols)],
        *[F.col(p).alias(c) for p, c in zip(payload, pay_cols)],
        F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
    )

    # reference rows sort before probe rows at equal ts (=> inclusive
    # match). Backward: ascending scan, tied refs ascending so the
    # greatest-tiebreaker row is the last carried. Forward: descending
    # scan (the carry then holds the EARLIEST following ref), tied refs
    # descending so the smallest-tiebreaker row is the last carried.
    if direction == "backward":
        order = [
            F.col("__ts").asc(),
            *[F.col(c).asc_nulls_last() for c in tb_cols],
            F.col("__is_probe").asc(),
        ]
    else:
        order = [
            F.col("__ts").desc(),
            *[F.col(c).desc_nulls_last() for c in tb_cols],
            F.col("__is_probe").asc(),
        ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__is_probe",
        "__row",
        "__ts",
        F.last("__ref_ts", ignorenulls=True).over(w).alias("__m_ts"),
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in pay_cols],
    )
    if tolerance_seconds is not None:
        from pyspark.sql.types import TimestampNTZType, TimestampType

        if isinstance(
            right.schema[right_ts].dataType, (TimestampType, TimestampNTZType)
        ):
            probe_v = F.unix_micros(F.col("__ts"))
            match_v = F.unix_micros(F.col("__m_ts"))
            tol = F.lit(int(round(tolerance_seconds * 1_000_000)))
        else:  # numeric event-time axis: tolerance in the same unit
            probe_v = F.col("__ts")
            match_v = F.col("__m_ts")
            tol = F.lit(tolerance_seconds)
        dist = (
            probe_v - match_v if direction == "backward" else match_v - probe_v
        )
        within = F.col("__m_ts").isNotNull() & (dist <= tol)
        carried = carried.select(
            "__is_probe",
            "__row",
            *[F.when(within, F.col(c)).alias(c) for c in pay_cols],
        )
    out = carried.filter(F.col("__is_probe") == 1).select("__row.*", *pay_cols)
    return out
