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
) -> DataFrame:
    """For each left row, attach ``payload`` columns from the latest right
    row with same ``on`` keys and ``right_ts <= left_ts`` (backward as-of,
    inclusive). Payload columns are suffixed; left rows with no prior right
    row get NULLs (left-outer semantics).

    Right-side ties on ``right_ts``: pass ``right_tiebreakers`` (ascending;
    the greatest wins, "most recently observed") to make the pick total —
    without them, tied reference rows resolve in partition order.
    """
    on = list(on)
    pay_cols = [f"{p}{suffix}" for p in payload]
    tb_cols = [f"__tb{i}" for i in range(len(right_tiebreakers))]

    lhs = left.select(
        *on,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_probe"),
        *[F.lit(None).cast(right.schema[t].dataType).alias(c)
          for t, c in zip(right_tiebreakers, tb_cols)],
        *[F.lit(None).cast(right.schema[p].dataType).alias(c) for p, c in zip(payload, pay_cols)],
        F.struct(*[c for c in left.columns]).alias("__row"),
    )
    rhs = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_probe"),
        *[F.col(t).alias(c) for t, c in zip(right_tiebreakers, tb_cols)],
        *[F.col(p).alias(c) for p, c in zip(payload, pay_cols)],
        F.lit(None).cast(lhs.schema["__row"].dataType).alias("__row"),
    )

    # reference rows sort before probe rows at equal ts (=> inclusive
    # match); tied reference rows order by the tiebreakers, so the
    # greatest-tiebreaker row is the last non-null the window carries
    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__ts").asc(),
            *[F.col(c).asc_nulls_last() for c in tb_cols],
            F.col("__is_probe").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "__is_probe",
        "__row",
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in pay_cols],
    )
    out = carried.filter(F.col("__is_probe") == 1).select("__row.*", *pay_cols)
    return out
