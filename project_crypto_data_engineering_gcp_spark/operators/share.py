"""Share-of-total ("ratio to report") — reference A1/A4.

Reference site: ``3-spark_curated_analytics_full.py:204-209`` computes the
global SUM with ``collect()[0][0]`` and re-injects it via ``lit()`` — a
driver round-trip that serializes the job graph. This implementation keeps
the scalar on the executors: a 1-row exact-decimal aggregate is broadcast
cross-joined onto the fact rows, so the plan is
(partial agg -> final agg 1 row) + BroadcastNestedLoopJoin — no driver
data path, no second scan barrier beyond the aggregate itself.

Why not ``sum().over(Window.partitionBy())``: an empty-partition window
moves EVERY row into a single partition — a non-starter at 100 TB. The
broadcast-scalar form scales linearly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_share_of_total(
    df: DataFrame,
    value: str | Column,
    share_col: str = "share_pct",
    *,
    round_digits: int = 4,
    total_agg: Column | None = None,
) -> DataFrame:
    """Add ``share_col`` = value / SUM(value) * 100, rounded.

    ``total_agg`` overrides the default exact-decimal total (callers pass
    e.g. ``dsum("x", 18, 2)`` so the denominator is bit-deterministic;
    see functions/numeric.py for why that matters).
    """
    v = F.col(value) if isinstance(value, str) else value
    total = total_agg if total_agg is not None else F.sum(v).cast("double")
    totals = df.agg(total.alias("__total"))
    return (
        df.crossJoin(F.broadcast(totals))
        .withColumn(share_col, F.round(v / F.col("__total") * 100, round_digits))
        .drop("__total")
    )
