"""Top-K and top/bottom-union operators — reference O3/O4.

Reference site: ``3-spark_curated_analytics_full.py:158-185`` (top-10
gainers ``orderBy desc + limit``, top-10 losers asc, ``unionAll``).

Scale: ``orderBy(...).limit(k)`` compiles to ``TakeOrderedAndProject`` —
each task keeps a k-row heap, the driver merges P*k rows; no global sort,
no full shuffle. This is the right physical shape at any scale for small k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """K rows by the given order — Catalyst's TakeOrderedAndProject."""
    return df.orderBy(*order).limit(k)


def top_bottom_union(
    df: DataFrame,
    metric: str,
    k: int,
    label_col: str,
    top_label: str,
    bottom_label: str,
    tiebreakers: Sequence[str] = (),
) -> DataFrame:
    """Top-k rows labeled ``top_label`` unioned with bottom-k labeled
    ``bottom_label`` (positional union, like the reference's unionAll).

    Tiebreakers (ascending) make both selections total orders so the
    k-row cut is deterministic under ties.
    """
    ties = [F.col(c).asc() for c in tiebreakers]
    top = top_k(df, [F.col(metric).desc(), *ties], k).withColumn(
        label_col, F.lit(top_label)
    )
    bottom = top_k(df, [F.col(metric).asc(), *ties], k).withColumn(
        label_col, F.lit(bottom_label)
    )
    return top.unionAll(bottom)
