"""2-D skyline (Pareto frontier) as a single sort-scan window pass.

A row dominates another when it is <= on the minimized column, >= on the
maximized column, and strictly better on at least one. The frontier is
the un-dominated set. The textbook formulation is a quadratic
NOT-EXISTS self-join; for two dimensions there is an O(n log n) plan:

  1. collapse to max(maximize_col) per distinct minimize_col value
     (hash aggregate — fact-table-sized input, dimension-sized output),
  2. one window over the ordered distinct values: running max over
     strictly-smaller values (``cum_lt``) and over <= values
     (``cum_le``),
  3. a row is on the frontier iff it beats every strictly-cheaper group
     (value > cum_lt, or no cheaper group exists) and nothing at its own
     price level is strictly better (value == cum_le).

The window is unpartitioned but consumes the distinct-value aggregate,
not the input relation; if that domain itself outgrew one partition, the
prefix-max is associative and splits into per-range maxima + a prefix
pass over range boundaries. Ties on both columns are kept (neither row
dominates the other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def pareto_frontier_2d(
    df: DataFrame, minimize_col: str, maximize_col: str
) -> DataFrame:
    """Rows of ``df`` not dominated on (``minimize_col`` low,
    ``maximize_col`` high). Preserves all input columns.

    NULL contract: rows with NULL in either dimension are EXCLUDED from
    the frontier (filtered explicitly below). Under a NOT-EXISTS
    dominance definition a NULL row would be vacuously undominated —
    NULL compares unknown against everything — so silently keeping or
    dropping them via join/comparison null semantics would be an
    accident either way; the operator makes the exclusion explicit."""
    df = df.filter(
        F.col(minimize_col).isNotNull() & F.col(maximize_col).isNotNull()
    )
    per_level = df.groupBy(minimize_col).agg(
        F.max(maximize_col).alias("__pmax")
    )
    w = Window.orderBy(minimize_col)
    cum = per_level.select(
        minimize_col,
        F.max("__pmax")
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__cum_lt"),
        F.max("__pmax")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("__cum_le"),
    )
    return (
        df.join(F.broadcast(cum), minimize_col)
        .filter(
            (
                F.col("__cum_lt").isNull()
                | (F.col(maximize_col) > F.col("__cum_lt"))
            )
            & (F.col(maximize_col) == F.col("__cum_le"))
        )
        .drop("__cum_lt", "__cum_le")
    )
