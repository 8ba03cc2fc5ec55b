"""Table profiling: per-column stats in one pass (the ANALYZE step).

``profile`` computes, for every requested column, the row count, null
count, exact distinct count, and min/max (rendered to strings so one
long-format frame covers heterogeneous column types). Everything is a
single wide aggregation over one scan — Spark evaluates all columns'
aggregates together in one partial/final HashAggregate pair, so profiling
a 100-column table costs one pass, not 100.

At 100 TB swap ``countDistinct`` for ``approx_count_distinct`` (HLL,
mergeable) via ``exact=False`` — the shuffle then carries sketches
instead of full distinct sets per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def profile(df: DataFrame, columns: list[str] | None = None, *, exact: bool = True) -> DataFrame:
    """Long-format profile: (column, n_rows, n_nulls, n_distinct,
    min_value, max_value) — one aggregation pass for all columns."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__nulls_{c}"))
        aggs.append(
            (
                F.countDistinct(F.col(c))
                if exact
                else F.approx_count_distinct(F.col(c))
            ).alias(f"__nd_{c}")
        )
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__min_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    # one wide row -> long format via stack (JVM-side, no shuffle: the
    # aggregate output is a single row)
    stack_args = []
    for c in cols:
        stack_args.append(f"'{c}'")
        stack_args.append("__n")
        stack_args.append(f"__nulls_{c}")
        stack_args.append(f"__nd_{c}")
        stack_args.append(f"__min_{c}")
        stack_args.append(f"__max_{c}")
    expr = (
        f"stack({len(cols)}, {', '.join(stack_args)}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_value, max_value)"
    )
    return wide.select(F.expr(expr))
