"""Snapshot diff: row-level change classification between two frames.

The data-CI primitive: given two snapshots of the same logical table
(yesterday's load vs today's, pre- vs post-migration, blue vs green
pipeline output), classify every key as ``added`` / ``removed`` /
``changed`` / ``unchanged`` and expose per-column change flags so a
regression gate can alert on exactly what moved.

Scale design: ONE full-outer equi-join on the declared key (sort-merge;
shuffle-free when both snapshots are bucketed/partitioned on the key,
which is how 100 TB snapshot tables should be laid out anyway), then
pure codegen'd eqNullSafe comparisons — no window, no Python, no
collect. Downstream aggregation of the classification column is
map-combinable.

The reference pipeline re-loads full snapshots per trigger (its
append/overwrite dual sink, reference ``main.py`` flow); this operator is
the capability that tells you what a re-load actually changed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

CHANGE_COL = "change_type"


def table_diff(
    df_a: DataFrame,
    df_b: DataFrame,
    keys: list[str],
    compare_cols: list[str],
    *,
    flag_prefix: str = "chg_",
) -> DataFrame:
    """Classify every key of snapshots A (old) vs B (new).

    Returns one row per key present in either snapshot with columns:
    the ``keys``, ``change_type`` in {added, removed, changed,
    unchanged}, one ``{flag_prefix}{col}`` boolean per compare column
    (true iff the value differs; NULL-safe), and ``a_{col}`` / ``b_{col}``
    value pairs for the compare columns.

    Both inputs must be key-unique (a snapshot, not a log); duplicate
    keys would fan out in the join. Compare columns are matched with
    eqNullSafe, so NULL -> value and value -> NULL both count as changes
    while NULL -> NULL does not.
    """
    for c in (CHANGE_COL, *[f"{flag_prefix}{c}" for c in compare_cols]):
        if c in df_a.columns or c in df_b.columns:
            raise ValueError(f"table_diff: reserved output column {c!r} in input")

    a = df_a.select(
        *keys,
        F.lit(True).alias("__in_a"),
        *[F.col(c).alias(f"a_{c}") for c in compare_cols],
    )
    b = df_b.select(
        *keys,
        F.lit(True).alias("__in_b"),
        *[F.col(c).alias(f"b_{c}") for c in compare_cols],
    )
    joined = a.join(b, on=keys, how="full_outer")

    flags: list[Column] = [
        (~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))).alias(f"{flag_prefix}{c}")
        for c in compare_cols
    ]
    any_change = F.lit(False)
    for c in compare_cols:
        any_change = any_change | ~F.col(f"a_{c}").eqNullSafe(F.col(f"b_{c}"))

    change = (
        F.when(F.col("__in_a").isNull(), F.lit("added"))
        .when(F.col("__in_b").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(
        *keys,
        change.alias(CHANGE_COL),
        *flags,
        *[F.col(f"a_{c}") for c in compare_cols],
        *[F.col(f"b_{c}") for c in compare_cols],
    )
