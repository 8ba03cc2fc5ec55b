"""MERGE/upsert without a table format: full-outer join + coalesce.

Delta/Iceberg expose ``MERGE INTO``; on plain parquet the same semantics
are one relational plan: full-outer join target and source on the key,
coalesce source-over-target per column, and label each row with the
action taken. The output is the new serving table — write-overwrite it
(the reference's Gold "current" sink semantics, `3:99-105`).

Scale: one shuffle on the merge key for each side (or zero if both are
bucketed on the key); per-key state is one row each side, so no skew
beyond key popularity. This is exactly the join Delta's MERGE runs
underneath — expressing it directly keeps the engine format-agnostic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key_cols: Sequence[str],
    payload_cols: Sequence[str],
) -> DataFrame:
    """Upsert ``source`` into ``target`` on ``key_cols``: matched keys take
    the source row ("updated"), source-only keys are added ("inserted"),
    target-only keys are kept ("retained")."""
    t = target.select(
        *[F.col(k).alias(f"__tk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__t_{c}") for c in payload_cols],
    )
    s = source.select(
        *[F.col(k).alias(f"__sk_{k}") for k in key_cols],
        *[F.col(c).alias(f"__s_{c}") for c in payload_cols],
    )
    cond = None
    for k in key_cols:
        eq = F.col(f"__tk_{k}") == F.col(f"__sk_{k}")
        cond = eq if cond is None else (cond & eq)
    joined = t.join(s, cond, "full_outer")
    in_src = F.col(f"__sk_{key_cols[0]}").isNotNull()
    in_tgt = F.col(f"__tk_{key_cols[0]}").isNotNull()
    action = (
        F.when(in_src & in_tgt, "updated")
        .when(in_src, "inserted")
        .otherwise("retained")
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"__sk_{k}"), F.col(f"__tk_{k}")).alias(k)
            for k in key_cols
        ],
        *[
            F.when(in_src, F.col(f"__s_{c}"))
            .otherwise(F.col(f"__t_{c}"))
            .alias(c)
            for c in payload_cols
        ],
        action.alias("merge_action"),
    )
