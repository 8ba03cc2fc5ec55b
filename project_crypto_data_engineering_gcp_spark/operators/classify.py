"""Conditional classification (nested CASE) — reference P11.

Reference site: ``3-spark_curated_analytics_full.py:246-248`` — nested
``when(isNull).otherwise(when(a >= b, ...).otherwise(...))`` labeling
supply status. Pure expression work: codegen'd, no shuffle, scale-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, functions as F


def when_chain(rules: Sequence[tuple[Column, str]], default: str) -> Column:
    """First-match-wins CASE chain: [(condition, label), ...] else default."""
    expr: Column | None = None
    for cond, label in rules:
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None, "need at least one rule"
    return expr.otherwise(F.lit(default))
