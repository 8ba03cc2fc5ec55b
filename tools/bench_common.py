"""Shared helpers for the scale/experiment tools in this directory —
one canonical copy of the timing loop, the key-offset amplifier, and a
SOUND result-identity check (code-review r8: three tools had drifted
near-copies, and the inner-join-only equality check could not detect
missing or extra rows).

Import pattern (the tools already bootstrap the repo root onto
sys.path; this module lives next to them):

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench_common import amplify, assert_same_rows, timed
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def timed(fn, passes: int) -> float:
    """min-of-``passes`` wall time of fn() fully computed (count-style
    consume, no driver materialization of the payload)."""
    best = float("inf")
    for _ in range(passes):
        t0 = time.perf_counter()
        fn().agg(F.count(F.lit(1))).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def amplify(spark, edges, n: int, cols: tuple[str, str]):
    """n disjoint key-offset copies of an edge frame via ONE broadcast
    crossJoin (a single narrow stage — per-copy structure preserved
    exactly, so scale ratios isolate runtime scaling of the shape)."""
    if n == 1:
        return edges
    a, b = cols
    offset = edges.agg(F.greatest(F.max(a), F.max(b))).collect()[0][0] + 1
    copies = F.broadcast(spark.range(n).select(F.col("id").alias("_copy")))
    return edges.crossJoin(copies).select(
        (F.col(a) + F.col("_copy") * offset).alias(a),
        (F.col(b) + F.col("_copy") * offset).alias(b),
    )


def assert_same_rows(a, b, key: str, val: str, label: str) -> None:
    """Assert two (key, value) frames hold EXACTLY the same rows — a
    full-outer join on the key, so missing rows, extra rows, and value
    mismatches all fail (an inner join would silently ignore the first
    two classes)."""
    av = a.select(F.col(key).alias("k"), F.col(val).alias("x"))
    bv = b.select(F.col(key).alias("k"), F.col(val).alias("y"))
    bad = (
        av.join(bv, "k", "full_outer")
        .filter(
            F.col("x").isNull()
            | F.col("y").isNull()
            | (F.col("x") != F.col("y"))
        )
        .count()
    )
    assert bad == 0, f"{label}: {bad} row mismatches (missing/extra/value)"


def amplify_cols(spark, df, n: int, offset_cols: dict[str, int]):
    """Dict-spec variant of :func:`amplify` for non-edge frames: n
    disjoint copies; each column is shifted by copy * its stride
    (stride 0 keeps the column shared across copies). One broadcast
    crossJoin, per-copy structure preserved exactly."""
    if n == 1:
        return df
    copies = F.broadcast(spark.range(n).select(F.col("id").alias("_copy")))
    out = df.crossJoin(copies)
    return out.select(
        *[
            ((F.col(c) + F.col("_copy") * stride).alias(c) if stride else F.col(c))
            for c, stride in offset_cols.items()
        ]
    )


def filter_shapes(shapes: dict) -> dict:
    """Apply the SPARK_GRAFT_SHAPES comma-list env filter (subset
    re-measurement in isolation — r9: single-shape idle-box runs are
    how the fk x100 variance was attributed)."""
    import os

    only = os.environ.get("SPARK_GRAFT_SHAPES", "").strip()
    if not only:
        return shapes
    keep = set(only.split(","))
    return {k: v for k, v in shapes.items() if k in keep}
