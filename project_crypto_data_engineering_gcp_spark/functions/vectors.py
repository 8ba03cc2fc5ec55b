"""Vector math over ``array<float>`` embedding columns.

Implemented as sequential left-fold ``F.aggregate`` over ``F.zip_with``
products: each float pair is cast to double before multiplying (the product
of two floats is exact in double), then accumulated left-to-right in a
double. This makes the result *bit-deterministic* — independent of
partitioning and bit-identical to DuckDB's ``list_sum(list_transform(...))``
fold (verified empirically), which is what makes cosine-similarity queries
differential-testable.

Performance: the fold is JVM-side codegen'd expression work, no Python.
For very hot paths a Pandas-UDF + numpy BLAS variant is faster per-row but
loses bit-determinism (SIMD reassociation) — the engine defaults to the
deterministic fold; swap only where differential testing is not needed.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Deterministic double-precision dot product of two float arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def dot_sql(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot` (same element order, double accumulation)."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1),"
        f" i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE))"
    )


def norm(a: Column | str) -> Column:
    """L2 norm, deterministic."""
    ca = F.col(a) if isinstance(a, str) else a
    return F.sqrt(dot(ca, ca))


def norm_sql(a: str) -> str:
    return f"sqrt({dot_sql(a, a)})"


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; bit-identical to :func:`cosine_sql` in DuckDB."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot(ca, cb) / (norm(ca) * norm(cb))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"
