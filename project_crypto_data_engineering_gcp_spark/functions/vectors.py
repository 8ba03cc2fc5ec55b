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
    """Cosine similarity; bit-identical to :func:`cosine_sql` in DuckDB.

    Note for pairwise workloads: this evaluates three folds (dot + both
    norms) per pair, and Spark's higher-order functions are interpreted,
    not codegen'd. Pre-normalize each side once with :func:`normalized`
    and take :func:`dot` of the results instead — one fold per pair,
    ~6x less expression work on an all-pairs join."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return dot(ca, cb) / (norm(ca) * norm(cb))


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def normalized(a: Column | str, norm_col: Column | str | None = None) -> Column:
    """Unit-normalize a float array into ``array<double>`` (one pass per
    VECTOR, not per pair). ``dot_prenorm(normalized(a), normalized(b))``
    is then the cosine — the scalable formulation for pairwise similarity.

    Pass ``norm_col`` (a column holding the precomputed :func:`norm`) when
    normalizing in bulk: interpreted lambdas get no common-subexpression
    elimination, so an inline norm would be re-folded per ELEMENT."""
    ca = F.col(a) if isinstance(a, str) else a
    if norm_col is None:
        n = norm(ca)
    else:
        n = F.col(norm_col) if isinstance(norm_col, str) else norm_col
    return F.transform(ca, lambda x: x.cast("double") / n)


def normalized_sql(a: str, norm_expr: str | None = None) -> str:
    """DuckDB twin of :func:`normalized` (same element order and the same
    divide-after-double-cast arithmetic, so downstream dots stay
    bit-identical)."""
    n = norm_expr if norm_expr is not None else norm_sql(a)
    return f"list_transform({a}, x -> x::DOUBLE / {n})"


def dot_double_sql(a: str, b: str) -> str:
    """DuckDB dot product of two DOUBLE lists (already cast/normalized) —
    twin of ``dot`` applied to :func:`normalized` outputs."""
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), i -> {a}[i] * {b}[i]))"
    )


def dot_prenorm(a: Column | str, b: Column | str) -> Column:
    """Dot product of two double arrays without re-casting (for use on
    :func:`normalized` outputs)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
