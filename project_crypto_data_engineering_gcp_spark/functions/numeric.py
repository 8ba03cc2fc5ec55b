"""Exact, order-independent numeric aggregation helpers.

Why this exists: IEEE double addition is not associative, so a plain
``SUM(double)`` depends on partition/merge order — fine within one engine,
but it breaks bit-exact differential testing against DuckDB, and it makes
Spark's own results run-to-run nondeterministic at scale (partial-aggregate
merge order varies with scheduling). The fix is classic fixed-point
accounting: cast to DECIMAL (exact base-10), aggregate exactly, cast the
final scalar back to DOUBLE. Decimal partial aggregation is still map-side
combinable, so the plan shape (partial agg -> shuffle -> final agg) and
scalability are identical to a double sum; only the ALU cost is marginally
higher.

The testdata money/quantity columns carry <= 2 decimal digits, so
DECIMAL(18,2) casts are value-preserving; products of two such columns
carry <= 4 digits, etc. Callers pick scales that cover the true decimal
width of the data — then every engine computes the *same rational number*
and the final double is the correctly-rounded image of it in both Spark
and DuckDB (verified empirically at sf0.01).

ROUND design rule (enforced by convention across the corpus, verified by
tests/test_parity_properties.py): only ROUND (a) computed/arbitrary
doubles — whose probability of sitting on a short-decimal half boundary
is ~2e-11 — or (b) data-borne short decimals at a scale >= their own
decimal width. Rounding a short decimal BELOW its width diverges across
engines on '...5'-terminated reprs: Spark rounds the shortest decimal
representation (1.005 -> 1.01), DuckDB rounds the binary value
(1.00499999... -> 1.0).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def dec(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast to an exact decimal. Use before multiplying/summing doubles
    whose true values are short decimals (money, quantities, rates)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact decimal SUM of a (short-decimal-valued) double column,
    returned as DOUBLE. Deterministic across partitionings and engines."""
    return F.sum(dec(col, precision, scale)).cast("double")


def dsum_expr_sql(expr: str, precision: int = 18, scale: int = 2) -> str:
    """DuckDB oracle twin of :func:`dsum` for a column/expression string."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
