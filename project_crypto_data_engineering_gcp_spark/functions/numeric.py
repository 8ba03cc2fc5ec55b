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


def roundfx(col: Column | str, scale: int = 6) -> Column:
    """ENGINE-IDENTICAL fixed-point rounding of a computed DOUBLE:
    ``floor(x * 10^scale + 0.5) / 10^scale``, every step a deterministic
    IEEE-754 operation, so Spark and DuckDB produce the same double for
    the same input bit-for-bit — including on exact half-boundary ties,
    where Spark's ROUND (BigDecimal HALF_UP on the shortest decimal
    repr) and DuckDB's (multiply/nearbyint, banker's) disagree (the
    r5 ROUND-tie bug class; see tools/parity_sf01.py). Semantics are
    "round half toward +inf" rather than half-away-from-zero — ties on
    NEGATIVE values round up — which is fine wherever both sides use
    this helper. Domain: |x| < 2^53 / 10^scale (Spark's floor returns
    BIGINT); scores/ratios/lifts are all << that.

    The input is cast to DOUBLE first, mirroring roundfx_sql's
    ``CAST(expr AS DOUBLE)`` — without it a DECIMAL column would run
    decimal arithmetic on the Spark side and break the bit-identity
    contract (ADVICE r6)."""
    c = F.col(col) if isinstance(col, str) else col
    f = float(10**scale)
    return F.floor(c.cast("double") * F.lit(f) + F.lit(0.5)) / F.lit(f)


def roundfx_sql(expr: str, scale: int = 6) -> str:
    """DuckDB SQL twin of :func:`roundfx` (same IEEE op sequence). The
    scale factor is written in scientific notation and the input is cast:
    DuckDB parses ``1000000.0`` as DECIMAL (decimal arithmetic would both
    overflow and diverge from Spark's double path), but ``1e+06`` as
    DOUBLE."""
    f = float(10**scale)
    return f"(FLOOR(CAST({expr} AS DOUBLE) * {f:e} + 0.5) / {f:e})"
