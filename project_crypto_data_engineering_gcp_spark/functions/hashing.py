"""Cross-engine deterministic 60-bit hashing.

MinHash/SimHash/fingerprinting need a hash function that Spark and the
DuckDB oracle agree on bit-for-bit. Spark's ``hash``/``xxhash64`` and
DuckDB's ``hash`` are different algorithms, so we derive a 60-bit integer
from MD5 (available and identical in both engines): take the first 15 hex
chars of ``md5(salt || value)`` and parse as base-16. 15 hex digits = 60
bits, always non-negative, fits in a signed 64-bit long in both engines.

Scale note: MD5 per token/shingle is pure JVM-side codegen'd work
(no shuffle, no Python), ~100 ns/row — at 100 TB this stays embarrassingly
parallel in the scan stage. A production deployment that does not need a
DuckDB twin can swap in ``F.xxhash64`` via the ``fast=`` flag for ~3x
less CPU with the same distributional properties.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def md5_long(col: Column | str, salt: str = "", *, fast: bool = False) -> Column:
    """60-bit non-negative hash of a string column, identical in DuckDB
    via :func:`md5_long_sql`. ``fast=True`` swaps to xxhash64 (no oracle
    twin — use only where differential testing is not required)."""
    c = F.col(col) if isinstance(col, str) else col
    if fast:
        h = F.xxhash64(F.concat(F.lit(salt), c)) if salt else F.xxhash64(c)
        return F.pmod(h, F.lit(2**60))
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str, salt: str = "") -> str:
    """DuckDB SQL string computing the same 60-bit hash as :func:`md5_long`."""
    inner = f"'{salt}' || {expr}" if salt else expr
    return f"('0x' || substr(md5({inner}), 1, 15))::BIGINT"
