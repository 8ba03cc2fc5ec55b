"""SQL-surface twins of the engine's scalar helpers (Spark SQL UDFs).

Spark 4's SQL scalar functions (``CREATE FUNCTION ... RETURNS ... RETURN
expr``) are declarative macros: the body is INLINED into the caller's
plan at resolution time, so these carry ZERO call overhead — no Python,
no serialization, full codegen, exactly as if the Column-API helper had
been used. :func:`register_sql_functions` gives ``spark.sql`` users the
same deterministic primitives the DataFrame API uses (the bodies are
kept textually in lock-step with ``functions/hashing.py`` /
``functions/text.py`` / ``functions/vectors.py``; the equality is pinned
by tests/test_sql_macros.py on real corpus data).

Determinism notes mirror the Column twins: the 60-bit md5 hash matches
DuckDB's ``('0x' || substr(md5(s), 1, 15))::BIGINT``; the dot product is
the sequential left-fold (bit-identical at any parallelism and to the
DuckDB list_sum fold).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# (name, body) — CREATE OR REPLACE makes re-registration idempotent
_FUNCTIONS: tuple[tuple[str, str], ...] = (
    (
        "sg_md5_long",
        """(s STRING) RETURNS BIGINT
        RETURN CAST(conv(substring(md5(s), 1, 15), 16, 10) AS BIGINT)""",
    ),
    (
        "sg_md5_long_salted",
        """(s STRING, salt STRING) RETURNS BIGINT
        RETURN CAST(conv(substring(md5(concat(salt, s)), 1, 15), 16, 10)
                    AS BIGINT)""",
    ),
    (
        "sg_tokens",
        "(s STRING) RETURNS ARRAY<STRING> RETURN split(s, ' ')",
    ),
    (
        "sg_distinct_tokens",
        """(s STRING) RETURNS ARRAY<STRING>
        RETURN array_distinct(split(s, ' '))""",
    ),
    (
        "sg_canonical_text",
        """(s STRING) RETURNS STRING
        RETURN concat_ws(' ', array_sort(array_distinct(split(s, ' '))))""",
    ),
    (
        "sg_shingles",
        """(s STRING, k INT) RETURNS ARRAY<STRING>
        RETURN CASE WHEN size(split(s, ' ')) < k THEN array()
               ELSE array_distinct(transform(
                   sequence(1, size(split(s, ' ')) - (k - 1)),
                   i -> concat_ws(' ', slice(split(s, ' '), i, k)))) END""",
    ),
    (
        "sg_stopword_count",
        """(s STRING, sw ARRAY<STRING>) RETURNS INT
        RETURN size(filter(split(s, ' '), t -> array_contains(sw, t)))""",
    ),
    (
        "sg_dot",
        """(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN aggregate(
            zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)""",
    ),
    (
        "sg_l2norm",
        """(a ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN sqrt(aggregate(
            zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
            CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))""",
    ),
    (
        "sg_cosine",
        """(a ARRAY<FLOAT>, b ARRAY<FLOAT>) RETURNS DOUBLE
        RETURN aggregate(
                   zip_with(a, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)
               / (sqrt(aggregate(
                   zip_with(a, a, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))
                  * sqrt(aggregate(
                   zip_with(b, b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
                   CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)))""",
    ),
)


def register_sql_functions(spark: SparkSession) -> list[str]:
    """Register every engine scalar as a session-scoped SQL function
    (``sg_*`` namespace). Returns the registered names. Idempotent."""
    names = []
    for name, sig in _FUNCTIONS:
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}{sig}")
        names.append(name)
    return names
