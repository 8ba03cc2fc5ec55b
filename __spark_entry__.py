"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full oracle-checked corpus from
``project_crypto_data_engineering_gcp_spark.plans`` (one entry per implemented
operator family from SURVEY.md §2 plus the LLM-pipeline superset ops).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from project_crypto_data_engineering_gcp_spark.plans import all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from project_crypto_data_engineering_gcp_spark.plans.queries_reference import (
        q1_pricing_summary,
    )

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins — every corpus query has one (the
    formerly rows-only ops now check via recursive-CTE components, HLL
    error-bound invariants, and deterministically-closed stream windows)."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
