"""Table sink format selection: Delta when available, parquet otherwise.

The reference writes Delta (ACID log + parquet) for Silver/Gold history
and BigQuery for serving (S5-S8). This environment ships no delta-spark
jars, so the engine gates the Delta path behind an import probe and falls
back to plain parquet — capability-equivalent for every query in the
corpus (the ACID/time-travel delta adds is orthogonal to query results).
Deployments with delta-spark on the classpath get Delta sinks without a
code change.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrameWriter


@lru_cache(maxsize=1)
def table_format() -> str:
    """'delta' when delta-spark is importable, else 'parquet'."""
    try:  # pragma: no cover - delta not present in the test image
        import delta  # noqa: F401

        return "delta"
    except ImportError:
        return "parquet"


def formatted(writer: DataFrameWriter) -> DataFrameWriter:
    """Apply the selected table format to a writer."""
    return writer.format(table_format())


def read_table(spark, path: str):
    """Read a table written via :func:`formatted` (delta or parquet)."""
    return spark.read.format(table_format()).load(path)
