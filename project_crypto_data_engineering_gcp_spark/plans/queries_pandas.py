"""Pandas-API corpus queries: the Arrow-vectorized Python escape hatch.

The engine's rule is JVM expressions first (SURVEY §2.9: the reference
needs zero UDFs); these two queries exercise the sanctioned slow-path
shapes — a scalar ``pandas_udf`` and a grouped-map ``applyInPandas`` —
with DuckDB oracles, proving the Arrow boundary preserves values exactly.
All worker functions are defined locally (shipped by value, no package
import on workers).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .corpus import corpus_query


@corpus_query(
    "pandas_scalar_price_tier",
    oracle="""
    SELECT o_orderkey,
           ROUND(LEAST(GREATEST(o_totalprice, 50000.0), 400000.0) / 1000.0, 6)
               AS clamped_k,
           CASE WHEN o_totalprice < 50000 THEN 'low'
                WHEN o_totalprice < 200000 THEN 'mid'
                ELSE 'high' END AS tier
    FROM orders
    """,
)
def pandas_scalar_price_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar pandas_udf (Arrow-batched, vectorized): clamp + rescale +
    tier label computed in numpy/pandas (rounded at 6 >= the value's own decimal width per the ROUND design rule — numpy rounds half-even, so rounding below width would diverge). The same math is expressible as
    built-ins (the oracle is plain SQL) — the point is proving the Arrow
    round-trip is value-exact for the cases where Python is unavoidable."""

    @F.pandas_udf("double")
    def clamped_k(s: pd.Series) -> pd.Series:
        return (s.clip(lower=50000.0, upper=400000.0) / 1000.0).round(6)

    @F.pandas_udf("string")
    def tier(s: pd.Series) -> pd.Series:
        import numpy as np

        return pd.Series(
            np.select([s < 50000, s < 200000], ["low", "mid"], default="high"),
            index=s.index,
        )

    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        clamped_k("o_totalprice").alias("clamped_k"),
        tier("o_totalprice").alias("tier"),
    )


@corpus_query(
    "pandas_grouped_zscore",
    oracle="""
    WITH stats AS (
        SELECT c_nationkey,
               AVG(c_acctbal) AS mu,
               stddev_samp(c_acctbal) AS sigma,
               COUNT(*) AS n
        FROM customer GROUP BY c_nationkey
    )
    SELECT c.c_custkey, c.c_nationkey, c.c_acctbal,
           CASE WHEN s.n > 1 AND s.sigma > 0
                THEN ROUND((c.c_acctbal - s.mu) / s.sigma, 6)
                ELSE 0.0 END AS bal_zscore
    FROM customer c JOIN stats s ON c.c_nationkey = s.c_nationkey
    """,
)
def pandas_grouped_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas: per-nation z-score of customer balances,
    one pandas DataFrame per group in/out. Rounded to 6 digits — pandas,
    Spark, and DuckDB all compute mean/stddev with different summation
    associativity, identical to well past 6 digits on these magnitudes.
    Scale: one shuffle on the group key; each group must fit one worker's
    memory (fine for per-nation slices; use window aggregates for
    pathological group sizes)."""

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["c_acctbal"].mean()
        sigma = pdf["c_acctbal"].std(ddof=1)
        if len(pdf) > 1 and sigma > 0:
            z = ((pdf["c_acctbal"] - mu) / sigma).round(6)
        else:
            z = 0.0
        return pdf.assign(bal_zscore=z)

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    return cust.groupBy("c_nationkey").applyInPandas(
        zscore,
        schema="c_custkey long, c_nationkey int, c_acctbal double, bal_zscore double",
    )
