"""Parquet table loaders for the driver-generated testdata.

``load_table`` is a thin wrapper over ``spark.read.parquet`` — filters and
projections applied by callers push down to the parquet scan through
Catalyst (verify with ``df.explain``: ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; pins session TZ to UTC for oracle parity.

    ``events.ts`` has shipped in two physical encodings across testdata
    generations: TIMESTAMP(NANOS) (which Spark's parquet reader rejects —
    read via the legacy nanos-as-long mode and floor-truncated to
    microseconds, the same truncation DuckDB's microsecond TIMESTAMP
    applies) and plain TIMESTAMP(MICROS) (read natively as NTZ). The
    loader inspects the decoded type and normalizes both to a session-TZ
    TimestampType so every downstream plan and oracle sees one shape.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Engine-owned execution posture (safe on any session, incl. the
    # plain default one the driver uses): AQE coalesces the default 200
    # shuffle partitions down to the data's actual size at runtime.
    # Performance-only — every result is partition-count-independent by
    # design (exact decimal sums, total orderings), proven by running
    # the whole corpus under both 200-partition plain and 32-partition
    # tuned sessions.
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        from pyspark.sql.types import LongType

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if isinstance(df.schema["ts"].dataType, LongType):
            ts = F.timestamp_micros(F.expr("ts div 1000"))  # nanos-as-long
        else:
            ts = F.col("ts").cast("timestamp")  # native micros (NTZ → UTC)
        return df.select(
            "event_id",
            ts.alias("ts"),
            "user_id",
            "event_type",
            "value",
            "props",
        )
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view so the whole corpus
    is queryable through plain ``spark.sql`` — the SQL-first entry point
    (the DataFrame corpus queries and SQL share one Catalyst planner, so
    a spark.sql formulation gets identical plans/pushdown)."""
    for name in TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
