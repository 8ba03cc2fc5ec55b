"""SparkSession factory with scale-aware defaults.

Local runs use ``local[N]`` with shuffle partitions ~= cores; on a real
cluster the same code runs unchanged — AQE coalesces/splits shuffle
partitions at runtime, so the static ``shuffle.partitions`` value is a
ceiling, not a tuning knob that must be re-derived per dataset.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "spark_graft",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Defaults chosen for correctness-portability and scale:
      - AQE on (runtime partition coalescing, skew-join splitting) so the
        same plan adapts from 60 k-row fixtures to 100 TB inputs.
      - session timezone pinned to UTC so timestamp semantics match the
        DuckDB oracle and are cluster-locale-independent.
      - Arrow enabled for any Pandas-UDF slow path.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
