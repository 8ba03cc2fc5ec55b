"""Stateful streaming operator test: running per-user totals maintained
across micro-batches must converge to the batch aggregate exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.numeric import dsum
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table
from project_crypto_data_engineering_gcp_spark.streaming.stateful import (
    running_user_totals,
)

from .conftest import SF_SMOKE


def test_running_totals_converge_to_batch(spark, tmp_path):
    events = load_table(spark, SF_SMOKE, "events").select("user_id", "ts", "value")
    # stage as several files so the stream sees multiple micro-batches
    src = str(tmp_path / "events_src")
    events.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_totals")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    # update mode re-emits a user's snapshot per touched batch: the final
    # state is the row with the highest event count per user
    latest = (
        spark.table("user_totals")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    batch = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        dsum("value").alias("total_value"),
    )
    diff = latest.join(batch, "user_id", "full").filter(
        (latest["n_events"] != batch["n_events"])
        | (latest["total_value"] != batch["total_value"])
    )
    assert batch.count() > 0
    assert diff.count() == 0


def test_transform_with_state_topn_converges_to_batch(spark, tmp_path):
    """The transformWithStateInPandas top-N processor must converge to
    the batch rank-window top-N regardless of micro-batch slicing.

    Spark 4's transformWithState Python runner speaks protobuf to the
    JVM; this container ships no google.protobuf, so the test (like the
    Delta path) is import-gated — on a cluster with protobuf installed
    it runs as-is."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import Window

    from project_crypto_data_engineering_gcp_spark.streaming.stateful import (
        TOPN_N,
        user_topn_values,
    )

    events = load_table(spark, SF_SMOKE, "events").select(
        "user_id", "event_id", "value"
    )
    src = str(tmp_path / "events_topn_src")
    events.repartition(4).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        user_topn_values(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("user_topn")
        .option("checkpointLocation", str(tmp_path / "ckpt_topn"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    latest = (
        spark.table("user_topn")
        .groupBy("user_id")
        .agg(
            F.max_by("top_values", "n_seen").alias("top_values"),
            F.max_by("top_event_ids", "n_seen").alias("top_event_ids"),
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), F.asc("event_id"))
    batch = (
        events.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPN_N)
        .groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rk", "value", "event_id"))
            ).alias("ranked")
        )
        .select(
            "user_id",
            F.transform("ranked", lambda s: s["value"]).alias("b_values"),
            F.transform("ranked", lambda s: s["event_id"]).alias("b_event_ids"),
        )
    )
    diff = latest.join(batch, "user_id", "full").filter(
        (F.col("top_values") != F.col("b_values"))
        | (F.col("top_event_ids") != F.col("b_event_ids"))
    )
    assert batch.count() > 0
    assert diff.count() == 0
