"""Stateful streaming operator test: running per-user totals maintained
across micro-batches must converge to the batch aggregate exactly."""

from __future__ import annotations

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
