"""Structured Streaming incremental mode — the idiomatic upgrade of the
reference's "event-driven batch" (SURVEY §2.8).

The reference emulates streaming with Pub/Sub triggers + glob reads +
rename-markers (`2-spark_processed_assats_list.py:37,76-87`). Here the
landing directory IS the stream: a checkpointed file source discovers new
snapshot documents, `Trigger.AvailableNow` drains whatever has arrived and
stops (the reference's per-DAG-run semantics, minus the control plane),
and `foreachBatch` funnels every micro-batch through the SAME
``bronze_to_silver`` transform the batch path uses — one codepath, two
execution modes, bit-identical Silver rows.

Exactly-once: the streaming checkpoint replaces both the rename-marker
protocol (S9) and the batch path's ledger; a re-run after crash reprocesses
only unacknowledged files. At scale the file source scales to object-store
listings with ``maxFilesPerTrigger`` backpressure.

Also provided: a watermarked tumbling-window aggregation over an event
stream — the streaming twin of the batch ``events_hourly_rollup`` corpus
query (same groupBy, late data bounded by the watermark).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.json_source import RAW_ENVELOPE_SCHEMA
from ..sources.sinks import write_history
from ..functions.numeric import dec
from ..plans.crypto_pipeline import bronze_to_silver


def stream_silver_available_now(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    *,
    processed_at: str | None = None,
    max_files_per_trigger: int | None = None,
) -> int:
    """Drain all unprocessed snapshot files into the partitioned Silver
    table and stop. Returns the number of micro-batches executed."""
    reader = (
        spark.readStream.schema(RAW_ENVELOPE_SCHEMA)
        .option("multiline", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    raw = reader.json(landing_dir)

    silver_out = os.path.join(out_dir, "silver", "assets")
    progress = {"rows": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        silver = bronze_to_silver(batch_df, processed_at=processed_at).withColumn(
            "dt", F.substring("data_referencia", 1, 10)
        )
        silver.cache()
        n = silver.count()
        if n:
            # one atomic history commit per micro-batch, made IDEMPOTENT
            # on (stable stream identity, epoch): foreachBatch alone is
            # at-least-once — a crash between the commit and the
            # checkpoint ack replays the epoch — so the sink carries a
            # txn marker the table dedups on (Delta's txnAppId/
            # txnVersion pattern). The stream identity is the CANONICAL
            # Silver path — realpath'd, because a restart may spell
            # out_dir relative where the first run spelled it absolute,
            # and Spark canonicalizes the checkpoint (same epochs) while
            # a raw f-string would not (code-review r7).
            write_history(
                silver,
                silver_out,
                partition_by=["dt"],
                txn=(f"stream_silver:{os.path.realpath(silver_out)}", epoch_id),
            )
            progress["rows"] += n
        silver.unpersist()

    q = (
        raw.writeStream.foreachBatch(sink)
        .option("checkpointLocation", os.path.join(out_dir, "_checkpoints", "silver"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return progress["rows"]


def stream_pipeline_available_now(
    spark: SparkSession,
    landing_dir: str,
    out_dir: str,
    *,
    processed_at: str | None = None,
    analysis_at: str | None = None,
) -> int:
    """Full incremental medallion run: drain new snapshot files into
    Silver, then rebuild Gold from the updated Silver state when (and
    only when) new rows arrived — the reference's two-job DAG collapsed
    into one streaming invocation. Returns Silver rows appended."""
    from ..plans.runner import run_gold

    rows = stream_silver_available_now(
        spark, landing_dir, out_dir, processed_at=processed_at
    )
    if rows:
        run_gold(spark, out_dir, analysis_at=analysis_at)
    return rows


def stream_hourly_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    *,
    watermark: str = "2 hours",
    query_name: str = "hourly_rollup",
):
    """Watermarked tumbling-window aggregate over a streaming events frame
    (schema: ts timestamp, event_type string, value double). Append-mode
    output: a window emits once its watermark passes — late events beyond
    ``watermark`` are dropped, bounding state size at any scale.

    Returns the started StreamingQuery writing to an in-memory sink named
    ``query_name`` (tests/demos; swap for a real sink in production).
    """
    agg = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
        )
        .select(
            F.col("w.start").alias("hour_start"),
            "event_type",
            "n",
            "total_value",
        )
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_enriched_rollup(
    spark: SparkSession,
    events_stream: DataFrame,
    static_dim: DataFrame,
    *,
    dim_key: str = "user_id",
    dim_col: str = "cohort_week",
    watermark: str = "2 hours",
    query_name: str = "enriched_rollup",
):
    """STREAM-STATIC ENRICHMENT: the canonical production composition of
    a streaming fact source with a slowly-changing batch dimension — the
    stream joins the static frame (broadcast: the dimension re-resolves
    per micro-batch, so a dimension refresh is picked up without
    restarting the query) BEFORE the watermarked tumbling-window
    aggregate, so windows are keyed by the enrichment attribute rather
    than the raw stream key. Stream-static equi-joins are stateless on
    the stream side (no watermark interaction, no join state), which is
    why this shape scales to any stream rate: per-batch cost is the
    probe of a broadcast hash table. For a data-sized dimension swap the
    broadcast for a shuffle join; the composition is unchanged.

    Returns the started AvailableNow query on an in-memory sink."""
    joined = (
        events_stream.withWatermark("ts", watermark)
        .join(F.broadcast(static_dim), dim_key)
    )
    agg = (
        joined.groupBy(F.window("ts", "1 hour").alias("w"), dim_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), dim_col, "n", "total_value")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_sessionize(
    spark: SparkSession,
    events_stream: DataFrame,
    *,
    gap: str = "6 hours",
    watermark: str = "0 seconds",
    query_name: str = "sessions",
):
    """Stream-native sessionization: ``session_window`` merges a user's
    events separated by less than ``gap`` into one window whose end
    extends with each event; the watermark closes sessions and bounds
    state. The streaming twin of the batch lag/cumsum sessionizer
    (plans/queries_reference.events_sessionized) — equivalence is tested.
    Returns the started AvailableNow query on an in-memory sink."""
    agg = (
        events_stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 2)).cast("double").alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select("user_id", "session_start", "session_end", "n_events", "session_value")
    )
    return (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_events(
    events_stream: DataFrame,
    *,
    keys: list[str] | None = None,
    watermark: str = "1 hour",
):
    """Streaming exact dedup: drop re-deliveries of the same (user_id,
    ts) within the watermark horizon. dropDuplicatesWithinWatermark keeps
    per-key state only until the watermark passes — bounded state, unlike
    an unbounded dropDuplicates. The streaming twin of the batch
    hash-groupBy dedup (at-least-once sources -> effectively-once rows)."""
    keys = keys or ["user_id", "ts"]
    return events_stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys
    )


def stream_interval_join(
    purchases_stream: DataFrame,
    views_stream: DataFrame,
    *,
    max_lag: str = "30 minutes",
    watermark: str = "1 hour",
    query_name: str = "purchase_view_join",
    how: str = "inner",
):
    """Stream-stream INTERVAL join: attribute each purchase to the views
    the same user made in the preceding ``max_lag`` window — the
    streaming twin of the batch as-of/attribution join.

    Both sides carry watermarks and the join predicate bounds event time
    on both sides (v.ts in [p.ts - max_lag, p.ts]), which is what lets
    Spark EXPIRE buffered state: a view older than watermark + max_lag
    can never match a future purchase and is dropped. Without the time
    bound the state would grow forever — the interval predicate is the
    scale contract, not an optimization.

    ``how="left_outer"`` additionally emits UNMATCHED purchases
    (null view columns) — but only when the watermark proves no future
    view can match, i.e. a left-outer row materializes at state expiry,
    not eagerly like inner matches. Consumers must therefore gate on the
    watermark having passed purchase_ts + max_lag (the corpus query
    filters exactly so) — the standard correctness contract for
    stream-stream outer joins.

    Returns the started AvailableNow query on an in-memory sink."""
    p = (
        purchases_stream.withWatermark("ts", watermark)
        .select(
            F.col("user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    v = (
        views_stream.withWatermark("ts", watermark)
        .select(
            F.col("user_id").alias("v_user_id"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
    )
    joined = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr(f"INTERVAL {max_lag}")),
        how,
    ).select("user_id", "purchase_id", "purchase_ts", "purchase_value", "view_id", "view_ts")
    return (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .trigger(availableNow=True)
        .start()
    )
