#!/usr/bin/env python3
"""Batch-vs-stream differential fuzzing for the streaming/stateful
family (r9 verdict task 5) — the one family tools/corpus_fuzz.py
touches least: its perturbations reshape the DATA, but every streaming
corpus query still drains its source as ONE micro-batch (a single
coalesced file), so the semantics that only exist across micro-batch
boundaries were never adversarially exercised:

  - late data arriving N batches after its event-time peers, at and
    inside the watermark horizon,
  - EMPTY micro-batches (a file with schema and zero rows — watermark
    must not stall, state must not corrupt),
  - sessions/windows straddling batch cuts (state carried across
    commits and merged with late extensions),
  - at-least-once redelivery of the same row in a LATER batch
    (dropDuplicatesWithinWatermark state, not same-batch dedup),
  - stream-stream join state kept alive exactly long enough for a
    partner delayed by the disorder bound.

Method: one seeded RNG per seed derives a DELIVERY ORDER for the
events table — each row's delivery key is ts + hash-jitter in
[0, DISORDER) — which is then cut into ~N_CHUNKS contiguous chunks of
seeded random sizes plus injected empty chunks, written as one file
per chunk with ascending mtimes. The stream reads the chunk dir with
maxFilesPerTrigger=1 (one chunk == one micro-batch, in mtime order);
the BATCH reference reads the IDENTICAL files in one pass. With
watermark W >= disorder D, every row is on time by construction:

  a row with ts t is delivered before any row with ts > t + D, so
  when t's chunk commits, max_seen <= t + D and watermark
  <= t + D - W <= t — the row can never be late, join state for a
  partner within the interval bound cannot have expired, and a
  duplicate redelivered <= 2D after its original arrives while the
  dedup state (kept until watermark > t + W) is still live
  (2D - W <= W for W >= D).

So every gate is EXACT equality (exceptAll both ways) on the
closed-window subset both engines provably emit — same discipline as
the corpus oracles — never a tolerance.

Usage:
    python3 tools/stream_fuzz.py                    # seeds 1..6
    python3 tools/stream_fuzz.py --seeds 7 8 9
    python3 tools/stream_fuzz.py --gates rollup,dedup --seeds 3
"""

from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from project_crypto_data_engineering_gcp_spark.functions.numeric import (  # noqa: E402
    dec,
    dsum,
)
from project_crypto_data_engineering_gcp_spark.sources.tables import (  # noqa: E402
    load_table,
)
from project_crypto_data_engineering_gcp_spark.streaming.incremental import (  # noqa: E402
    stream_dedup_events,
    stream_enriched_rollup,
    stream_hourly_rollup,
    stream_interval_join,
    stream_sessionize,
)

BASE_DEFAULT = os.environ.get("SPARK_GRAFT_FUZZ_SF", "/root/testdata/sf0.001")
DISORDER_MIN = 30  # max delivery disorder D
WATERMARK = "45 minutes"  # W: must be >= D (see module docstring)
WATERMARK_MIN = 45
N_CHUNKS = 12
DUP_PCT = 15  # redelivered rows for the dedup gate


def _delivery_key(df: DataFrame, seed: int, *, extra: int = 0) -> DataFrame:
    """ts + deterministic per-row jitter in [0, DISORDER) seconds (plus
    ``extra`` whole minutes for redeliveries). Hash-based, not rand():
    identical across retries/partitionings."""
    jitter_s = F.pmod(
        F.xxhash64("event_id", F.lit(seed + 7 * extra)), F.lit(DISORDER_MIN * 60)
    )
    return df.withColumn(
        "_dk",
        F.col("ts")
        + F.make_interval(secs=(jitter_s + F.lit(extra * 60)).cast("double")),
    )


def build_chunked_source(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    seed: int,
    *,
    dup_pct: int = 0,
) -> None:
    """Write the seed's chunked delivery of events under ``out_dir``:
    one parquet FILE per chunk named chunk_NNNN.parquet with ascending
    mtimes (the file source's processing order), including two empty
    chunks. ``dup_pct`` > 0 re-delivers that percentage of rows a
    seeded [1, 2*DISORDER) minutes after their first delivery."""
    rng = random.Random(seed)
    events = load_table(spark, sf_dir, "events")
    deliver = _delivery_key(events, seed)
    if dup_pct:
        dups = events.where(
            F.pmod(F.xxhash64("event_id", F.lit(seed + 1)), F.lit(100)) < dup_pct
        )
        deliver = deliver.unionByName(
            _delivery_key(dups, seed, extra=rng.randrange(1, DISORDER_MIN))
        )
    # contiguous delivery-order chunks of seeded random sizes
    cuts = sorted(rng.random() for _ in range(N_CHUNKS - 1))
    from pyspark.sql import Window

    pr = F.percent_rank().over(Window.orderBy("_dk", "event_id"))
    chunked = deliver.withColumn(
        "_chunk",
        sum((pr >= F.lit(c)).cast("int") for c in cuts),
    )
    staging = f"{out_dir}.staging"
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(out_dir, ignore_errors=True)
    (
        chunked.drop("_dk")
        .repartition(1)
        .write.partitionBy("_chunk")
        .parquet(staging)
    )
    # one empty chunk file template (schema-only parquet)
    empty_dir = f"{out_dir}.empty"
    shutil.rmtree(empty_dir, ignore_errors=True)
    events.limit(0).coalesce(1).write.parquet(empty_dir)
    empty_part = next(
        os.path.join(empty_dir, f)
        for f in os.listdir(empty_dir)
        if f.endswith(".parquet")
    )
    # assemble: chunks in order, two empty micro-batches spliced in
    os.makedirs(out_dir)
    empty_at = {rng.randrange(1, N_CHUNKS), rng.randrange(1, N_CHUNKS)}
    t0, pos = time.time() - 86400, 0

    def place(src_file: str) -> None:
        nonlocal pos
        dst = os.path.join(out_dir, f"chunk_{pos:04d}.parquet")
        shutil.copyfile(src_file, dst)
        os.utime(dst, (t0 + 10 * pos, t0 + 10 * pos))
        pos += 1

    for i in range(N_CHUNKS):
        if i in empty_at:
            place(empty_part)
        part_dir = os.path.join(staging, f"_chunk={i}")
        if os.path.isdir(part_dir):  # a cut range can be empty by chance
            for f in sorted(os.listdir(part_dir)):
                if f.endswith(".parquet"):
                    place(os.path.join(part_dir, f))
    shutil.rmtree(staging, ignore_errors=True)
    shutil.rmtree(empty_dir, ignore_errors=True)


def _stream(spark: SparkSession, src: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def _drain(q) -> None:
    q.awaitTermination()


def _assert_equal(streamed: DataFrame, batch: DataFrame, gate: str) -> str | None:
    extra = streamed.exceptAll(batch).count()
    missing = batch.exceptAll(streamed).count()
    n = batch.count()
    if extra or missing:
        return f"{gate}: extra={extra} missing={missing} (batch rows={n})"
    if n == 0:
        return f"{gate}: VACUOUS (batch reference empty)"
    return None


# --------------------------------------------------------------- gates
# Each gate: (spark, clean_src, dup_src, schema, tag) -> error | None.
# Closed-window filters mirror the corpus queries' emission proofs with
# the watermark W folded in; margins dodge eviction-strictness edges.


def gate_rollup(spark, src, _dup, schema, tag):
    name = f"sf_rollup_{tag}"
    _drain(
        stream_hourly_rollup(
            spark, _stream(spark, src, schema), watermark=WATERMARK, query_name=name
        )
    )
    batch_src = spark.read.schema(schema).parquet(src)
    closed = f"hour_start + INTERVAL {60 + WATERMARK_MIN + 60} MINUTES <= max_ts"
    max_ts = batch_src.agg(F.max("ts").alias("max_ts"))
    batch = (
        batch_src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "total_value")
    )
    strm = spark.table(name)
    j = lambda df: df.crossJoin(F.broadcast(max_ts)).filter(closed).drop("max_ts")  # noqa: E731
    return _assert_equal(j(strm), j(batch), f"rollup[{tag}]")


def gate_enriched(spark, src, _dup, schema, tag):
    name = f"sf_enriched_{tag}"
    batch_src = spark.read.schema(schema).parquet(src)
    cohort = batch_src.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    _drain(
        stream_enriched_rollup(
            spark,
            _stream(spark, src, schema),
            cohort,
            watermark=WATERMARK,
            query_name=name,
        )
    )
    closed = f"hour_start + INTERVAL {60 + WATERMARK_MIN + 60} MINUTES <= max_ts"
    max_ts = batch_src.agg(F.max("ts").alias("max_ts"))
    batch = (
        batch_src.join(F.broadcast(cohort), "user_id")
        .groupBy(F.window("ts", "1 hour").alias("w"), "cohort_week")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 18, 2)).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "cohort_week", "n", "total_value")
    )
    strm = spark.table(name)
    j = lambda df: df.crossJoin(F.broadcast(max_ts)).filter(closed).drop("max_ts")  # noqa: E731
    return _assert_equal(j(strm), j(batch), f"enriched[{tag}]")


def gate_sessionize(spark, src, _dup, schema, tag):
    name = f"sf_sessions_{tag}"
    _drain(
        stream_sessionize(
            spark,
            _stream(spark, src, schema),
            gap="6 hours",
            watermark=WATERMARK,
            query_name=name,
        )
    )
    batch_src = spark.read.schema(schema).parquet(src)
    # batch reference uses the SAME session_window operator in one pass:
    # the subject under test is state carryover across micro-batch cuts
    # and late-extension merges, so identical tie semantics by
    # construction are exactly what we want (the lag/cumsum twin is
    # differentially checked by the corpus oracle already).
    batch = (
        batch_src.groupBy(F.session_window("ts", "6 hours").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(dec("value", 18, 2)).cast("double").alias("session_value"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id", "session_start", "session_end", "n_events", "session_value"
        )
    )
    closed = (
        f"session_end + INTERVAL {360 + WATERMARK_MIN + 60} MINUTES <= max_ts"
    )
    max_ts = batch_src.agg(F.max("ts").alias("max_ts"))
    strm = spark.table(name)
    j = lambda df: df.crossJoin(F.broadcast(max_ts)).filter(closed).drop("max_ts")  # noqa: E731
    return _assert_equal(j(strm), j(batch), f"sessionize[{tag}]")


def gate_dedup(spark, _src, dup_src, schema, tag):
    name = f"sf_dedup_{tag}"
    q = (
        stream_dedup_events(
            _stream(spark, dup_src, schema),
            keys=["user_id", "event_id", "ts"],
            watermark=WATERMARK,
        )
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    _drain(q)
    # reference: redelivered rows are verbatim copies, so the deduped
    # stream must equal the DISTINCT rows of the chunked source
    batch = spark.read.schema(schema).parquet(dup_src).distinct()
    return _assert_equal(spark.table(name), batch, f"dedup[{tag}]")


def gate_interval_join(spark, src, _dup, schema, tag):
    name = f"sf_ivj_{tag}"
    _drain(
        stream_interval_join(
            _stream(spark, src, schema).filter(F.col("event_type") == "purchase"),
            _stream(spark, src, schema).filter(F.col("event_type") == "view"),
            max_lag="30 minutes",
            watermark=WATERMARK,
            query_name=name,
        )
    )
    ev = spark.read.schema(schema).parquet(src)
    p = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = ev.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    batch = p.join(
        v,
        (F.col("user_id") == F.col("v_user_id"))
        & (F.col("view_ts") <= F.col("purchase_ts"))
        & (F.col("view_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")),
        "inner",
    ).select(
        "user_id", "purchase_id", "purchase_ts", "purchase_value", "view_id", "view_ts"
    )
    return _assert_equal(spark.table(name), batch, f"interval_join[{tag}]")


def gate_interval_join_outer(spark, src, _dup, schema, tag):
    name = f"sf_ivjo_{tag}"
    _drain(
        stream_interval_join(
            _stream(spark, src, schema).filter(F.col("event_type") == "purchase"),
            _stream(spark, src, schema).filter(F.col("event_type") == "view"),
            max_lag="30 minutes",
            watermark=WATERMARK,
            query_name=name,
            how="left_outer",
        )
    )
    ev = spark.read.schema(schema).parquet(src)
    p = ev.filter("event_type = 'purchase'").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    v = ev.filter("event_type = 'view'").select(
        F.col("user_id").alias("v_user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    batch = (
        p.join(
            v,
            (F.col("user_id") == F.col("v_user_id"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (
                F.col("view_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES")
            ),
            "left_outer",
        )
        .select(
            "user_id",
            "purchase_id",
            "purchase_ts",
            "purchase_value",
            "view_id",
            "view_ts",
        )
    )
    # outer rows only materialize once the watermark proves no future
    # match — and the GLOBAL watermark is the MIN over both sides'
    # nodes, each advancing only with its OWN filtered stream: the gate
    # is least(max purchase ts, max view ts), NOT max(all events). The
    # first 6-seed sweep re-derived this (seed 5: newest view trailed
    # the newest event far enough that a max(ts) gate claimed one
    # never-emitted outer row) — the same gap corpus_fuzz found in the
    # corpus query in r9 (queries_relational.streaming_interval_join_outer).
    closed = (
        f"purchase_ts + INTERVAL {30 + WATERMARK_MIN + 30} MINUTES <= max_ts"
    )
    max_ts = (
        ev.filter("event_type = 'purchase'")
        .agg(F.max("ts").alias("p_max"))
        .crossJoin(ev.filter("event_type = 'view'").agg(F.max("ts").alias("v_max")))
        .select(
            F.when(
                F.col("p_max").isNotNull() & F.col("v_max").isNotNull(),
                F.least("p_max", "v_max"),
            ).alias("max_ts")
        )
    )
    j = lambda df: df.crossJoin(F.broadcast(max_ts)).filter(closed).drop("max_ts")  # noqa: E731
    return _assert_equal(
        j(spark.table(name)), j(batch), f"interval_join_outer[{tag}]"
    )


def gate_running_totals(spark, src, _dup, schema, tag):
    from project_crypto_data_engineering_gcp_spark.streaming.stateful import (
        running_user_totals,
    )

    name = f"sf_totals_{tag}"
    ckpt = tempfile.mkdtemp(prefix=f"sf_ckpt_{tag}_")
    try:
        q = (
            running_user_totals(
                _stream(spark, src, schema).select("user_id", "ts", "value")
            )
            .writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        _drain(q)
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
    latest = (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max_by("total_value", "n_events").alias("total_value"),
        )
    )
    batch = (
        spark.read.schema(schema)
        .parquet(src)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("total_value"))
    )
    return _assert_equal(latest, batch, f"running_totals[{tag}]")


GATES = {
    "rollup": gate_rollup,
    "enriched": gate_enriched,
    "sessionize": gate_sessionize,
    "dedup": gate_dedup,
    "interval_join": gate_interval_join,
    "interval_join_outer": gate_interval_join_outer,
    "running_totals": gate_running_totals,
}


def run_stream_fuzz(
    spark: SparkSession,
    seed: int,
    *,
    base_dir: str = BASE_DEFAULT,
    gates=None,
) -> list[str]:
    """Build the seed's chunked deliveries and run every (or the given)
    gate; returns the list of failure strings."""
    tag = f"s{seed}"
    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_streamfuzz_{os.getpid()}_{seed}"
    )
    clean_src = os.path.join(root, "clean")
    dup_src = os.path.join(root, "dup")
    names = list(gates or GATES)
    fails: list[str] = []
    try:
        build_chunked_source(spark, base_dir, clean_src, seed)
        if "dedup" in names:
            build_chunked_source(spark, base_dir, dup_src, seed, dup_pct=DUP_PCT)
        schema = load_table(spark, base_dir, "events").schema
        n_files = len([f for f in os.listdir(clean_src) if f.endswith(".parquet")])
        print(f"seed {seed}: {n_files} micro-batches (incl. empties)")
        for g in names:
            err = GATES[g](spark, clean_src, dup_src, schema, tag)
            if err:
                fails.append(f"seed={seed} {err}")
                print(f"FAIL {fails[-1]}")
            else:
                print(f"ok   seed={seed} {g}")
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return fails


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", nargs="*", type=int, default=[1, 2, 3, 4, 5, 6])
    ap.add_argument("--gates", default=None, help="comma-separated gate names")
    ap.add_argument("--base", default=BASE_DEFAULT)
    args = ap.parse_args()
    gates = args.gates.split(",") if args.gates else None

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', 8)}]")
        .appName("stream_fuzz")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    t0 = time.time()
    fails: list[str] = []
    for seed in args.seeds:
        fails += run_stream_fuzz(spark, seed, base_dir=args.base, gates=gates)
    print(f"done in {time.time() - t0:.0f}s; {len(fails)} failures")
    for f in fails:
        print("FAIL", f)
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
