#!/usr/bin/env python3
"""TWO-decade (x1 -> x10 -> x100) scale curve for the r12 additions'
shapes: the weighted-quantile generalization at p90 (same multi-level
band refinement as o8/o9 — the quantile parameter must not change the
cost model), the per-key anchor-chain dedup (applyInPandas sequential
fold — the Arrow fan-out shape; per-key population FIXED while keys
scale, the operator's documented contract), the bitmap exact-distinct
idiom (map-combinable bitmap fold; both group count and key domain
scale), and the native batch session_window merge (keys scale, per-key
sessions fixed). p15_variant_extract has no row here by design: it is
a pure narrow projection (no shuffle, no state), linear by
construction — a scale row would measure the scan, not the shape.

Same technique and discipline as tools/r8..r11_scale.py: sf0.1 base
frames amplified by N disjoint key-offset copies, per-level inputs
persisted + materialized outside the timing and blocking-unpersisted
before the next level. Prints one JSON line per shape plus a summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_common import amplify_cols as amplify, filter_shapes, timed

LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,10,100").split(",")
)
PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))
DELTA_US = 259_200 * 1_000_000


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.wmedian import (
        grouped_weighted_median,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r12_scale")

    li0 = load_table(spark, sf_dir, "lineitem")
    events0 = load_table(spark, sf_dir, "events")

    # o10 grain: (gkey, price_cents, w) — wide price domain, p90
    pr = (
        li0.select(
            F.xxhash64("l_returnflag", "l_linestatus").alias("gkey"),
            (F.col("l_extendedprice") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("price_cents"),
            (F.col("l_quantity") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )
    # anchor-chain grain: (user_id, event_id, us) — clicks only; keys
    # scale, per-key click population stays fixed (the contract grain)
    ck = (
        events0.filter(F.col("event_type") == "click")
        .select(
            "user_id",
            "event_id",
            F.unix_micros(F.col("ts")).alias("us"),
        )
        .localCheckpoint(eager=True)
    )
    # bitmap grain: (etype, user_id) — both group count and key domain
    # scale (each copy brings a fresh user population)
    bu = events0.select(
        F.xxhash64("event_type").alias("etype"), "user_id"
    ).localCheckpoint(eager=True)
    # session grain: (user_id, ts, value) — keys scale, per-key event
    # population fixed (sessions per user constant, user count x100)
    sv = events0.select("user_id", "ts", "value").localCheckpoint(eager=True)

    def wquantile_p90(q):
        return grouped_weighted_median(
            q,
            ["gkey"],
            "price_cents",
            "w",
            band_widths=(100_000, 1_000),
            quantile_ppm=900_000,
        )

    def anchor_chain_grouped(e):
        # the per-key FlatMapGroupsInPandas shape — kept as the measured
        # CONTRAST (one pandas frame + one Python call per key)
        import pandas as pd  # noqa: F401 - worker-side

        def _chain(pdf):
            pdf = pdf.sort_values(["us", "event_id"], kind="mergesort")
            kept = []
            anchor = None
            for us in pdf["us"]:
                keep = anchor is None or us > anchor + DELTA_US
                kept.append(keep)
                if keep:
                    anchor = us
            return pdf.loc[kept, ["user_id", "event_id", "us"]]

        return e.groupBy("user_id").applyInPandas(
            _chain, "user_id bigint, event_id bigint, us bigint"
        )

    def anchor_chain_batched(e):
        # the SHIPPED shape: repartition + local sort + MapInPandas with
        # cross-batch (user, anchor) carry — whole Arrow batches per call
        def run(batches):
            import numpy as np

            last_user, anchor = None, 0
            for pdf in batches:
                us = pdf["us"].to_numpy()
                uid = pdf["user_id"].to_numpy()
                keep = np.zeros(len(pdf), dtype=bool)
                for i in range(len(pdf)):
                    if last_user is None or uid[i] != last_user:
                        last_user = uid[i]
                        anchor = us[i]
                        keep[i] = True
                    elif us[i] > anchor + DELTA_US:
                        anchor = us[i]
                        keep[i] = True
                yield pdf.loc[keep, ["user_id", "event_id", "us"]]

        return (
            e.repartition("user_id")
            .sortWithinPartitions("user_id", "us", "event_id")
            .mapInPandas(run, "user_id bigint, event_id bigint, us bigint")
        )

    def session_native(e):
        return (
            e.groupBy(
                "user_id", F.session_window("ts", "30 minutes").alias("sw")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", "sw.start", "n")
        )

    def bitmap_distinct(e):
        pre = e.groupBy(
            "etype", F.bitmap_bucket_number(F.col("user_id")).alias("bkt")
        ).agg(
            F.bitmap_construct_agg(
                F.bitmap_bit_position(F.col("user_id"))
            ).alias("bm")
        )
        return pre.groupBy("etype").agg(
            F.sum(F.bitmap_count(F.col("bm"))).alias("d")
        )

    shapes = {
        "wquantile_p90": (
            wquantile_p90,
            [(pr, {"gkey": 1_000_000, "price_cents": 0, "w": 0})],
        ),
        "anchor_chain_grouped": (
            anchor_chain_grouped,
            [(ck, {"user_id": 10_000_000, "event_id": 100_000_000, "us": 0})],
        ),
        "anchor_chain_batched": (
            anchor_chain_batched,
            [(ck, {"user_id": 10_000_000, "event_id": 100_000_000, "us": 0})],
        ),
        "bitmap_distinct": (
            bitmap_distinct,
            [(bu, {"etype": 1000, "user_id": 10_000_000})],
        ),
        "session_native": (
            session_native,
            [(sv, {"user_id": 10_000_000, "ts": 0, "value": 0})],
        ),
    }
    shapes = filter_shapes(shapes)
    out = {"levels": list(LEVELS), "passes": PASSES, "shapes": {}}
    for name, (builder, specs) in shapes.items():
        row: dict[str, float] = {}
        secs: dict[int, float] = {}
        for lvl in LEVELS:
            frames = [
                amplify(spark, base, lvl, spec).persist() for base, spec in specs
            ]
            for f in frames:
                f.count()
            secs[lvl] = timed(lambda: builder(*frames), PASSES)
            row[f"x{lvl}_sec"] = round(secs[lvl], 3)
            for f in frames:
                f.unpersist(True)
        base_lvl = LEVELS[0]
        for lvl in LEVELS[1:]:
            key = f"r{lvl}" if base_lvl == 1 else f"r{lvl}_vs_x{base_lvl}"
            row[key] = round(secs[lvl] / secs[base_lvl], 2)
        out["shapes"][name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
