#!/usr/bin/env python3
"""TWO-decade (x1 -> x10 -> x100) scale curve for the r9 additions'
heavy shapes: the per-half grouped-global-rank Gini drift, the
two-version decile-boundary extraction (the rank half of
dq_version_quantile_drift, run on amplified frames directly — the
txlog rebuild is write-bound and measured by the query itself), the
per-dimension embedding-drift posexplode, and the time-to-convert
join+rank chain.

Same technique and discipline as tools/r8_scale.py: sf0.1 base frames
amplified by N disjoint key-offset copies, per-level inputs persisted +
materialized outside the timing and blocking-unpersisted before the
next level. Prints one JSON line per shape plus a summary.
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


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.rank import (
        _idiv,
        global_rank,
        grouped_global_rank,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r9_scale")

    orders0 = load_table(spark, sf_dir, "orders")
    cust0 = load_table(spark, sf_dir, "customer")
    emb0 = load_table(spark, sf_dir, "embeddings")
    events0 = load_table(spark, sf_dir, "events")

    # (nation, custkey, half, cents): the a36 input grain
    halves = (
        orders0.join(cust0, orders0.o_custkey == cust0.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
            (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")).alias(
                "h"
            ),
        )
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("cents")
        )
        .select(
            "nationkey", "custkey", F.col("h").cast("int").alias("h"), "cents"
        )
        .localCheckpoint(eager=True)
    )
    ordc = orders0.select(
        "o_orderkey",
        (F.col("o_totalprice") * 100)
        .cast("decimal(18,0)")
        .cast("bigint")
        .alias("cents"),
    ).localCheckpoint(eager=True)
    # pre-exploded embedding grain (vec, dim, v_e6) — amplified on vec_id
    expl = emb0.select(
        "vec_id", F.posexplode("embedding").alias("dim", "v")
    ).select(
        "vec_id",
        "dim",
        (
            F.floor(F.col("v").cast("double") * 1000000).cast("bigint")
            + F.lit(10_000_000)
        ).alias("v_shift"),
    ).localCheckpoint(eager=True)
    view_purch = events0.filter(
        F.col("event_type").isin("view", "purchase")
    ).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("tsec")
    ).localCheckpoint(eager=True)

    def gini_drift(h):
        ranked = grouped_global_rank(
            h, ["nationkey", "h"], ["cents", "custkey"], rank_col="rk"
        )
        d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
        per = ranked.groupBy("nationkey", "h").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d38("cents")).alias("s0"),
            F.sum(d38("rk") * d38("cents")).alias("s1"),
        )
        return per.select(
            "nationkey",
            "h",
            _idiv(
                F.lit(1000000)
                * (F.lit(2) * F.col("s1") - (F.col("n") + 1) * F.col("s0")),
                F.col("n").cast("decimal(38,0)") * F.col("s0"),
            ).alias("g"),
        )

    def decile_bounds(o):
        ranked = global_rank(o, ["cents", "o_orderkey"], rank_col="rn")
        n = o.agg(F.count(F.lit(1)).alias("n"))
        spine = spark.range(1, 10).select(F.col("id").alias("decile"))
        targets = spine.crossJoin(F.broadcast(n)).select(
            "decile", _idiv(F.col("decile") * F.col("n"), F.lit(10)).alias("t")
        )
        return ranked.join(F.broadcast(targets), ranked.rn == F.col("t"))

    def emb_drift(x):
        per = x.groupBy(
            "dim", (F.col("vec_id") % 2 == 0).alias("half")
        ).agg(F.count(F.lit(1)).alias("cnt"), F.sum("v_shift").alias("s"))
        return per.select(
            "dim", "half", (_idiv(F.col("s"), F.col("cnt"))).alias("m")
        )

    def time_to_convert(ev):
        s1 = (
            ev.filter(F.col("event_type") == "view")
            .groupBy("user_id")
            .agg(F.min("tsec").alias("t1"))
        )
        conv = (
            ev.filter(F.col("event_type") == "purchase")
            .join(s1, "user_id")
            .filter(F.col("tsec") > F.col("t1"))
            .groupBy("user_id", "t1")
            .agg(F.min("tsec").alias("t3"))
            .select("user_id", (F.col("t3") - F.col("t1")).alias("d"))
        )
        return global_rank(conv, ["d", "user_id"], rank_col="rn")

    shapes = {
        "gini_drift": (
            gini_drift,
            [(halves, {"nationkey": 1000, "custkey": 10_000_000, "h": 0,
                       "cents": 0})],
        ),
        "decile_bounds": (
            decile_bounds,
            [(ordc, {"o_orderkey": 100_000_000, "cents": 0})],
        ),
        "emb_drift": (
            emb_drift,
            [(expl, {"vec_id": 10_000_000, "dim": 0, "v_shift": 0})],
        ),
        "time_to_convert": (
            time_to_convert,
            [(view_purch, {"user_id": 10_000_000, "event_type": 0, "tsec": 0})],
        ),
    }
    shapes = filter_shapes(shapes)
    out = {"levels": list(LEVELS), "passes": PASSES, "shapes": {}}
    for name, (builder, specs) in shapes.items():
        row: dict[str, float] = {}
        secs: dict[int, float] = {}
        for lvl in LEVELS:
            frames = [
                amplify(spark, base, lvl, spec).persist()
                for base, spec in specs
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
