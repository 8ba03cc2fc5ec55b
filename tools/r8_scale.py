#!/usr/bin/env python3
"""TWO-decade (x1 -> x10 -> x100) scale curve for the r8 additions'
heavy shapes: the Mann-Whitney rank pass, the HHI decile cut, the
skyline prefix-min, and the fact-fact referential-integrity anti-join.

Same technique as tools/graph_scale_100x.py: the sf0.1 base frames are
amplified by N disjoint key-offset copies via ONE broadcast crossJoin
(per-copy structure preserved, so ratios isolate runtime scaling of the
shape). Each shape is re-expressed inline on the amplified frame with
the SAME operators the corpus query uses.

Prints one JSON line per shape plus a final summary:
{"shapes": {"mann_whitney": {"x1_sec": .., "x10_sec": .., "x100_sec":
 .., "r10": .., "r100": ..}, ...}}
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
        global_prefix_min,
        global_rank,
        ntile_from_rank,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r8_scale")

    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_acctbal") * 100).cast("decimal(18,0)").cast("bigint").alias("v"),
    ).localCheckpoint(eager=True)
    events_ut = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type"
    ).localCheckpoint(eager=True)
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_totalprice") * 100)
        .cast("decimal(18,0)")
        .cast("bigint")
        .alias("price_cents"),
        "o_orderdate",
    ).localCheckpoint(eager=True)
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey"
    ).localCheckpoint(eager=True)
    okeys = orders.select("o_orderkey").localCheckpoint(eager=True)

    def mann_whitney(cust):
        ranked = global_rank(cust, ["v", "c_custkey"], rank_col="rk").select(
            "v", "c_nationkey", "rk"
        ).localCheckpoint(eager=True)
        per_v = ranked.groupBy("v").agg(
            F.min("rk").alias("mn"), F.max("rk").alias("mx")
        )
        per_vn = ranked.groupBy("v", "c_nationkey").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        return per_vn.join(per_v, "v").groupBy("c_nationkey").agg(
            F.sum("cnt").alias("n1"),
            F.sum(
                F.col("cnt").cast("decimal(38,0)")
                * (F.col("mn") + F.col("mx")).cast("decimal(38,0)")
            ).alias("r2"),
        )

    def hhi_deciles(ev):
        per_u = ev.groupBy("user_id", "event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        ).groupBy("user_id").agg(
            _idiv(
                F.sum(F.col("cnt") * F.col("cnt")).cast("decimal(38,0)")
                * F.lit(1000000),
                F.sum("cnt").cast("decimal(38,0)")
                * F.sum("cnt").cast("decimal(38,0)"),
            ).alias("hhi_ppm")
        )
        ranked = global_rank(per_u, ["hhi_ppm", "user_id"], rank_col="rk")
        n_rows = ranked.agg(F.count(F.lit(1)).alias("n_rows"))
        return (
            ranked.crossJoin(F.broadcast(n_rows))
            .select(
                "hhi_ppm",
                ntile_from_rank(F.col("rk"), F.col("n_rows"), 10).alias("d"),
            )
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("n"))
        )

    def skyline(ords):
        scan = global_prefix_min(
            ords,
            ["price_cents", "o_orderdate", "o_orderkey"],
            "o_orderdate",
            out_col="pm",
        )
        return scan.filter(
            F.col("pm").isNull() | (F.col("o_orderdate") < F.col("pm"))
        )

    def fk_anti_join(child, parent):
        return child.join(
            parent.withColumnRenamed("o_orderkey", "l_orderkey").distinct(),
            "l_orderkey",
            "left_anti",
        )

    # Known residual (documented, code-review r8 third pass): the rank
    # OPERATORS invoked by the builders localCheckpoint data-sized
    # internal frames per invocation (global_rank's tagged frame etc.);
    # those blocks are reclaimed only by nondeterministic ContextCleaner
    # GC once the Python references drop. The per-level INPUT frames —
    # the dominant storage — are handled deterministically below.
    # (builder, [(base frame, offset spec), ...]): at each level the
    # bases are amplified + cached + materialized, the builder runs over
    # them, and the caches are unpersisted (blocking) before the next
    # level — letting x100 frames accumulate in storage would make the
    # later shapes measure eviction pressure, not their plan
    # (code-review r8)
    shapes = {
        "mann_whitney": (
            mann_whitney,
            [(customer, {"c_custkey": 10_000_000, "c_nationkey": 100, "v": 0})],
        ),
        "hhi_deciles": (
            hhi_deciles,
            [(events_ut, {"user_id": 10_000_000, "event_type": 0})],
        ),
        "skyline": (
            skyline,
            [(orders, {"o_orderkey": 100_000_000, "price_cents": 0,
                       "o_orderdate": 0})],
        ),
        "fk_anti_join": (
            fk_anti_join,
            [
                (li, {"l_orderkey": 100_000_000}),
                (okeys, {"o_orderkey": 100_000_000}),
            ],
        ),
    }
    shapes = filter_shapes(shapes)
    out = {"levels": list(LEVELS), "passes": PASSES, "shapes": {}}
    for name, (builder, specs) in shapes.items():
        row: dict[str, float] = {}
        secs: dict[int, float] = {}
        for lvl in LEVELS:
            # persist (CacheManager), not localCheckpoint: unpersist()
            # on a checkpointed frame does NOT release the RDD blocks —
            # only the cache is deterministically reclaimable
            frames = [
                amplify(spark, base, lvl, spec).persist()
                for base, spec in specs
            ]
            for f in frames:
                f.count()  # materialize the amplification up front
            secs[lvl] = timed(lambda: builder(*frames), PASSES)
            row[f"x{lvl}_sec"] = round(secs[lvl], 3)
            for f in frames:
                f.unpersist(True)
        base_lvl = LEVELS[0]
        for lvl in LEVELS[1:]:
            # honest labels: the ratio names its own baseline, so an
            # override like LEVELS=10,100 cannot masquerade as vs-x1
            key = f"r{lvl}" if base_lvl == 1 else f"r{lvl}_vs_x{base_lvl}"
            row[key] = round(secs[lvl] / secs[base_lvl], 2)
        out["shapes"][name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
