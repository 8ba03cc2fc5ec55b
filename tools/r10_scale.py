#!/usr/bin/env python3
"""TWO-decade (x1 -> x10 -> x100) scale curve for the r10 additions'
heavy shapes: the Atkinson one-pass inequality aggregate, the KM
survival subjects pipeline (user-keyed agg + join + anti-join + bucket
prefix + curve fold), the 7-day coverage-expansion rolling distinct,
the brand-scaled weighted median, and the capped two-hop wedge
expansion. (sim_radius_search_ivf is omitted: its index side is the
IVF family already on the r4/r9 curves, its probe side is bounded by
contract, and the corpus-vs-corpus join cost is measured by
tools/semantic_bucketed.py.)

Same technique and discipline as tools/r8_scale.py / r9_scale.py:
sf0.1 base frames amplified by N disjoint key-offset copies, per-level
inputs persisted + materialized outside the timing and
blocking-unpersisted before the next level. Amplification models the
production posture per shape: user/customer/brand/node ids scale, so
per-group populations stay fixed while group count grows. Prints one
JSON line per shape plus a summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Window, functions as F

from bench_common import amplify_cols as amplify, filter_shapes, timed

LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "1,10,100").split(",")
)
PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))
DAY = 86400
HUB_CAP = 10


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.rank import (
        global_prefix_sum,
        grouped_global_prefix_sum,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r10_scale")

    orders0 = load_table(spark, sf_dir, "orders")
    cust0 = load_table(spark, sf_dir, "customer")
    events0 = load_table(spark, sf_dir, "events")
    li0 = load_table(spark, sf_dir, "lineitem")
    part0 = load_table(spark, sf_dir, "part")

    # (nationkey, custkey, cents): the a38 input grain
    rev = (
        orders0.join(cust0, orders0.o_custkey == cust0.c_custkey)
        .groupBy(
            F.col("c_nationkey").alias("nationkey"),
            F.col("o_custkey").alias("custkey"),
        )
        .agg(
            F.sum((F.col("o_totalprice") * 100).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("cents")
        )
        .filter(F.col("cents") > 0)
        .localCheckpoint(eager=True)
    )
    view_purch = (
        events0.filter(F.col("event_type").isin("view", "purchase"))
        .select("user_id", "event_type", F.unix_timestamp("ts").alias("tsec"))
        .localCheckpoint(eager=True)
    )
    user_day = (
        events0.select(
            "user_id",
            (F.floor(F.unix_timestamp("ts") / DAY) * DAY).alias("dsec"),
        )
        .localCheckpoint(eager=True)
    )
    brand_price = (
        li0.join(
            part0.select(F.col("p_partkey").alias("l_partkey"), "p_brand"),
            "l_partkey",
        )
        .select(
            F.xxhash64("p_brand").alias("brand"),
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
    # co-purchase edges (same builder as the graph family, support >= 3)
    li_keys = li0.select("l_orderkey", "l_partkey").distinct()
    a, b = li_keys.alias("a"), li_keys.alias("b")
    edges0 = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.count(F.lit(1)).alias("s"))
        .filter(F.col("s") >= 3)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )

    def atkinson(r):
        s = r.groupBy("nationkey").agg(
            F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
            F.sum(F.col("cents").cast("decimal(38,0)")).alias("sx"),
            F.sum(
                F.expr("CAST(1000000000000 DIV cents AS BIGINT)").cast(
                    "decimal(38,0)"
                )
            ).alias("sr"),
        )
        return s.select(
            "nationkey",
            F.expr(
                "1000000 - (CAST(1000000 AS DECIMAL(38,0)) * n * n"
                " * CAST(1000000000000 AS DECIMAL(38,0))) DIV (sr * sx)"
            ).alias("a2"),
        )

    def survival(ev):
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
            .select(
                "user_id",
                F.expr("CAST((t3 - t1) DIV 3600 AS BIGINT)").alias("time_h"),
                F.lit(1).alias("evt"),
            )
        )
        mx = ev.agg(F.max("tsec").alias("m"))
        cens = (
            s1.join(conv.select("user_id"), "user_id", "left_anti")
            .crossJoin(F.broadcast(mx))
            .select(
                F.expr("CAST((m - t1) DIV 3600 AS BIGINT)").alias("time_h"),
                F.lit(0).alias("evt"),
            )
        )
        subj = conv.select("time_h", "evt").unionByName(cens)
        tc = subj.groupBy("time_h").agg(
            F.count(F.lit(1)).alias("m"), F.sum("evt").alias("d")
        )
        cum = global_prefix_sum(tc, ["time_h"], ["m"])
        tot = tc.agg(F.sum("m").alias("tot"))
        evr = (
            cum.crossJoin(F.broadcast(tot))
            .select(
                F.col("time_h").cast("bigint").alias("time_h"),
                F.col("d").cast("bigint").alias("d"),
                (F.col("tot") - (F.col("cum_m") - F.col("m")))
                .cast("bigint")
                .alias("n"),
            )
            .filter(F.col("d") > 0)
        )
        return evr.agg(
            F.sort_array(F.collect_list(F.struct("time_h", "d", "n"))).alias(
                "arr"
            )
        ).select(
            F.explode(
                F.expr(
                    """
                    aggregate(
                      arr,
                      struct(CAST(1000000 AS BIGINT) AS s,
                             CAST(array() AS ARRAY<STRUCT<time_h: BIGINT,
                                  d: BIGINT, n: BIGINT, s: BIGINT>>) AS out),
                      (acc, x) -> struct(
                          (acc.s * (x.n - x.d)) DIV x.n AS s,
                          array_append(acc.out,
                              struct(x.time_h AS time_h, x.d AS d, x.n AS n,
                                     (acc.s * (x.n - x.d)) DIV x.n AS s))
                              AS out),
                      acc -> acc.out)
                    """
                )
            ).alias("row")
        )

    def rolling_distinct(ud):
        u = ud.distinct()
        days = ud.select(F.col("dsec").alias("wsec")).distinct()
        cover = u.select(
            "user_id",
            F.explode(
                F.array(*[F.col("dsec") + F.lit(i * DAY) for i in range(7)])
            ).alias("wsec"),
        )
        return (
            cover.join(days, "wsec")
            .groupBy("wsec")
            .agg(F.countDistinct("user_id").alias("au"))
        )

    def weighted_median(bp):
        # bucket refinement over RAW rows — the graded shape (see the
        # o8 docstring): pass 1 is a map-combinable domain-bounded
        # bucket aggregate; pass 2 touches only the median bucket.
        # Earlier candidates measured and rejected here: PARTITION BY
        # brand window (serial per brand), grouped_global_prefix_sum
        # (data-sized checkpoint, 507 s at x100), refinement over the
        # near-unique (brand, price) pre-agg (re-evaluated per
        # consumer, 377 s at x100).
        pb = bp.groupBy("brand", F.expr("price_cents DIV 100000").alias("b")).agg(
            F.sum("w").alias("wb")
        )
        wcum = (
            Window.partitionBy("brand")
            .orderBy("b")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        byb = Window.partitionBy("brand")
        pbc = pb.select(
            "brand",
            "b",
            (F.sum("wb").over(wcum) - F.col("wb")).alias("before"),
            F.sum("wb").over(byb).alias("tot"),
            (2 * F.sum("wb").over(wcum) >= F.sum("wb").over(byb)).alias("hit"),
        )
        mb = (
            pbc.filter("hit")
            .groupBy("brand")
            .agg(
                F.min_by(F.struct("b", "before"), "b").alias("m"),
                F.max("tot").alias("tot"),
            )
            .select(
                F.col("brand").alias("mb_brand"),
                F.col("m.b").alias("mb"),
                F.col("m.before").alias("before"),
                "tot",
            )
        )
        cand = (
            bp.join(
                F.broadcast(mb),
                (F.col("brand") == F.col("mb_brand"))
                & (F.expr("price_cents DIV 100000") == F.col("mb")),
            )
            .groupBy("brand", "price_cents", "before", "tot")
            .agg(F.sum("w").alias("w"))
        )
        win = (
            Window.partitionBy("brand")
            .orderBy("price_cents")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            cand.withColumn("cw", F.col("before") + F.sum("w").over(win))
            .filter(2 * F.col("cw") >= F.col("tot"))
            .groupBy("brand")
            .agg(F.min("price_cents").alias("med"))
        )

    def two_hop(e):
        adj = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        deg = adj.groupBy(F.col("u").alias("node")).agg(
            F.count(F.lit(1)).alias("d")
        )
        mid = deg.filter(F.col("d") <= HUB_CAP).select(
            F.col("node").alias("mid_node")
        )
        x, y = adj.alias("x"), adj.alias("y")
        two = (
            x.join(mid, F.col("x.v") == F.col("mid_node"))
            .join(y, F.col("y.u") == F.col("x.v"))
            .filter(F.col("y.v") != F.col("x.u"))
            .select(F.col("x.u").alias("u"), F.col("y.v").alias("v"))
        )
        reach = adj.select("u", "v").unionByName(two).distinct()
        return reach.groupBy("u").agg(F.count(F.lit(1)).alias("n"))

    shapes = {
        "atkinson": (
            atkinson,
            [(rev, {"nationkey": 1000, "custkey": 10_000_000, "cents": 0})],
        ),
        "survival": (
            survival,
            [(view_purch, {"user_id": 10_000_000, "event_type": 0, "tsec": 0})],
        ),
        "rolling_distinct": (
            rolling_distinct,
            [(user_day, {"user_id": 10_000_000, "dsec": 0})],
        ),
        "weighted_median": (
            weighted_median,
            [(brand_price, {"brand": 10_000_000, "price_cents": 0, "w": 0})],
        ),
        "two_hop": (
            two_hop,
            [(edges0, {"u": 100_000_000, "v": 100_000_000})],
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
