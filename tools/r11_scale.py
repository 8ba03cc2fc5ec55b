#!/usr/bin/env python3
"""TWO-decade (x1 -> x10 -> x100) scale curve for the r11 additions'
shapes: the multi-level band-refinement weighted median on a
concentrated value domain (the o9/pathological case the r10 residual
lever documented), the Palma tail shares (grouped_global_rank + decile
conditional aggregate), the fact-fact order-total reconciliation join,
the sweep-line peak concurrency (global_prefix_sum over 2x boundary
rows), the hapax vocabulary share, and the per-source hash reservoir
(grouped_global_rank, k-filter).

Same technique and discipline as tools/r8/r9/r10_scale.py: sf0.1 base
frames amplified by N disjoint key-offset copies, per-level inputs
persisted + materialized outside the timing and blocking-unpersisted
before the next level. Group keys scale (group count grows,
populations fixed) — the production posture for every shape here.
Prints one JSON line per shape plus a summary.
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
RESERVOIR_K = 5


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.rank import (
        global_prefix_sum,
        grouped_global_rank,
    )
    from project_crypto_data_engineering_gcp_spark.operators.wmedian import (
        grouped_weighted_median,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r11_scale")

    orders0 = load_table(spark, sf_dir, "orders")
    cust0 = load_table(spark, sf_dir, "customer")
    events0 = load_table(spark, sf_dir, "events")
    li0 = load_table(spark, sf_dir, "lineitem")
    docs0 = load_table(spark, sf_dir, "documents")

    # o9 grain: (gkey, qty_centi, w) — whole domain inside one 1e5 band
    qty = (
        li0.select(
            F.xxhash64("l_returnflag").alias("gkey"),
            (F.col("l_quantity") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("qty_centi"),
            (F.col("l_extendedprice") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )
    # a39 grain: (nationkey, custkey, cents)
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
        .localCheckpoint(eager=True)
    )
    # reconciliation grains: order headers + per-order lineitem totals
    ohead = orders0.select(
        "o_orderkey",
        F.xxhash64("o_orderpriority").alias("pr"),
        (F.col("o_totalprice") * 100)
        .cast("decimal(18,0)")
        .cast("bigint")
        .alias("o_cents"),
    ).localCheckpoint(eager=True)
    liagg = (
        li0.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(
            F.sum((F.col("l_extendedprice") * 100).cast("decimal(18,0)"))
            .cast("bigint")
            .alias("li_cents")
        )
        .localCheckpoint(eager=True)
    )
    # concurrency grain: (tsec, event_id)
    evt = events0.select(
        F.unix_timestamp("ts").alias("tsec"), "event_id"
    ).localCheckpoint(eager=True)
    # hapax grain: (src, tok) hashed
    st = docs0.select(
        F.xxhash64("source").alias("src"),
        F.explode(F.split(F.lower(F.col("text")), r"[^\p{L}\p{Nd}]+")).alias("t"),
    ).filter(F.length("t") > 0).select(
        "src", F.xxhash64("t").alias("tok")
    ).localCheckpoint(eager=True)
    # reservoir grain: (src, doc_id)
    sd = docs0.select(
        F.xxhash64("source").alias("src"), "doc_id"
    ).localCheckpoint(eager=True)

    def wmedian_multilevel(q):
        return grouped_weighted_median(
            q, ["gkey"], "qty_centi", "w", band_widths=(100_000, 1_000)
        )

    def tail_shares(r):
        ranked = grouped_global_rank(
            r, ["nationkey"], [F.col("cents").desc(), "custkey"], rank_col="rk"
        )
        counts = ranked.groupBy("nationkey").agg(F.count(F.lit(1)).alias("n"))
        w = F.col("cents").cast("decimal(38,0)")
        return (
            ranked.join(F.broadcast(counts), "nationkey")
            .groupBy("nationkey", "n")
            .agg(
                F.sum(w).alias("tot"),
                F.sum(
                    F.when(F.col("rk") <= F.expr("(n + 9) DIV 10"), w).otherwise(
                        F.lit(0).cast("decimal(38,0)")
                    )
                ).alias("top_c"),
                F.sum(
                    F.when(
                        F.col("rk") > F.col("n") - F.expr("(4 * n) DIV 10"), w
                    ).otherwise(F.lit(0).cast("decimal(38,0)"))
                ).alias("bot_c"),
            )
        )

    def reconciliation(oh, la):
        j = oh.join(la, "o_orderkey", "left")
        has = F.col("li_cents").isNotNull()
        diff = F.abs(F.col("li_cents") - F.col("o_cents"))
        return j.groupBy("pr").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(~has, 1).otherwise(0)).alias("n_none"),
            F.sum(
                F.when(has & (F.col("li_cents") != F.col("o_cents")), 1).otherwise(0)
            ).alias("n_mismatch"),
            F.max(F.when(has, diff)).alias("mx"),
        )

    def peak_concurrency(e):
        starts = e.select("tsec", F.lit(1).alias("delta"), "event_id")
        ends = e.select(
            (F.col("tsec") + 300).alias("tsec"), F.lit(-1).alias("delta"), "event_id"
        )
        b = starts.unionByName(ends)
        c = global_prefix_sum(b, ["tsec", "delta", "event_id"], ["delta"])
        return (
            c.filter(F.col("delta") == 1)
            .groupBy(F.expr("tsec DIV 86400").alias("day"))
            .agg(F.max("cum_delta").alias("peak"))
        )

    def hapax(frame):
        per_st = frame.groupBy("src", "tok").agg(F.count(F.lit(1)).alias("cnt"))
        return per_st.groupBy("src").agg(
            F.sum("cnt").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_types"),
            F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0)).alias("n_hapax"),
        )

    def reservoir(frame):
        h = frame.select("src", "doc_id", F.xxhash64("doc_id").alias("hv"))
        ranked = grouped_global_rank(h, ["src"], ["hv", "doc_id"], rank_col="rk")
        return ranked.filter(F.col("rk") <= RESERVOIR_K)

    shapes = {
        "wmedian_multilevel": (
            wmedian_multilevel,
            [(qty, {"gkey": 1_000_000, "qty_centi": 0, "w": 0})],
        ),
        "tail_shares": (
            tail_shares,
            [(rev, {"nationkey": 1000, "custkey": 10_000_000, "cents": 0})],
        ),
        "reconciliation": (
            reconciliation,
            [
                (ohead, {"o_orderkey": 100_000_000, "pr": 0, "o_cents": 0}),
                (liagg, {"o_orderkey": 100_000_000, "li_cents": 0}),
            ],
        ),
        "peak_concurrency": (
            peak_concurrency,
            [(evt, {"tsec": 0, "event_id": 100_000_000})],
        ),
        "hapax": (
            hapax,
            [(st, {"src": 1_000_000, "tok": 0})],
        ),
        "reservoir": (
            reservoir,
            [(sd, {"src": 1_000_000, "doc_id": 100_000_000})],
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
