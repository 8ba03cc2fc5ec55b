#!/usr/bin/env python3
"""r13 decision sweep for the "value-grain last level" wmedian change
(r12 VERDICT next-round item 1): x1 -> x10 -> x100 key-offset
amplification of the two real call-site grains, OLD vs NEW band_widths,
same discipline as tools/r8..r12_scale.py (per-level inputs persisted +
materialized outside the timing, blocking-unpersisted between levels).

Grains (value DOMAIN fixed — it is the query's property; rows and
group count scale):
  o9 grain: concentrated domain (qty_centi in [100, 5000]) —
    OLD (1e5, 1e3) = 3 fact scans vs NEW () = 1 value-grain scan.
  o10 grain: wide price domain, p90 —
    OLD (1e5, 1e3) = 3 fact scans vs NEW (1e5,) = 2 scans.

Also runnable at SPARK_GRAFT_CPUS=8 vs 32 for the parallel-scaling
evidence (r12 VERDICT item 6): at x100 the shapes are data-bound, so
the core ratio is meaningful (unlike the sf0.1 bench, where every
8->32 ratio was ~1.0).

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


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.wmedian import (
        grouped_weighted_median,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13_wmedian_sweep")

    li0 = load_table(spark, sf_dir, "lineitem")

    # o9 grain: concentrated value domain [100, 5000]
    qt = (
        li0.select(
            F.xxhash64("l_returnflag").alias("gkey"),
            (F.col("l_quantity") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("v"),
            (F.col("l_extendedprice") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )
    # o10 grain: wide price domain, p90
    pr = (
        li0.select(
            F.xxhash64("l_returnflag", "l_linestatus").alias("gkey"),
            (F.col("l_extendedprice") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("v"),
            (F.col("l_quantity") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("w"),
        )
        .filter(F.col("w") > 0)
        .localCheckpoint(eager=True)
    )

    def wm(widths, ppm):
        def run(q):
            return grouped_weighted_median(
                q, ["gkey"], "v", "w", band_widths=widths, quantile_ppm=ppm
            )

        return run

    spec = {"gkey": 1_000_000, "v": 0, "w": 0}
    shapes = {
        "o9_grain_old_3scan": (wm((100_000, 1_000), 500_000), [(qt, spec)]),
        "o9_grain_new_1scan": (wm((), 500_000), [(qt, spec)]),
        "o10_grain_old_3scan": (wm((100_000, 1_000), 900_000), [(pr, spec)]),
        "o10_grain_new_2scan": (wm((100_000,), 900_000), [(pr, spec)]),
    }
    shapes = filter_shapes(shapes)
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count()))
    out = {"levels": list(LEVELS), "passes": PASSES, "cpus": cpus, "shapes": {}}
    for name, (builder, specs) in shapes.items():
        row: dict[str, float] = {}
        secs: dict[int, float] = {}
        for lvl in LEVELS:
            frames = [
                amplify(spark, base, lvl, spec_).persist() for base, spec_ in specs
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
