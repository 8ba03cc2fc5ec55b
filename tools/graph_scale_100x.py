#!/usr/bin/env python3
"""TWO-decade (x1 -> x16 -> x100) scale curve for the iterative graph
family: pagerank, k-core, label propagation, BFS (r6 verdict task 5 —
the round-latency-floor claim measured past one decade).

Technique: the sf0.1 edge frames are amplified by N DISJOINT
node-id-offset copies. Unlike tools/pagerank_scale.py's union loop
(fine at x16, a 100-way union plan at x100), the copies come from ONE
crossJoin with a broadcast range(N) — a single narrow stage, no
shuffle, identical semantics: per-copy structure is preserved exactly,
so the ratio isolates RUNTIME scaling of the per-round join+aggregate.
The expected profile is the stage-latency floor (rounds x scheduling)
up to the point where a round's join becomes data-bound; at x100
(~60M edges for the pagerank frame) the per-round join IS data-bound,
so the honest expectation is sub-linear-in-100 wall growth, not
flatness.

Prints one JSON line:
{"base_edges": {...}, "shapes": {"pagerank": {"x1_sec": ..,
 "x16_sec": .., "x100_sec": .., "r16": .., "r100": ..}, ...}}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

LEVELS = (1, 16, 100)
PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))


def amplify(spark, edges, n: int, cols: tuple[str, str]):
    """n disjoint node-id-offset copies via one broadcast crossJoin."""
    if n == 1:
        return edges
    a, b = cols
    offset = edges.agg(F.greatest(F.max(a), F.max(b))).collect()[0][0] + 1
    copies = F.broadcast(spark.range(n).select(F.col("id").alias("_copy")))
    return edges.crossJoin(copies).select(
        (F.col(a) + F.col("_copy") * offset).alias(a),
        (F.col(b) + F.col("_copy") * offset).alias(b),
    )


def timed(fn, edges) -> float:
    best = float("inf")
    for _ in range(PASSES):
        t0 = time.perf_counter()
        fn(edges).agg(F.count(F.lit(1))).collect()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.graph import (
        bfs_distances,
        kcore_peel,
        label_propagation,
        pagerank_fixed_point,
    )
    from project_crypto_data_engineering_gcp_spark.plans.queries_graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        KCORE_K,
        KCORE_ROUNDS,
        LPA_ROUNDS,
        PR_ITERS,
        PR_SCALE,
        _basket_edges,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graph_scale_100x")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    pr_base = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )
    iter_base = (
        _basket_edges(spark, sf_dir).select("u", "v").localCheckpoint(eager=True)
    )

    shapes = {
        "pagerank": (
            pr_base,
            ("src", "dst"),
            lambda e: pagerank_fixed_point(e, n_iters=PR_ITERS, scale=PR_SCALE),
        ),
        "kcore": (
            iter_base,
            ("u", "v"),
            lambda e: kcore_peel(e, k=KCORE_K, rounds=KCORE_ROUNDS),
        ),
        "lpa": (
            iter_base,
            ("u", "v"),
            lambda e: label_propagation(e, rounds=LPA_ROUNDS),
        ),
        "bfs": (
            iter_base,
            ("u", "v"),
            lambda e: bfs_distances(e, seed_mod=BFS_SEED_MOD, rounds=BFS_ROUNDS),
        ),
    }

    out = {
        "levels": list(LEVELS),
        "passes": PASSES,
        "base_edges": {
            "pagerank": pr_base.count(),
            "iter": iter_base.count(),
        },
        "shapes": {},
    }
    for name, (base, cols, fn) in shapes.items():
        row: dict[str, float] = {}
        secs: dict[int, float] = {}
        for lvl in LEVELS:
            edges = amplify(spark, base, lvl, cols)
            if lvl > 1:
                # materialize the amplified frame so the timing isolates
                # the iterative rounds, not the amplification
                edges = edges.repartition(64, cols[0]).localCheckpoint(eager=True)
            secs[lvl] = timed(fn, edges)
            row[f"x{lvl}_sec"] = round(secs[lvl], 3)
        row["r16"] = round(secs[16] / secs[1], 2)
        row["r100"] = round(secs[100] / secs[1], 2)
        out["shapes"][name] = row
        print(json.dumps({name: row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
