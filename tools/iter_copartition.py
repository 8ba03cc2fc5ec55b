#!/usr/bin/env python3
"""LPA / BFS co-partitioning experiment (r8, follow-on to
tools/pagerank_copartition.py): the same loop-invariant-frame insight —
`localCheckpoint` scans report UnknownPartitioning under AQE, so the
per-round join re-exchanges the edge-sized symmetrized frame every
round. `edge_partitions` caches it pre-partitioned/pre-sorted on the
join key once; only the node-sized label/frontier frame moves per
round.

Times both variants on the amplified basket-edge frame and asserts the
outputs are bit-identical. Prints one JSON line per level plus a
summary.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_common import amplify, assert_same_rows, timed

LEVELS = tuple(
    int(x) for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "16,100").split(",")
)
PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))
EDGE_PARTITIONS = 64


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.graph import (
        bfs_distances,
        label_propagation,
    )
    from project_crypto_data_engineering_gcp_spark.plans.queries_graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        LPA_ROUNDS,
        _basket_edges,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("iter_copartition")

    # EDGE_SOURCE=basket (default): the corpus queries' own graph —
    # tiny (3.6k edges at sf0.1), floor-bound even at x100.
    # EDGE_SOURCE=pr: the customer-supplier bipartite frame the pagerank
    # sweep uses (600k edges at sf0.1) — the data-bound regime.
    if os.environ.get("SPARK_GRAFT_EDGE_SOURCE", "basket") == "pr":
        from project_crypto_data_engineering_gcp_spark.sources.tables import (
            load_table,
        )

        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        base = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("u"),
                (F.col("l_suppkey") * 2 + 1).alias("v"),
            )
            .localCheckpoint(eager=True)
        )
    else:
        base = (
            _basket_edges(spark, sf_dir)
            .select("u", "v")
            .localCheckpoint(eager=True)
        )
    shapes = {
        "lpa": (
            lambda e: label_propagation(e, rounds=LPA_ROUNDS),
            lambda e: label_propagation(
                e, rounds=LPA_ROUNDS, edge_partitions=EDGE_PARTITIONS
            ),
            ["node", "community"],
        ),
        "bfs": (
            lambda e: bfs_distances(e, seed_mod=BFS_SEED_MOD, rounds=BFS_ROUNDS),
            lambda e: bfs_distances(
                e,
                seed_mod=BFS_SEED_MOD,
                rounds=BFS_ROUNDS,
                edge_partitions=EDGE_PARTITIONS,
            ),
            ["node", "d"],
        ),
    }
    out = {
        "base_edges": base.count(),
        "edge_partitions": EDGE_PARTITIONS,
        "passes": PASSES,
        "shapes": {},
    }
    for name, (baseline, copart, cols) in shapes.items():
        rows: dict[str, dict] = {}
        for lvl in LEVELS:
            # persist, not localCheckpoint: the amplified input must be
            # deterministically reclaimable per level (code-review r8 —
            # accumulated checkpoint blocks contaminate later timings)
            edges = amplify(spark, base, lvl, ("u", "v")).repartition(
                64, "u"
            ).persist()
            edges.count()
            t_base = timed(lambda: baseline(edges), PASSES)
            t_co = timed(lambda: copart(edges), PASSES)
            # full-outer identity: missing/extra rows fail too
            assert_same_rows(
                baseline(edges), copart(edges), cols[0], cols[1],
                f"{name} x{lvl}",
            )
            edges.unpersist(True)
            row = {
                "baseline_sec": round(t_base, 3),
                "copart_sec": round(t_co, 3),
                "ratio": round(t_co / t_base, 3),
            }
            rows[f"x{lvl}"] = row
            print(json.dumps({name: {f"x{lvl}": row}}), flush=True)
        out["shapes"][name] = rows
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
