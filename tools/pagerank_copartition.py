#!/usr/bin/env python3
"""PageRank co-partitioning experiment (r7 verdict task 5).

The x100 sweep (tools/graph_scale_100x.py) measured 9.5x wall for 100x
edges — sublinear but shuffle-bound. Probe (r8): under AQE,
``localCheckpoint`` scans report UnknownPartitioning, so EVERY round's
join re-exchanges AND re-sorts the edge-sized frame. The 100-TB-cluster
idiom is to co-partition the static edge table once and ship only the
node-sized rank vector per round (GraphX's edge-partition design).

This tool times both variants of ``pagerank_fixed_point`` on the same
amplified edge frame:

  baseline      edges_deg localCheckpoint'ed (UnknownPartitioning;
                per-round edge exchange + sort)
  co-partition  edges_deg cached repartition(P, src) +
                sortWithinPartitions(src) (InMemoryRelation preserves
                partitioning/ordering; per-round exchange = rank frame
                + partial-agg shuffle only)

and asserts the two rank outputs are bit-identical. Prints one JSON
line: {"edges": N, "levels": {"x16": {"baseline_sec": ..,
"copart_sec": .., "ratio": ..}, ...}}
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
    int(x)
    for x in os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "16,100").split(",")
)
PASSES = int(os.environ.get("SPARK_GRAFT_SCALE_PASSES", "2"))
EDGE_PARTITIONS = 64


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from project_crypto_data_engineering_gcp_spark.plans.queries_graph import (
        PR_ITERS,
        PR_SCALE,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("pagerank_copartition")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    base = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )

    out = {"base_edges": base.count(), "edge_partitions": EDGE_PARTITIONS,
           "passes": PASSES, "levels": {}}
    for lvl in LEVELS:
        # persist, not localCheckpoint: deterministically reclaimable
        # per level (code-review r8)
        edges = amplify(spark, base, lvl, ("src", "dst")).repartition(
            64, "src"
        ).persist()
        edges.count()
        t_base = timed(
            lambda: pagerank_fixed_point(edges, n_iters=PR_ITERS, scale=PR_SCALE),
            PASSES,
        )
        t_co = timed(
            lambda: pagerank_fixed_point(
                edges,
                n_iters=PR_ITERS,
                scale=PR_SCALE,
                edge_partitions=EDGE_PARTITIONS,
            ),
            PASSES,
        )
        # full-outer identity: missing/extra rows fail too, not just
        # value mismatches on the intersection (code-review r8)
        assert_same_rows(
            pagerank_fixed_point(edges, n_iters=PR_ITERS, scale=PR_SCALE),
            pagerank_fixed_point(
                edges, n_iters=PR_ITERS, scale=PR_SCALE,
                edge_partitions=EDGE_PARTITIONS,
            ),
            "node", "r", f"x{lvl}",
        )
        edges.unpersist(True)
        row = {
            "baseline_sec": round(t_base, 3),
            "copart_sec": round(t_co, 3),
            "ratio": round(t_co / t_base, 3),
        }
        out["levels"][f"x{lvl}"] = row
        print(json.dumps({f"x{lvl}": row}), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
