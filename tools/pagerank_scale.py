#!/usr/bin/env python3
"""PageRank scale spot-check on an EDGE-amplified graph.

tools/scale_spotcheck.py amplifies documents/embeddings, but
graph_pagerank reads orders/lineitem — its scale evidence was one
sf0.01 -> sf0.1 point. This tool closes that gap: the sf0.1
customer->supplier edge frame is amplified AMPLIFY x by unioning
node-id-offset DISJOINT copies (same per-copy structure, AMPLIFY x
edges and nodes), and pagerank_fixed_point runs on both. Disjoint
copies leave per-copy ranks identical to the base graph (verified via
total-mass proportionality), so the measured ratio isolates RUNTIME
scaling of the per-round join+aggregate, which should sit near the
stage-latency floor (rounds x scheduling) rather than the data volume
— the claim SCALE.md records.

Prints one JSON line: {"amplify": A, "base_sec": .., "amp_sec": ..,
"ratio": .., "base_edges": .., "amp_edges": ..}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

AMPLIFY = 16


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
    spark = get_spark("pagerank_scale")

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    base = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
    )
    # materialize the edge build once so both timings measure PAGERANK,
    # not the orders x lineitem join
    base = base.localCheckpoint(eager=True)
    n_base = base.count()
    offset = (
        base.agg(F.greatest(F.max("src"), F.max("dst"))).collect()[0][0] + 1
    )
    amp = base
    for c in range(1, AMPLIFY):
        amp = amp.unionAll(
            base.select(
                (F.col("src") + c * offset).alias("src"),
                (F.col("dst") + c * offset).alias("dst"),
            )
        )
    amp = amp.repartition(64, "src").localCheckpoint(eager=True)
    n_amp = amp.count()

    def run(edges) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            pagerank_fixed_point(
                edges, n_iters=PR_ITERS, scale=PR_SCALE
            ).agg(F.sum("r")).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    base_sec = run(base)
    amp_sec = run(amp)
    print(
        json.dumps(
            {
                "amplify": AMPLIFY,
                "iters": PR_ITERS,
                "base_edges": n_base,
                "amp_edges": n_amp,
                "base_sec": round(base_sec, 3),
                "amp_sec": round(amp_sec, 3),
                "ratio": round(amp_sec / base_sec, 2),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
