#!/usr/bin/env python3
"""k-core / LPA scale spot-check on an EDGE-amplified graph.

Same technique as tools/pagerank_scale.py (the documents/embeddings
amplifier cannot reach lineitem-derived graphs): the sf0.1 co-purchase
support-filtered edge frame is amplified AMPLIFY x by unioning
node-id-offset DISJOINT copies, and the fixed-round peel
(operators/graph.py::kcore_peel) and label propagation
(::label_propagation) run on both. Disjoint copies preserve per-copy
structure exactly (each copy peels / labels identically to the base),
so the ratio isolates RUNTIME scaling of the per-round join+aggregate
— expected near the stage-latency floor (rounds x scheduling), the
claim SCALE.md records for the whole iterative family.

Prints one JSON line:
{"amplify": A, "base_edges": .., "amp_edges": ..,
 "kcore": {"base_sec": .., "amp_sec": .., "ratio": ..},
 "lpa": {...}}
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
        bfs_distances,
        kcore_peel,
        label_propagation,
    )
    from project_crypto_data_engineering_gcp_spark.plans.queries_graph import (
        BFS_ROUNDS,
        BFS_SEED_MOD,
        KCORE_K,
        KCORE_ROUNDS,
        LPA_ROUNDS,
        _basket_edges,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("graph_iter_scale")

    base = (
        _basket_edges(spark, sf_dir)
        .select("u", "v")
        .localCheckpoint(eager=True)
    )
    n_base = base.count()
    offset = base.agg(F.greatest(F.max("u"), F.max("v"))).collect()[0][0] + 1
    amp = base
    for c in range(1, AMPLIFY):
        amp = amp.unionAll(
            base.select(
                (F.col("u") + c * offset).alias("u"),
                (F.col("v") + c * offset).alias("v"),
            )
        )
    amp = amp.repartition(64, "u").localCheckpoint(eager=True)
    n_amp = amp.count()

    def run(fn, edges) -> float:
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(edges).agg(F.count(F.lit(1))).collect()
            best = min(best, time.perf_counter() - t0)
        return best

    out = {"amplify": AMPLIFY, "base_edges": n_base, "amp_edges": n_amp}
    for name, fn in (
        ("kcore", lambda e: kcore_peel(e, k=KCORE_K, rounds=KCORE_ROUNDS)),
        ("lpa", lambda e: label_propagation(e, rounds=LPA_ROUNDS)),
        # r6: the fourth iterative shape — frontier expansion (amplified
        # copies shift the seed pattern per copy; density is preserved,
        # which is what the runtime ratio isolates)
        ("bfs", lambda e: bfs_distances(e, seed_mod=BFS_SEED_MOD, rounds=BFS_ROUNDS)),
    ):
        b, a = run(fn, base), run(fn, amp)
        out[name] = {
            "base_sec": round(b, 3),
            "amp_sec": round(a, 3),
            "ratio": round(a / b, 2),
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
