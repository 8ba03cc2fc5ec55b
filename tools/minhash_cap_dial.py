#!/usr/bin/env python3
"""Empirical recall/cost dial for ``dedup_minhash_lsh``'s hot_band_cap
(SCALE.md evidence, r3 verdict task 6).

Runs the minhash+LSH dedup at sf0.1 and at the 10x amplified corpus
(tools/scale_spotcheck.py's workload-shape-preserving amplification)
with hot_band_cap OFF (the exact-LSH baseline) and at two production
cap values. Because the cap only drops CANDIDATES and survivors pass
the identical exact-jaccard verify, the capped output is a strict
subset of the uncapped output — verified here, so

    recall = |capped pairs| / |uncapped pairs|

is the true pair recall, and runtime vs recall is the dial. Prints one
JSON line.

Usage: python3 tools/minhash_cap_dial.py   (~3-5 min)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_spotcheck import AMPLIFY, amplify  # noqa: E402 (sibling tool)

# one cap above the corpus's natural band-bucket ceiling (pure insurance:
# prunes nothing, costs only the count-window) and one below it (prunes,
# trading recall) — together they locate the dial's bite point
CAPS = (16, 2)


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.plans.queries_dedup import (
        dedup_minhash_lsh,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amp = "/tmp/spark_graft_sf1_amplified"
    if not os.path.exists(f"{amp}/embeddings.parquet"):
        amplify(base, amp)

    spark = get_spark("minhash_cap_dial")
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    out: dict[str, dict] = {}
    for sf_dir, tag in ((base, "sf0.1"), (amp, "sf1eq")):
        spark.catalog.clearCache()
        results: dict[str, dict] = {}
        pair_sets: dict[object, set] = {}
        for cap in (None,) + CAPS:
            best = float("inf")
            rows = None
            for _ in range(3):  # min-of-3, same framing as scale_spotcheck
                t0 = time.perf_counter()
                rows = dedup_minhash_lsh(spark, sf_dir, hot_band_cap=cap).collect()
                best = min(best, time.perf_counter() - t0)
            pair_sets[cap] = {(r["doc_a"], r["doc_b"]) for r in rows}
            label = "uncapped" if cap is None else f"cap{cap}"
            results[label] = {"sec": round(best, 3), "pairs": len(pair_sets[cap])}
        for cap in CAPS:
            assert pair_sets[cap] <= pair_sets[None], (
                f"cap {cap} produced pairs outside the uncapped output"
            )
            results[f"cap{cap}"]["recall"] = round(
                len(pair_sets[cap]) / len(pair_sets[None]), 4
            ) if pair_sets[None] else 1.0
        out[tag] = results
    print(json.dumps({"amplify": AMPLIFY, "caps": list(CAPS), "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
