#!/usr/bin/env python3
"""The k dial for cluster-blocked semantic dedup, measured (SCALE.md).

Three shapes over sf0.1 and the 10x amplified corpus
(tools/scale_spotcheck.py amplification):

  fixed-k   : k=8 at both sizes — the graded oracle shape; cluster
              populations grow 10x, so within-cluster pair work grows
              ~100x (the measured r3 scale-killer).
  scaled-k  : k = N / n_target held constant in POPULATION — k=8 at
              sf0.1, k=80 at 10x; per-cluster work stays flat, total
              work ~linear in N.
  capped    : fixed k=8 + per-cluster population cap (the graded
              *_capped twin's guardrail at production scale).

Prints one JSON line with runtime (min-of-3) and output pair counts.
Note the 10x embedding copies are EXACT duplicates (vectors can't be
tagged without changing geometry), so true pair counts at 10x are
legitimately quadratic in the copy factor — runtime vs k is the signal,
pair counts contextualize it.

Usage: python3 tools/semantic_k_dial.py   (~4-6 min)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_spotcheck import AMPLIFY, amplify  # noqa: E402 (sibling tool)

N_TARGET = 250  # sf0.1: 2000 vectors / k=8 -> population 250 held constant
CAP = 256  # production-scale population cap for the capped shape


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.plans.queries_similarity import (
        dedup_semantic_blocked,
    )
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amp = "/tmp/spark_graft_sf1_amplified"
    if not os.path.exists(f"{amp}/embeddings.parquet"):
        amplify(base, amp)

    spark = get_spark("semantic_k_dial")
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    def n_vectors(sf_dir: str) -> int:
        return spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()

    shapes = lambda n: {  # noqa: E731
        "fixed_k8": {"k": 8, "cluster_cap": None},
        f"scaled_k{max(8, n // N_TARGET)}": {
            "k": max(8, n // N_TARGET), "cluster_cap": None,
        },
        f"capped_k8_cap{CAP}": {"k": 8, "cluster_cap": CAP},
    }

    out: dict[str, dict] = {}
    for sf_dir, tag in ((base, "sf0.1"), (amp, "sf1eq")):
        spark.catalog.clearCache()
        n = n_vectors(sf_dir)
        runs: dict[str, dict] = {"n_vectors": n}
        for label, kw in shapes(n).items():
            best, rows = float("inf"), None
            for _ in range(3):  # min-of-3, same framing as scale_spotcheck
                t0 = time.perf_counter()
                rows = dedup_semantic_blocked(spark, sf_dir, **kw).count()
                best = min(best, time.perf_counter() - t0)
            runs[label] = {"sec": round(best, 3), "pairs": rows}
        out[tag] = runs
    print(json.dumps({"amplify": AMPLIFY, "n_target": N_TARGET, "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
