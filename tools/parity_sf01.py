#!/usr/bin/env python3
"""Corpus parity at sf0.1 — ten times the driver's checked scale.

The grading driver (and tests/test_corpus_parity.py) verify every query
against its DuckDB oracle at sf0.01. This tool replays the SAME
comparison at sf0.1 for every query whose ORACLE is tractable there —
extra evidence that correctness is not an artifact of the small scale
factor (partition-count-sensitive bugs, overflow at larger aggregates,
tie-handling across more duplicates all surface with 10x the data).

Skipped: queries whose DuckDB oracle is quadratic-or-worse in corpus
size (the brute-force similarity baseline and everything composed on it,
the PQ/SQ/IVF oracles' N x N CTEs, pairwise dedup verifies) — the SPARK
side scales; the sequential oracle does not. Their correctness evidence
remains the sf0.01 driver check plus SCALE.md's 10x runtime points.

Usage: python3 tools/parity_sf01.py [--include-slow]
Prints one JSON line {"checked": N, "ok": N, "failed": [...], "skipped": N}.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# oracles quadratic in corpus size (or composed on one): skip at sf0.1
SKIP_QUADRATIC_ORACLE = {
    # brute-force N^2 cosine baseline + everything reusing it
    "sim_cosine_pairs",
    "sim_topk_neighbors",
    "sim_mmr_rerank",
    "sim_knn_classify",
    "sim_ann_lsh_recall",
    "sim_ann_ivf_recall",
    "sim_quant_recall",
    "sim_ivfpq_recall",
    "sim_binary_recall",
    "dedup_embedding_cosine",
    # IVF/PQ/SQ oracles assign every vector vs every centroid via a CROSS
    # JOIN CTE and re-rank with N-sized windows — fine at sf0.01, hours in
    # sequential DuckDB at sf0.1
    "sim_ann_ivf_topk",
    "sim_ann_ivf_kmeans",
    "sim_ann_ivf_indexed",
    "sim_ann_ivf_incremental",
    "sim_pq_topk",
    "sim_pq_indexed",
    "sim_pq_refined",
    "sim_sq8_topk",
    "sim_ivfpq_topk",
    "sim_binary_hamming_topk",
    "sim_binary_refined",
    "cluster_kmeans_embeddings",
    "dedup_semantic_blocked_capped",
    "dedup_semantic_blocked_scaled_k",
    # pairwise shingle-join dedup oracles (candidate x candidate verify)
    "dedup_minhash_lsh",
    "dedup_minhash_lsh_capped",
    "dedup_minhash_recall",
    "dedup_minhash_incremental",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_containment",
    "dedup_fuzzy_names",
    "streaming_incremental_dedup",
}


def main() -> None:
    import __spark_entry__ as entry
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from tests.oracle_harness import assert_frames_match, run_duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
    include_slow = "--include-slow" in sys.argv

    # the engine session factory (16g driver default): a bare default
    # session OOMs the JVM partway through the sweep at sf0.1
    spark = get_spark("parity_sf01")
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = entry.queries(), entry.oracle_sql()
    failed: list[str] = []
    checked = 0
    skipped = 0
    for name, fn in qs.items():
        if name not in osql:
            skipped += 1
            continue
        if not include_slow and name in SKIP_QUADRATIC_ORACLE:
            skipped += 1
            continue
        try:
            assert_frames_match(fn(spark, sf_dir), run_duckdb(osql[name], sf_dir), name)
            checked += 1
        except Exception:
            checked += 1
            failed.append(name)
            print(f"FAIL {name}", file=sys.stderr)
            traceback.print_exc(limit=3, file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "checked": checked,
                "ok": checked - len(failed),
                "failed": failed,
                "skipped": skipped,
            }
        )
    )
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
