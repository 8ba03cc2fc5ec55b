#!/usr/bin/env python3
"""sf1-equivalent spot-check for the dedup/ANN family (SCALE.md evidence).

There is no driver-generated sf1 testdata, so this builds a deterministic
10x amplification of sf0.1 under /tmp and times the scale-sensitive
queries at both sizes. Amplification preserves workload SHAPE:

- documents: 10 copies with offset doc_ids; every word in copy c > 0 is
  tagged ``word~c``, so every 3-gram shingle is copy-local. Each copy
  reproduces the original's near-dup pairs and shingle-df distribution
  exactly, and no cross-copy pair can match -> duplicate DENSITY and
  hot-shingle skew are constant while volume grows 10x (copying without
  the tag would instead make every document a 10-way exact dup and
  explode the pair count quadratically - a different, artificial
  workload).
- embeddings: 10 copies with offset vec_ids, vectors unchanged. Copies
  land in the same IVF cell, so cell populations scale 10x - the honest
  stress for the probe-join path. Top-k ties between copies are fine;
  only runtime is measured here (correctness is the driver's oracle
  check at sf0.01).

Usage: python3 tools/scale_spotcheck.py  (~2-4 min; prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMPLIFY = 10
QUERIES = (
    "dedup_minhash_lsh_capped",
    "dedup_ngram_jaccard_capped",
    "sim_ann_ivf_topk",
    "sim_ann_ivf_indexed",
    "cluster_kmeans_embeddings",
    "sim_pq_topk",
    "dedup_semantic_blocked",  # r5: de-registered contrast shape (EXTRA_FNS)
    "dedup_semantic_blocked_capped",  # r4: the Σ n_c² guardrail, measured
    "dedup_containment",
    # r4 second batch: hot-gram excision (hot set grows with distinct
    # boilerplate, 10x here by construction), PQ re-rank (shortlist-
    # bounded exact stage), int8 SQ linear scan
    "text_boilerplate_ngrams",
    "sim_pq_refined",
    "sim_sq8_topk",
    # late-r4: IVFPQ (gate fan-out scales with cell population — the
    # honest stress here since copies share cells), BM25 (scan-stage
    # expressions, should be ~linear), temperature mix (two groupBys)
    "sim_ivfpq_topk",
    "text_bm25_topk",
    "curate_temperature_mix",
    # r5: binary Hamming scan (16 bytes/vector linear scan — should be
    # ~flat), its exact re-rank (shortlist-bounded stage 2), and the
    # trigram-novelty explode-join (~linear in trigram volume)
    "sim_binary_hamming_topk",
    "sim_binary_refined",
    "text_trigram_novelty",
    # late-r5: the CM sketch build — shuffle bounded at sketch-size per
    # partition by map-side combine, so the 10x point should be ~flat
    # modulo the token-stream scan itself
    "approx_countmin_tokens",
    # late-r5: incremental IVF — per-run cost is the 10%-batch assignment
    # + serve; the base index is pooled (warm passes measure serve-only)
    "sim_ann_ivf_incremental",
    # r6: binary-payload SimHash near-dedup after the 64-bit/16-bit-band
    # + hot-band-cap hardening — the amplifier is density-constant
    # (copy-local grams -> cross-copy collisions only at the 1/2^16
    # random floor), so candidate growth here should be ~10x, unlike the
    # sf0.01->sf0.1 comparison where true near-dup DENSITY itself grows
    "mm_simhash_payload",
)


def amplify(src_dir: str, dst_dir: str) -> None:
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    docs = f"{src_dir}/documents.parquet"
    n_docs = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{docs}')"
    ).fetchone()[0]
    copies = " UNION ALL ".join(
        f"""SELECT doc_id + {c * n_docs} AS doc_id,
               {'text' if c == 0 else
                f"array_to_string(list_transform(string_split(text, ' '), w -> w || '~{c}'), ' ')"} AS text,
               lang, source, n_chars
            FROM read_parquet('{docs}')"""
        for c in range(AMPLIFY)
    )
    con.execute(f"COPY ({copies}) TO '{dst_dir}/documents.parquet' (FORMAT PARQUET)")

    emb = f"{src_dir}/embeddings.parquet"
    n_vec = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{emb}')"
    ).fetchone()[0]
    vcopies = " UNION ALL ".join(
        f"SELECT vec_id + {c * n_vec} AS vec_id, embedding, label "
        f"FROM read_parquet('{emb}')"
        for c in range(AMPLIFY)
    )
    con.execute(f"COPY ({vcopies}) TO '{dst_dir}/embeddings.parquet' (FORMAT PARQUET)")


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.plans import all_queries
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amp = "/tmp/spark_graft_sf1_amplified"
    if not os.path.exists(f"{amp}/embeddings.parquet"):
        amplify(base, amp)

    from project_crypto_data_engineering_gcp_spark.plans.queries_similarity import (
        dedup_semantic_blocked,
    )

    spark = get_spark("scale_spotcheck")
    qs = all_queries()
    # non-graded contrast shapes still measured for SCALE.md's honesty rows
    extra_fns = {"dedup_semantic_blocked": dedup_semantic_blocked}
    qs["q1_pricing_summary"].fn(spark, base).count()  # JVM/codegen warmup
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    out: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((base, "sf0.1"), (amp, "sf1eq")):
        spark.catalog.clearCache()
        for name in QUERIES:
            best = float("inf")
            # 3 passes: pass 1 pays shingle/index cache population, and this
            # box's throughput swings ~2x with load — min-of-3 is the
            # steady-state number that predicts the next scale-up
            fn = qs[name].fn if name in qs else extra_fns[name]
            for _ in range(3):
                t0 = time.perf_counter()
                n = fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[tag] = round(best, 3)
            out[name][f"{tag}_rows"] = n
    for name, row in out.items():
        row["ratio"] = round(row["sf1eq"] / row["sf0.1"], 2)
    print(json.dumps({"amplify": AMPLIFY, "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
