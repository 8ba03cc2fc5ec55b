"""Adversarial-input differential gate: a curated cross-family corpus
subset vs its DuckDB oracles over seeded perturbed datasets
(tools/corpus_fuzz.py — subsample with orphaned FKs, a near-empty
table, coarse value/timestamp tie grids, colliding documents and
embedding vectors). The fixed-sf parity suite proves engine agreement
on one realistic dataset; this gate pins agreement on the hostile
corners of the input domain, where the full 6-seed x 236-query sweep
found (and r9 fixed) three real bugs the sf fixtures never reached:

  - p9_round_family: unguarded per-unit division -> ANSI runtime error
    on a zero quantity (now NULL-guarded in both engines),
  - streaming_interval_join_outer: the global watermark is the MIN over
    both sides' nodes, each advancing only with its OWN filtered
    stream — the old max(all events) gate claimed guaranteed emission
    for purchases whose outer rows could never materialize when the
    newest view trailed the newest event by > 1h (now gated on the
    per-type least in both engines),
  - streaming/dedup_stream._shingles: duplicate doc delivery doubled
    shingles and drove the jaccard denominator to zero (now a set).

Seeds are pinned to the sweep's two harshest draws: seed 3 caught the
watermark bug (quantized timestamps + sparse events); seed 4 crushes
customer to 3 rows (every per-customer aggregate nearly empty, joins
mostly unmatched). The subset trades the sweep's full coverage for
suite runtime; re-run `python3 tools/corpus_fuzz.py` after adding any
query with a division, rank, or interval predicate.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# one representative per operator family, plus every shape class the
# 6-seed sweep showed to be edge-sensitive (divisions, ranks, topk
# ties, interval predicates, empty groups)
FUZZ_SUBSET = (
    # regressions found by this harness
    "p9_round_family",
    "streaming_interval_join_outer",
    "streaming_incremental_dedup",
    "set_ops_orderkeys",
    # dedup ladder (collided docs = true duplicates to find)
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    # ANN / clustering (collided vectors = exact cosine ties at top-k)
    "sim_ann_ivf_topk",
    "sim_ann_lsh_recall",
    "sim_ivfpq_topk",
    "cluster_kmeans_embeddings",
    # stats (division guards, rank machinery, tiny/empty groups)
    "a19_gini_by_nation",
    "a38_atkinson_by_nation",  # r10: reciprocal quantization + clamp
    "a27_pr_auc",
    "a30_mann_whitney_u",
    "a33_user_hhi_deciles",
    "a36_gini_drift_by_nation",
    "a37_hhi_supplier_by_brand",
    # data CI
    "dq_referential_integrity",
    "dq_histogram_drift",
    "dq_version_quantile_drift",
    "dq_embedding_mean_drift",
    # temporal (minute-quantized ts = boundary ties everywhere)
    "asof_purchase_last_view",
    "events_survival_curve",  # r10: KM censor ties at max(ts)
    "events_rolling_distinct_users",  # r10: window-end day boundaries
    "range_join_event_pairs",
    "events_time_to_convert",
    "events_sessionized",
    "events_hourly_gapfill",
    # text
    "text_tfidf_topk",
    "text_bpe_train_merges",
    "text_quality_by_lang",
    "text_vocab_growth_curve",
    "text_ttr_by_lang",
    # OLAP / rank / topk
    "cube_revenue",
    "o8_weighted_median_prices",  # r10: 2*cw >= tot boundary under ties
    "o9_weighted_median_skewed",  # r11: multi-level band refinement
    "a39_tail_shares_by_nation",  # r11: ceil/floor decile-cut boundaries
    "dq_order_total_reconciliation",  # r11: orphan orders / zero prices
    "events_peak_concurrency",  # r11: +-1 boundary ties on quantized ts
    "text_hapax_ratio_by_source",  # r11: cnt=1 boundary on collided docs
    "curate_reservoir_per_source",  # r11: rank<=k boundary on tiny sources
    "o10_weighted_p90_prices",  # r12: 10*cw >= 9*tot boundary under ties
    "a40_bitmap_distinct_users",  # r12: bitmap buckets on crushed keys
    "dedup_within_watermark_batch",  # r12: anchor-chain ties on quantized ts
    "w9_session_window_native",  # r12: exact-gap session ties on minute grid
    "p15_variant_extract",  # r12: variant round-trip under crushed events
    "pivot_status_by_priority",
    "percentiles_acctbal_by_nation",
    "o3_top_bottom_orders",
    "o6_orders_global_rank",
    "o7_pareto_skyline_orders",
    "w1_latest_event_per_user",
    # joins
    "j1_customer_dashboard",
    "j3_customers_without_orders",
    "bloom_semi_revenue",
    # curation / multimodal / graph / TPC-H
    "curate_length_buckets",
    "graph_two_hop_reach",  # r10: hub-cap boundary on crushed graphs
    "sim_radius_search_ivf",  # r10: radius boundary on collided vectors
    "curate_ngram_decontaminate",
    "mm_byte_histogram",
    "graph_pagerank",
    "q1_pricing_summary",
    "q5_nation_volume",
)

# seed 4's customer crush bites hardest on customer-grain shapes —
# a focused second draw over the joins/stats most exposed to it
CRUSH_SUBSET = (
    "j1_customer_dashboard",
    "j3_customers_without_orders",
    "a19_gini_by_nation",
    "a31_spearman_spend_orders",
    "a33_user_hhi_deciles",
    "a36_gini_drift_by_nation",
    "a16_rfm_segments",
    "q5_nation_volume",
    "feat_user_activity",
    "a21_retention_cohorts",
)

# seed 8 crushes ORDERS to 3 rows — the draw that exposed the Welch
# singleton-variance/empty-complement guards, the approx-quantile
# sub-row cushion, and the pivot NULL-count-for-empty-class gap
ORDERS_CRUSH_SUBSET = (
    "a29_welch_ttest",
    "approx_quantiles_totalprice",
    "pivot_status_by_priority",
    "a5_rollup_revenue",
    "profile_orders",
    "dq_histogram_drift",
    "a28_chi_square",
)

# seed 12 crushes EVENTS to 3 minute-quantized rows — max-ts ties at
# the group boundary (caught w1b's bare max_by ordering key)
EVENTS_CRUSH_SUBSET = (
    "w1b_latest_via_max_by",
    "w1_latest_event_per_user",
    "asof_purchase_last_view",
    "events_sessionized",
    "streaming_interval_join_outer",
    "events_hourly_rollup",
)

# crush_rows=0 empties seed 8's orders entirely — the draw that caught
# Spark's Expand-based grouping sets emitting NO rows over empty input
# (vs the SQL-standard grand-total row; oracles now HAVING-guarded)
# and pagerank's driver-side scale // n_nodes on an empty graph
EMPTY_TABLE_SUBSET = (
    "a22_sales_cube",
    "a5_rollup_revenue",
    "cube_revenue",
    "a9_grouping_sets_revenue",
    "graph_pagerank",
    "a29_welch_ttest",
    "q1_pricing_summary",
)


def test_fuzz_coverage_total():
    """Ratchet (r9 verdict task 6): every registered corpus query must
    hold a fuzz-coverage seat — in one of the suite subsets above (run
    every pytest) or in tests/fuzz_coverage_ledger.SWEEP_ONLY (full
    out-of-suite sweep only, an explicit reviewable decision). A new
    query in neither place fails here; a stale name anywhere fails too."""
    import __spark_entry__ as entrymod

    from tests.fuzz_coverage_ledger import SWEEP_ONLY

    registered = set(entrymod.queries())
    subsets = (
        set(FUZZ_SUBSET)
        | set(CRUSH_SUBSET)
        | set(ORDERS_CRUSH_SUBSET)
        | set(EVENTS_CRUSH_SUBSET)
        | set(EMPTY_TABLE_SUBSET)
    )
    stale = (subsets | SWEEP_ONLY) - registered
    assert not stale, f"fuzz-coverage names not in registry: {sorted(stale)}"
    uncovered = registered - subsets - SWEEP_ONLY
    assert not uncovered, (
        "registered queries with NO fuzz coverage (add to a suite subset "
        f"in tests/test_corpus_fuzz.py or, with a reason, to "
        f"tests/fuzz_coverage_ledger.SWEEP_ONLY): {sorted(uncovered)}"
    )
    overlap = subsets & SWEEP_ONLY
    assert not overlap, f"double-tagged (drop from SWEEP_ONLY): {sorted(overlap)}"


def test_fuzz_subset_matches_oracles(spark):
    from corpus_fuzz import run_fuzz

    import __spark_entry__ as entrymod

    registered = set(entrymod.queries())
    draws = (
        (3, FUZZ_SUBSET, 3),
        (4, CRUSH_SUBSET, 3),
        (8, ORDERS_CRUSH_SUBSET, 3),
        (12, EVENTS_CRUSH_SUBSET, 3),
        (8, EMPTY_TABLE_SUBSET, 0),
    )
    for _, subset, _ in draws:
        missing = set(subset) - registered
        assert not missing, f"fuzz subset names drifted from registry: {missing}"

    fails = []
    for seed, subset, crush_rows in draws:
        fails += run_fuzz(spark, seed, names=subset, crush_rows=crush_rows)
    assert not fails, fails
