"""Registry of oracle-checked queries.

Each entry pairs a Spark implementation ``fn(spark, sf_dir) -> DataFrame``
with (optionally) an ANSI-SQL oracle string that DuckDB runs on the same
parquet tables. The driver's verify (and our own tests/test_corpus_parity)
compares row count + schema + order-insensitive value hash, so:

  - every computed column is aliased identically in both,
  - float aggregates go through exact decimal math (functions/numeric.py),
  - hashes use the cross-engine md5 scheme (functions/hashing.py),
  - all selections/rankings carry explicit tiebreakers.

Queries without an oracle (genuinely non-SQL-expressible ops) get the
driver's weaker rows-only check and a pytest-level semantic test instead.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class CorpusQuery:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    bench: bool = False  # informational tag from early rounds; the
    # authoritative headline set is bench.py::HEADLINE (curated +
    # commented there, grown per round without reordering)

    def __post_init__(self) -> None:
        object.__setattr__(self, "doc", self.doc or (self.fn.__doc__ or ""))


_REGISTRY: dict[str, CorpusQuery] = {}

# r8 WINDOW (this round; exactly the plan declared in r7 — see commit
# c531034 and the r7 VERDICT task 1): the first 22 entries are the
# complete r7 rollover queue — the six r7 additions (policy (a), never
# driver-checked), the policy-(b) re-windowed text_bpe_train_merges
# (its r6 row predates the memoization refactor), and the 15 r3-stale
# refreshers that missed the r7 window (policy (c)). The remaining 28
# slots refresh the r4-latest set (the 50 registered queries whose
# newest driver row is r4) in CORRECTNESS_r04 file order — a
# deterministic, auditable cut; the 22 that do not fit are listed in
# the ROLLOVER comment below and lead the r9 window together with any
# r8 additions. After this round's check the staleness ledger reads
# r8x50, r7x50, r6x50, r5x50, r4x22(+r8 additions never) — max
# staleness 4 rounds, the documented floor for a ~230-query corpus
# under a 50-slot window (README "Driver-window rotation policy").
#
# STALENESS TRIAGE (standing, r4 verdict task 5) — with ~220+ queries
# and a ~50-slot window, the "newest row <= 2 rounds old" invariant is
# arithmetically unkeepable (a full rotation takes ~4.5 rounds); policy:
#   (a) never-checked queries ALWAYS lead the next window,
#   (b) queries rewritten/refactored since their last row join them,
#   (c) remaining slots refresh oldest-first,
# so every query's newest row stays at most ~4 rounds old.
#
#   r9 plan (declared now, cut at r9 start): the eight r8 additions
#   (policy (a): a30_mann_whitney_u, a31_spearman_spend_orders,
#   a32_cramers_v_sq, a33_user_hhi_deciles, a34_benford_first_digit,
#   dq_referential_integrity, o7_pareto_skyline_orders,
#   text_token_rank_curve) lead, then the 22-entry r4-stale rollover
#   below, then the r5-latest set oldest-first (graph_pagerank,
#   text_bm25_topk, sim_ivfpq_*, the TPC-H q-menu refreshers — see
#   CORRECTNESS_r05) fills the remaining 20 slots. 8 + 22 + 20 = 50.
#
# History: r1 covered entries 1-50 of the original order, r2 the
# crypto/TPC-H/curation priority set, r3 the never-checked 26 + r3
# additions, r4 the 38 r1-only refreshers + r4 additions, r5 the
# 37-entry late-r4 queue + 5 r5 additions + the 8 r2-stale
# crypto/pandas entries, r6 the 12-entry r5 rollover queue + all 37
# r2-stale refreshers (TPC-H q1-q22 incl.) + sim_ivf_cell_stats, r7
# the 18-entry r6 rollover + 32 r3-stale refreshers
# (50/50 green every round; zero red rows ever).
CHECK_WINDOW_PRIORITY: tuple[str, ...] = (
    # ---- r7 additions (6): never driver-checked, policy (a) ----
    "a27_pr_auc",
    "a28_chi_square",
    "a29_welch_ttest",
    "dq_histogram_drift",
    "feat_hashing_trick",
    "text_distinctive_terms",
    # ---- policy (b): BPE training gained a per-(app, sf_dir) memo in
    # r7 (perf-only; bit-identical outputs re-verified at sf0.01 AND
    # sf0.1) — its r6 row predates the refactor, so it re-certifies ----
    "text_bpe_train_merges",
    # ---- 15 r3-stale refreshers that missed the r7 window, policy (c) ----
    "approx_quantiles_totalprice",
    "asof_forward_error_tolerance",
    "cluster_kmeans_embeddings",
    "curate_chunk_overlap",
    "curate_length_buckets",
    "curate_ngram_decontaminate",
    "curate_sample_rates",
    "dq_constraint_violations",
    "events_user_journey",
    "mm_byte_histogram",
    "profile_orders",
    "range_join_event_pairs",
    "text_quality_by_lang",
    "text_repetition_ratio",
    "text_rolling_hash",
    # ---- 28 r4-latest refreshers (newest driver row = r4), policy (c),
    # in CORRECTNESS_r04 file order ----
    "a1_global_stats",
    "a4_customer_market_dominance",
    "a5_rollup_revenue",
    "asof_purchase_last_view",
    "cube_revenue",
    "dedup_apply_keep_first",
    "dedup_embedding_cosine",
    "dedup_fingerprint",
    "dedup_simhash",
    "events_hourly_rollup",
    "j1_customer_dashboard",
    "j3_customers_without_orders",
    "mm_frame_sample",
    "mm_media_meta_stub",
    "mm_payload_meta",
    "mm_resize_meta",
    "o1_ranked_orders",
    "o3_top_bottom_orders",
    "p11_quantity_classification",
    "p1_event_json_projection",
    "p9_round_family",
    "percentiles_acctbal_by_nation",
    "pivot_status_by_priority",
    "set_ops_orderkeys",
    "sim_cosine_pairs",
    "sim_embedding_norms",
    "text_fingerprint",
    "text_lang_id",
    # ---- ROLLOVER QUEUE (positions 51+), in r9-window order ----
    # r8 additions (policy (a): never driver-checked — they LEAD the r9
    # window; all pass local parity at sf0.01 AND sf0.1) ----
    "a30_mann_whitney_u",
    "a31_spearman_spend_orders",
    "a32_cramers_v_sq",
    "a33_user_hhi_deciles",
    "a34_benford_first_digit",
    "dq_referential_integrity",
    "o7_pareto_skyline_orders",
    "text_token_rank_curve",
    # ...then the 22 remaining r4-latest refreshers that did not fit the
    # 50-slot window (policy (c); these HAVE green r4 rows — listing
    # them documents the r9 plan and keeps the rotation auditable) ----
    "text_quality_score",
    "text_redacted",
    "text_tfidf_topk",
    "text_token_explode",
    "text_token_stats",
    "text_top_bigrams",
    "unpivot_lineitem_amounts",
    "w1b_latest_via_max_by",
    "w2_acctbal_rank_in_nation",
    "w3_running_order_total",
    "dedup_semantic_blocked_capped",
    "dedup_semantic_blocked_scaled_k",
    "streaming_snapshot_datasource",
    "text_hash_embedding",
    "sim_ann_lsh_recall",
    "sim_ann_ivf_recall",
    "text_boilerplate_ngrams",
    "sim_pq_refined",
    "sim_sq8_topk",
    "sim_quant_recall",
    "dedup_minhash_lsh",
    "crypto_silver_assets",
)


def corpus_query(
    name: str, oracle: str | None = None, *, bench: bool = False
) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a corpus query with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate corpus query {name!r}")
        _REGISTRY[name] = CorpusQuery(name=name, fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def all_queries() -> dict[str, CorpusQuery]:
    """Full registry, ordered: CHECK_WINDOW_PRIORITY first (the driver's
    correctness gate reads entries in dict order and stops at ~50), then
    every remaining query in registration order."""
    ordered = {
        name: _REGISTRY[name] for name in CHECK_WINDOW_PRIORITY if name in _REGISTRY
    }
    ordered.update((n, q) for n, q in _REGISTRY.items() if n not in ordered)
    return ordered


def get_query(name: str) -> CorpusQuery:
    return _REGISTRY[name]
