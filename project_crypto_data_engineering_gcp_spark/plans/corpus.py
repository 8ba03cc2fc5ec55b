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

# r9 WINDOW (this round; exactly the plan declared in r8 — see the r8
# VERDICT task 1 and commit b09338e): the eight r8 additions lead
# (policy (a): never driver-checked), then the complete 22-entry
# r4-stale rollover from the r8 comment (policy (c)), then the first
# 20 of the r5-latest set (the 50 registered queries whose newest
# driver row is r5) in CORRECTNESS_r05 file order — a deterministic,
# auditable cut. 8 + 22 + 20 = 50. The 30 r5-latest entries that do
# not fit are listed in the ROLLOVER comment below and lead the r10
# window together with any r9 additions. After this round's check the
# staleness ledger reads r9x50, r8x50, r7x50, r6x49, r5x30(+r9
# additions never) — max staleness 4 rounds, the documented floor for
# a ~230-query corpus under a 50-slot window (README "Driver-window
# rotation policy").
#
# STALENESS TRIAGE (standing, r4 verdict task 5) — with ~220+ queries
# and a ~50-slot window, the "newest row <= 2 rounds old" invariant is
# arithmetically unkeepable (a full rotation takes ~4.5 rounds); policy:
#   (a) never-checked queries ALWAYS lead the next window,
#   (b) queries rewritten/refactored since their last row join them,
#   (c) remaining slots refresh oldest-first,
# so every query's newest row stays at most ~4 rounds old.
#
#   r10 plan (declared now, cut at r10 start): any r9 additions lead
#   (policy (a)), then the 30-entry r5-stale rollover below
#   (bloom_semi_revenue ... pandas_scalar_price_tier, policy (c)),
#   then the r6-latest set oldest-first (the TPC-H q1-q22 menu and the
#   r6 additions — see CORRECTNESS_r06) fills the remaining slots.
#
# History: r1 covered entries 1-50 of the original order, r2 the
# crypto/TPC-H/curation priority set, r3 the never-checked 26 + r3
# additions, r4 the 38 r1-only refreshers + r4 additions, r5 the
# 37-entry late-r4 queue + 5 r5 additions + the 8 r2-stale
# crypto/pandas entries, r6 the 12-entry r5 rollover queue + all 37
# r2-stale refreshers (TPC-H q1-q22 incl.) + sim_ivf_cell_stats, r7
# the 18-entry r6 rollover + 32 r3-stale refreshers, r8 the 22-entry
# r7 rollover + 28 r4-stale refreshers
# (50/50 green every round; zero red rows ever).
CHECK_WINDOW_PRIORITY: tuple[str, ...] = (
    # ---- r8 additions (8): never driver-checked, policy (a) ----
    "a30_mann_whitney_u",
    "a31_spearman_spend_orders",
    "a32_cramers_v_sq",
    "a33_user_hhi_deciles",
    "a34_benford_first_digit",
    "dq_referential_integrity",
    "o7_pareto_skyline_orders",
    "text_token_rank_curve",
    # ---- 22 r4-stale refreshers rolled over from the r8 window,
    # policy (c), in the order the r8 comment declared ----
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
    # ---- first 20 r5-latest refreshers (newest driver row = r5),
    # policy (c), in CORRECTNESS_r05 file order ----
    "graph_pagerank",
    "text_bm25_topk",
    "curate_temperature_mix",
    "dedup_minhash_recall",
    "sim_ivfpq_topk",
    "sim_ivfpq_recall",
    "events_markov_transitions",
    "curate_shuffle_shards",
    "w8_ema_customer_spend",
    "approx_heavy_tokens",
    "curate_zorder_layout",
    "a11_revenue_trend",
    "curate_contrastive_pairs",
    "basket_frequent_pairs",
    "graph_triangles",
    "skyline_pareto_parts",
    "a12_incremental_merge",
    "events_rolling_anomaly",
    "events_hourly_gapfill",
    "dedup_fuzzy_names",
    # ---- ROLLOVER QUEUE (positions 51+), in r10-window order ----
    # r9 additions (policy (a): never driver-checked — they LEAD the
    # r10 window; all pass local parity at sf0.01 AND sf0.1 plus
    # sequential-reference property tests) ----
    "a36_gini_drift_by_nation",
    "a37_hhi_supplier_by_brand",
    "dq_version_quantile_drift",
    "dq_embedding_mean_drift",
    "events_time_to_convert",
    "text_vocab_growth_curve",
    "text_ttr_by_lang",
    # ...then the 30 remaining r5-latest refreshers (policy (c); these
    # HAVE green r5 rows — listing them documents the r10 plan and
    # keeps the rotation auditable) ----
    "bloom_semi_revenue",
    "a13_correlation_moments",
    "sim_mmr_rerank",
    "dedup_minhash_incremental",
    "streaming_incremental_dedup",
    "dedup_keep_best_quality",
    "curate_pack_offsets",
    "curate_corpus_report",
    "sim_knn_classify",
    "graph_link_prediction",
    "a14_share_of_parent",
    "a15_cusum_drift",
    "a16_rfm_segments",
    "events_category_drift",
    "text_bpe_pair_counts",
    "a17_mad_by_priority",
    "events_interarrival_stats",
    "sim_binary_hamming_topk",
    "sim_binary_refined",
    "o6_orders_global_rank",
    "a18_winsorized_stats",
    "text_trigram_novelty",
    "crypto_daily_overview",
    "crypto_top_gainers_losers",
    "crypto_market_dominance",
    "crypto_supply_dynamics",
    "crypto_dashboard",
    "crypto_merge_upsert",
    "crypto_scd2_history",
    "pandas_scalar_price_tier",
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
