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

# r10 WINDOW (this round; exactly the plan declared in r9 — see the r9
# VERDICT task 1 and the ROLLOVER comment committed with the r9 window):
# the seven r9 additions lead (policy (a): never driver-checked; all
# pass local parity at sf0.01 AND sf0.1 plus the fuzz sweep), then the
# complete 30-entry r5-stale rollover from the r9 comment (policy (c)),
# then the first 13 of the r6-latest set (the 49 registered queries
# whose newest driver row is r6 — recomputed this round from
# CORRECTNESS_r01..r09; mm_simhash_payload and feat_user_activity ARE
# r6-latest despite kin passing later) in CORRECTNESS_r06 file order.
# 7 + 30 + 13 = 50. The 36 r6-latest entries that do not fit are listed
# in the ROLLOVER comment below and lead the r11 window together with
# any r10 additions. After this round's check the staleness ledger
# reads r10x50, r9x50, r8x50, r7x50, r6x36 — max staleness 4 rounds,
# the documented floor for a ~240-query corpus under a 50-slot window
# (README "Driver-window rotation policy").
#
# STALENESS TRIAGE (standing, r4 verdict task 5) — with ~220+ queries
# and a ~50-slot window, the "newest row <= 2 rounds old" invariant is
# arithmetically unkeepable (a full rotation takes ~4.5 rounds); policy:
#   (a) never-checked queries ALWAYS lead the next window,
#   (b) queries rewritten/refactored since their last row join them,
#   (c) remaining slots refresh oldest-first,
# so every query's newest row stays at most ~4 rounds old.
#
#   r11 plan (declared now, cut at r11 start): any r10 additions lead
#   (policy (a)), then the 36-entry r6-latest rollover below
#   (q3_shipping_priority ... sim_ivf_cell_stats, policy (c)), then
#   the r7-latest set oldest-first (see CORRECTNESS_r07) fills the
#   remaining slots.
#
# History: r1 covered entries 1-50 of the original order, r2 the
# crypto/TPC-H/curation priority set, r3 the never-checked 26 + r3
# additions, r4 the 38 r1-only refreshers + r4 additions, r5 the
# 37-entry late-r4 queue + 5 r5 additions + the 8 r2-stale
# crypto/pandas entries, r6 the 12-entry r5 rollover queue + all 37
# r2-stale refreshers (TPC-H q1-q22 incl.) + sim_ivf_cell_stats, r7
# the 18-entry r6 rollover + 32 r3-stale refreshers, r8 the 22-entry
# r7 rollover + 28 r4-stale refreshers, r9 the 8 r8 additions + the
# 22-entry r8 rollover + 20 r5-stale refreshers
# (50/50 green every round; zero red rows ever).
CHECK_WINDOW_PRIORITY: tuple[str, ...] = (
    # ---- r9 additions (7): never driver-checked, policy (a) ----
    "a36_gini_drift_by_nation",
    "a37_hhi_supplier_by_brand",
    "dq_version_quantile_drift",
    "dq_embedding_mean_drift",
    "events_time_to_convert",
    "text_vocab_growth_curve",
    "text_ttr_by_lang",
    # ---- 30 r5-stale refreshers rolled over from the r9 window,
    # policy (c), in the order the r9 comment declared ----
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
    # ---- first 13 of the r6-latest set, policy (c), in
    # CORRECTNESS_r06 file order ----
    "sim_binary_recall",
    "graph_kcore",
    "a19_gini_by_nation",
    "dq_benford_leading_digit",
    "approx_countmin_tokens",
    "streaming_static_enrichment",
    "graph_label_propagation",
    "sim_ann_ivf_incremental",
    "feat_user_activity",
    "mm_simhash_payload",
    "text_token_diversity",
    "q1_pricing_summary",
    "q2_cheapest_supplier",
    # ---- ROLLOVER QUEUE (positions 51+), in r11-window order ----
    # r10 additions (policy (a): never driver-checked — they LEAD the
    # r11 window; all pass local parity at sf0.01 AND sf0.1 plus the
    # 7-draw corpus fuzz and hold suite fuzz seats) ----
    "a38_atkinson_by_nation",
    "events_rolling_distinct_users",
    "events_survival_curve",
    "o8_weighted_median_prices",
    "sim_radius_search_ivf",
    "graph_two_hop_reach",
    # ...then the 36 remaining r6-latest entries (policy (c); these
    # HAVE green r6 rows — listing them documents the r11 plan and
    # keeps the rotation auditable) ----
    "q3_shipping_priority",
    "q4_priority_with_returns",
    "q5_nation_volume",
    "q6_forecast_revenue",
    "q7_nation_trade_flows",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_revenue_topk",
    "q11_important_parts",
    "q12_priority_by_linestatus",
    "q13_order_count_distribution",
    "q14_promo_revenue_by_month",
    "q15_top_supplier",
    "q16_suppliers_not_in",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q20_parts_with_surplus_stock",
    "q21_sole_returning_supplier",
    "q22_dormant_rich_customers",
    "pandas_grouped_zscore",
    "curate_decontaminate",
    "curate_hash_split",
    "curate_mix_sources",
    "curate_pack_sequences",
    "curate_quality_cut",
    "curate_quota_per_lang",
    "d1_date_functions",
    "p13_string_functions",
    "p14_map_json_ops",
    "approx_distinct_parts",
    "sim_ann_ivf_topk",
    "sim_ann_lsh_topk",
    "sim_topk_neighbors",
    "streaming_hourly_rollup",
    "sim_ivf_cell_stats",
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
