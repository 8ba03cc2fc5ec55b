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

# r6 WINDOW (this round; exactly the plan declared in r5 and ratified by
# the r5 verdict, task 2): the first 12 entries are the complete r5
# rollover queue — the 11 late-r5 additions (never driver-checked,
# policy (a)) plus text_token_diversity (policy (b): rewritten
# integer-exact after its last driver row). Two r6 code changes are
# re-verified locally and sit inside this window: mm_simhash_payload
# (64-bit SimHash / 4x16-bit bands scale-hardening, r5 verdict task 3)
# and sim_binary_refined's re-rank key (integer fixed-point, ADVICE r5).
# Next come ALL 37 queries whose newest driver row is r2 (policy (c),
# oldest-first): TPC-H q1-q22, pandas_grouped_zscore, the curation core,
# d1/p13/p14, approx_distinct_parts, the sim_ann r2 trio, and
# streaming_hourly_rollup. 12 + 37 = 49; slot 50 goes to the first r6
# addition. Further r6 additions land in the rollover queue (positions
# 51+) and lead the r7 window under policy (a).
#
# STALENESS TRIAGE (standing, r4 verdict task 5) — with ~200 queries and
# a ~50-slot window, the "newest row <= 2 rounds old" invariant is
# arithmetically unkeepable (a full rotation takes ~4 rounds); policy:
#   (a) never-checked queries ALWAYS lead the next window,
#   (b) queries rewritten/refactored since their last row join them,
#   (c) remaining slots refresh oldest-first,
# so every query's newest row stays at most ~3 rounds old.
#   r7 plan: the 18 rollover entries below (r6 additions beyond slot
#   50, incl. the continuation batch a22/weighted_sample/table_diff/
#   table_checksum/bpe_encode/bootstrap_ci/target_encoding/roc_auc/ks_test/calibration), then the
#   r3-latest set (streaming family, j4-j7, a6-a9, w4-w7, o4/o5, the
#   dedup/sim r3 batch — 32 of its ~38 entries, oldest-first);
#   18 + 32 = 50 fills the window.
#
# History: r1 covered entries 1-50 of the original order, r2 the
# crypto/TPC-H/curation priority set, r3 the never-checked 26 + r3
# additions, r4 the 38 r1-only refreshers + r4 additions, r5 the
# 37-entry late-r4 queue + 5 r5 additions + the 8 r2-stale
# crypto/pandas entries (50/50 green).
CHECK_WINDOW_PRIORITY: tuple[str, ...] = (
    # ---- the complete r5 rollover queue (12): 11 never-driver-checked
    # late-r5 additions + the policy-(b) rewritten text_token_diversity
    "sim_binary_recall",
    "graph_kcore",
    "a19_gini_by_nation",
    "dq_benford_leading_digit",
    "approx_countmin_tokens",
    "streaming_static_enrichment",
    "graph_label_propagation",
    "sim_ann_ivf_incremental",
    "text_bpe_train_merges",
    "feat_user_activity",
    "mm_simhash_payload",  # r6 rewrite: 64-bit SimHash, 4x16-bit bands
    "text_token_diversity",
    # ---- the 37 r2-stale refreshers (newest driver row = r2),
    # oldest-first policy (c): the full TPC-H menu first ----
    "q1_pricing_summary",
    "q2_cheapest_supplier",
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
    # ---- slot 50: first r6 addition ----
    "sim_ivf_cell_stats",
    # ---- ROLLOVER QUEUE (positions 51+): r6 additions beyond slot 50,
    # never driver-checked, local parity green (sf0.01 AND sf0.1) —
    # lead the r7 window under policy (a) together with the r3-latest
    # refreshers. ----
    "a20_exact_percentiles",
    "curate_stratified_sample",
    "streaming_interval_join_outer",
    "mm_frame_fingerprint_match",
    "a21_retention_cohorts",
    "dq_column_profile",
    "approx_percentile_orders",
    "graph_bfs_distances",
    "a22_sales_cube",
    "curate_weighted_sample",
    "dq_table_diff",
    "dq_table_checksum",
    "text_bpe_encode_stats",
    "a23_bootstrap_ci",
    "feat_target_encoding",
    "a24_roc_auc",
    "a25_ks_test",
    "a26_calibration_bins",
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
