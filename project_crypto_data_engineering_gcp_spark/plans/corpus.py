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

# r7 WINDOW (this round; exactly the plan declared in r6 and ratified by
# the r6 verdict, task 1): the first 18 entries are the complete r6
# rollover queue — every registered query with no driver row in ANY
# CORRECTNESS_r1..r6 (policy (a); all pass local parity at sf0.01 AND
# sf0.1). The remaining 32 slots refresh the r3-latest set oldest-first
# (policy (c)): the 47 registered queries whose newest driver row is r3,
# taken family-first in the order the r6 plan promised — streaming,
# j4-j7, a6-a9, w1/w4-w7, o4/o5, the dedup batch, the sim r3 batch, and
# the events trio. 18 + 32 = 50 fills the window. The 15 r3-latest
# queries that do not fit (listed in the ROLLOVER comment below) lead
# the r8 window together with any r7 additions; after this round's
# check the staleness ledger reads r7x50, r6x50, r5x50, r4x50,
# r3x15(+r7 additions never) — max staleness 4 rounds, the documented
# floor for a 215-query corpus under a 50-slot window (README
# "Driver-window rotation policy").
#
# STALENESS TRIAGE (standing, r4 verdict task 5) — with ~215 queries and
# a ~50-slot window, the "newest row <= 2 rounds old" invariant is
# arithmetically unkeepable (a full rotation takes ~4.3 rounds); policy:
#   (a) never-checked queries ALWAYS lead the next window,
#   (b) queries rewritten/refactored since their last row join them,
#   (c) remaining slots refresh oldest-first,
# so every query's newest row stays at most ~4 rounds old.
#
#   r8 plan (declared now, cut at r8 start): the 22-entry rollover
#   below (15 r3-stale refreshers that missed the r7 window + the six
#   r7 additions + the policy-(b) re-windowed text_bpe_train_merges)
#   leads; the remaining ~28 slots refresh the r4-latest set
#   oldest-first (the late-r4 rollover batch: graph_pagerank,
#   text_bm25_topk, sim_ivfpq_*, the a1x analytics run, the w8/approx
#   additions — see CORRECTNESS_r04). 22 + 28 = 50.
#
# History: r1 covered entries 1-50 of the original order, r2 the
# crypto/TPC-H/curation priority set, r3 the never-checked 26 + r3
# additions, r4 the 38 r1-only refreshers + r4 additions, r5 the
# 37-entry late-r4 queue + 5 r5 additions + the 8 r2-stale
# crypto/pandas entries, r6 the 12-entry r5 rollover queue + all 37
# r2-stale refreshers (TPC-H q1-q22 incl.) + sim_ivf_cell_stats
# (50/50 green every round; zero red rows ever).
CHECK_WINDOW_PRIORITY: tuple[str, ...] = (
    # ---- the complete r6 rollover queue (18): every never-driver-checked
    # query (r6 additions beyond slot 50), policy (a) ----
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
    # ---- 32 r3-latest refreshers (newest driver row = r3), policy (c),
    # family-first per the declared r6 plan ----
    "streaming_interval_join",
    "streaming_sessionized",
    "j4_customers_with_orders_semi",
    "j5_nation_activity_full_outer",
    "j6_correlated_scalar",
    "j7_salted_skew_join",
    "a6_salted_skew_aggregate",
    "a7_order_price_histogram",
    "a8_exact_quantiles_by_priority",
    "a9_grouping_sets_revenue",
    "w1_latest_event_per_user",
    "w4_event_navigation",
    "w5_sliding_hour_total",
    "w6_forward_fill",
    "w7_cumulative_distinct_users",
    "o4_topk_per_group",
    "o5_set_ops_customers",
    "dedup_exact",
    "dedup_containment",
    "dedup_clusters_transitive",
    "dedup_minhash_lsh_capped",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_capped",
    "dedup_time_bucketed",
    "sim_ann_ivf_indexed",
    "sim_ann_ivf_kmeans",
    "sim_dimension_stats",
    "sim_pq_indexed",
    "sim_pq_topk",
    "events_sessionized",
    "events_funnel_conversion",
    "events_retention_cohorts",
    # ---- ROLLOVER QUEUE (positions 51+): the 15 remaining r3-latest
    # refreshers that did not fit the 50-slot window — they lead the r8
    # window under policy (c), joined by any r7 additions under policy
    # (a). (These HAVE green r3 rows; listing them here documents the
    # r8 plan and keeps the rotation auditable.) ----
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
    # ---- r7 additions (never driver-checked; policy (a) puts them
    # ahead of the 15 refreshers above when the r8 window is cut) ----
    "a27_pr_auc",
    "a28_chi_square",
    "a29_welch_ttest",
    "dq_histogram_drift",
    "feat_hashing_trick",
    "text_distinctive_terms",
    # policy (b): the BPE training loop gained a per-(app, sf_dir) memo
    # in r7 (perf-only; bit-identical outputs re-verified at sf0.01 AND
    # sf0.1) — its r6 row predates the refactor, so it re-windows in r8.
    # text_bpe_encode_stats shares the refactor but already sits in the
    # r7 window above.
    "text_bpe_train_merges",
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
