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
    bench: bool = False  # include in bench.py headline set

    def __post_init__(self) -> None:
        object.__setattr__(self, "doc", self.doc or (self.fn.__doc__ or ""))


_REGISTRY: dict[str, CorpusQuery] = {}

# The driver's correctness gate checks the FIRST ~50 registry entries only.
# The window ROTATES per round so every corpus query accumulates a green
# driver row: r1 covered entries 1-50 of the original order, r2 covered the
# crypto/TPC-H/curation priority set, r3 (this window) covers the 26 queries
# with no driver row from either prior round, the round's new additions,
# a few fixed-in-r2 canaries, and refreshers whose only evidence is r1.
# With this window, r1 ∪ r2 ∪ r3 covers all registered queries.
CHECK_WINDOW_PRIORITY: tuple[str, ...] = (
    # --- never driver-checked in r1/r2 (VERDICT r2 lead task) ---
    # windows / navigation / time-series
    "w4_event_navigation",
    "w5_sliding_hour_total",
    "w6_forward_fill",
    "events_user_journey",
    "range_join_event_pairs",
    "asof_forward_error_tolerance",
    # joins (semi / full-outer / correlated / skew-salted)
    "j4_customers_with_orders_semi",
    "j5_nation_activity_full_outer",
    "j6_correlated_scalar",
    "j7_salted_skew_join",
    # aggregation shapes
    "a6_salted_skew_aggregate",
    "a7_order_price_histogram",
    "approx_quantiles_totalprice",
    "a8_exact_quantiles_by_priority",
    "a9_grouping_sets_revenue",
    "o4_topk_per_group",
    "o5_set_ops_customers",
    "profile_orders",
    "dq_constraint_violations",
    # text analysis
    "text_repetition_ratio",
    "text_rolling_hash",
    # similarity / dedup
    "sim_dimension_stats",
    "dedup_time_bucketed",
    # curation (r2 additions)
    "curate_ngram_decontaminate",
    "curate_length_buckets",
    "curate_sample_rates",
    "curate_chunk_overlap",
    # streaming twins
    "streaming_interval_join",
    "streaming_sessionized",
    # --- new in r3: production-capped dedup + persisted ANN index,
    # containment dedup, k-means clustering, funnel, cumulative-distinct ---
    "dedup_ngram_jaccard_capped",
    "dedup_minhash_lsh_capped",
    "sim_ann_ivf_indexed",
    "sim_ann_ivf_kmeans",
    "dedup_containment",
    "cluster_kmeans_embeddings",
    "sim_pq_topk",
    "sim_pq_indexed",
    "dedup_semantic_blocked",
    "text_token_diversity",
    "events_retention_cohorts",
    "events_funnel_conversion",
    "w7_cumulative_distinct_users",
    # --- canaries: red/err in r1, fixed and green in r2 — keep watched ---
    "events_sessionized",
    "text_quality_by_lang",
    "mm_byte_histogram",
    "dedup_clusters_transitive",
    # --- refreshers: only evidence is r1; re-prove the oldest rows ---
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "w1_latest_event_per_user",
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
