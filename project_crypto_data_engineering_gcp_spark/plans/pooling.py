"""Bounded pools of persisted derived frames.

The dedup/similarity families reuse expensive intermediates (shingle
inverted index, minhash signatures, LSH candidate pairs, normalized
embedding vectors, PQ subspaces) across corpus queries and across repeat
calls in one driver. Each lives in a bounded LRU pool: repeat calls hit
the cached frame instead of duplicating it, and filling past capacity
UNPERSISTS the least-recently-used entry first — a long-lived driver
serving many datasets can never accumulate persisted frames (executor
storage-memory creep).

Correctness-free: every pooled frame is a pure deterministic function of
its key. Contract for builders: ``build()`` must return an
already-``cache()``d **and already-materialized** DataFrame (run one
action, e.g. ``count()``, inside the builder). Materializing at build
time keeps pool HITS action-free — a hit returns the handle without
touching the cluster — and populates multi-frame dependency chains in
order (a downstream builder's action finds its upstream pools warm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def bounded_cached(
    memo: dict, key, build, max_size: int = 1
) -> DataFrame:
    """True LRU: hits refresh recency; eviction unpersists the
    least-recently-used entry (plain dicts iterate in insertion order,
    so refreshing = re-inserting and the first key is always the LRU).

    A pooled frame that was unpersisted EXTERNALLY (e.g. a session-wide
    ``spark.catalog.clearCache()``) is a stale handle — serving it would
    silently recompute its lineage on every downstream traversal. Such
    entries are detected via ``storageLevel`` and treated as misses."""
    if key in memo:
        entry = memo.pop(key)
        if entry.storageLevel != StorageLevel.NONE:
            memo[key] = entry  # refresh recency on hit
            return entry
        # externally cleared: fall through and rebuild
    while len(memo) >= max_size:
        lru_key = next(iter(memo))
        memo.pop(lru_key).unpersist()
    memo[key] = build()
    return memo[key]
