"""Batch-vs-stream differential gate (r9 verdict task 5): seeded
out-of-order multi-micro-batch deliveries of the events table replayed
through the streaming operators and compared EXACTLY against the batch
reference over the identical files (tools/stream_fuzz.py — late data
inside the watermark horizon, empty micro-batches, sessions and join
state straddling batch cuts, cross-batch duplicate redelivery).

The corpus streaming queries drain a single-file source (one
micro-batch), so these cross-boundary semantics are otherwise only
exercised by the full out-of-suite sweep
(`python3 tools/stream_fuzz.py`, seeds 1-6, run per-round). The suite
keeps two seeds x a cross-section of gates; seed choice mirrors the
sweep's harshest draws once known."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

# gate subsets per seed: every stateful operator class appears at least
# once (windowed agg, session merge, dedup state, join state x2 modes,
# arbitrary state), split across seeds to bound suite runtime
SEED_GATES = (
    (3, ("rollup", "sessionize", "dedup", "interval_join")),
    (5, ("enriched", "interval_join_outer", "running_totals")),
)


def test_stream_fuzz_subset(spark):
    from stream_fuzz import GATES, run_stream_fuzz

    for _, gates in SEED_GATES:
        unknown = set(gates) - set(GATES)
        assert not unknown, f"gate names drifted: {unknown}"

    fails: list[str] = []
    for seed, gates in SEED_GATES:
        fails += run_stream_fuzz(spark, seed, gates=gates)
    assert not fails, fails
