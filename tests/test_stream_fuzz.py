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
sweep's harshest draws once known.

r13 (r12 VERDICT task 2): the gates run in a SUBPROCESS with a fresh
JVM instead of the shared session fixture. The r12 build documented the
shared SparkContext dying inside this file ~34 min into the
single-process suite (dozens of start/stop streaming queries on a
long-lived driver JVM), which failed every later test and kept the
driver's verify red. Isolation keeps the exact same gates/seeds green
while the default `pytest tests/` collection completes in one process
— the fuzz tool's CLI is the documented per-round entry point anyway.
"""

from __future__ import annotations

import os
import subprocess
import sys

_TOOL = os.path.join(os.path.dirname(__file__), "..", "tools", "stream_fuzz.py")

# gate subsets per seed: every stateful operator class appears at least
# once (windowed agg, session merge, dedup state, join state x2 modes,
# arbitrary state), split across seeds to bound suite runtime
SEED_GATES = (
    (3, ("rollup", "sessionize", "dedup", "interval_join")),
    (5, ("enriched", "interval_join_outer", "running_totals")),
)


def test_stream_fuzz_gate_names_current():
    """The seed/gate matrix must reference real gates (drift tripwire —
    kept in-process; it imports names only, no Spark)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from stream_fuzz import GATES

    for _, gates in SEED_GATES:
        unknown = set(gates) - set(GATES)
        assert not unknown, f"gate names drifted: {unknown}"


def test_stream_fuzz_subset_subprocess():
    """Run each seed's gate subset in a fresh subprocess JVM (exactly
    the pre-r13 seed x gate matrix), asserting the tool's exit code.
    Env pins a small core count — the fuzz is state-machine-bound, not
    data-bound."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="8")
    for seed, gates in SEED_GATES:
        proc = subprocess.run(
            [sys.executable, _TOOL, "--seeds", str(seed),
             "--gates", ",".join(gates)],
            capture_output=True,
            text=True,
            timeout=1800,
            env=env,
        )
        assert proc.returncode == 0, (
            f"stream fuzz seed={seed} failed (rc={proc.returncode})\n"
            f"stdout tail:\n{proc.stdout[-3000:]}\n"
            f"stderr tail:\n{proc.stderr[-2000:]}"
        )
