"""Runtime at-scale switches (env-var backed, CLI-exposed).

The iterative graph operators ship two execution modes each, measured
in SCALE.md and bit-identical by construction — but until r9 flipping
them meant editing code. These helpers make the 100-TB mode an
OPERATING decision (env var or ``graph`` CLI flag), with the SCALE.md
switch-point guidance in one place:

``SPARK_GRAFT_EDGE_PARTITIONS`` (int, default unset)
    Co-partitioned iterative-graph mode for pagerank / label
    propagation / BFS: the loop-invariant edge frame is cached
    pre-partitioned and pre-sorted on the join key, so every round's
    SortMergeJoin exchanges only the node-sized frame
    (``operators/graph.py::_pin_loop_invariant``). Switch point
    (SCALE.md "PageRank co-partitioning experiment"): WINS in the
    data-bound regime — 0.37x wall-clock at 60M edges (pagerank),
    0.62x at x16 edges (LPA) — and LOSES at round-latency-floor scale
    (1.15x at sf0.1's 600k edges, where the cache build never pays
    for itself). Rule of thumb: set it (to the cluster's shuffle
    parallelism) once the edge frame is ~10M+ rows; leave unset below.

``SPARK_GRAFT_BROADCAST_SURVIVORS`` (bool, default true)
    k-core's per-round survivor filters: ``true`` broadcast-joins the
    support-filtered survivor node list (right while it fits in
    executor memory); ``false`` switches both filters to shuffle
    SEMI-joins — the honest path when a billion-node survivor domain
    cannot broadcast (SCALE.md "kcore shuffle-semi-join survivor
    path"; identical results, the survivor key is unique by
    construction).

``SPARK_GRAFT_BROADCAST_MAX_NODES`` (int, default 250_000)
    r13: ceiling on the NODE count up to which pagerank broadcasts its
    node-sized per-round rank state into the edge-sized join instead
    of shuffling both sides — the per-round edge exchange disappears
    without the co-partitioned cache. Above the ceiling the operator
    falls back to the shuffle path, where
    ``SPARK_GRAFT_EDGE_PARTITIONS`` / bucketed storage are the
    documented at-scale levers. Default measured, not guessed
    (SCALE.md r13): at 16k nodes broadcast wins every interleaved pass
    (1.1-1.25x); at 1.6M nodes x 5 rounds the SEQUENTIAL driver-side
    relation builds stop scaling with cores (8->32 cores: broadcast
    171->159 s vs shuffle 220->137 s at x100 edges) — the crossover is
    in between, so the default stays conservatively at 250k rows
    (~4 MB of (long, long) state per round, a cheap build). Raise it
    on fat executors, set 0 to disable broadcasting entirely.

Unset means the graded-scale defaults, which are the faster choice at
every scale this repo's bench runs — the switches exist for the
regimes SCALE.md measures above it.
"""

from __future__ import annotations

import os

_EDGE_PARTITIONS_VAR = "SPARK_GRAFT_EDGE_PARTITIONS"
_BROADCAST_SURVIVORS_VAR = "SPARK_GRAFT_BROADCAST_SURVIVORS"
_BROADCAST_MAX_NODES_VAR = "SPARK_GRAFT_BROADCAST_MAX_NODES"


def graph_edge_partitions() -> int | None:
    """Co-partitioned-mode partition count for the iterative graph
    family, or None (the default localCheckpoint mode). ``0``/unset/
    empty mean None; a negative value is a configuration error."""
    raw = os.environ.get(_EDGE_PARTITIONS_VAR, "").strip()
    if not raw:
        return None
    try:
        n = int(raw)
    except ValueError:
        raise ValueError(
            f"{_EDGE_PARTITIONS_VAR}={raw!r} is not an integer"
        ) from None
    if n < 0:
        raise ValueError(f"{_EDGE_PARTITIONS_VAR} must be >= 0, got {n}")
    return n or None


def graph_broadcast_max_nodes() -> int:
    """Node-count ceiling for broadcasting the per-round node state of
    the iterative graph operators (0 disables)."""
    raw = os.environ.get(_BROADCAST_MAX_NODES_VAR, "").strip()
    if not raw:
        return 250_000
    try:
        n = int(raw)
    except ValueError:
        raise ValueError(
            f"{_BROADCAST_MAX_NODES_VAR}={raw!r} is not an integer"
        ) from None
    if n < 0:
        raise ValueError(f"{_BROADCAST_MAX_NODES_VAR} must be >= 0, got {n}")
    return n


def graph_broadcast_survivors() -> bool:
    """Whether k-core broadcast-joins its survivor list (default) or
    uses shuffle semi-joins (set the var to 0/false/no)."""
    raw = os.environ.get(_BROADCAST_SURVIVORS_VAR, "").strip().lower()
    if raw in ("", "1", "true", "yes"):
        return True
    if raw in ("0", "false", "no"):
        return False
    raise ValueError(
        f"{_BROADCAST_SURVIVORS_VAR}={raw!r} must be one of"
        " 1/true/yes/0/false/no (or unset)"
    )
