"""Fixed-point PageRank over an arbitrary edge frame.

Extracted from plans/queries_graph.py so the iterative core is reusable
on any (src, dst) edge set and unit-testable against a pure-Python
reference (tests/test_graph_reference.py) on random graphs with
dangling nodes and duplicate edges — shapes the corpus tables don't
necessarily hit.

See queries_graph.py's module docstring for the two load-bearing design
decisions (fixed iteration count; scaled-BIGINT arithmetic) and why they
make an iterative algorithm bit-reproducible across engines and cluster
sizes. Scale mechanics: per round ONE data-sized shuffle join + one
aggregate; loop-invariant frames (edge degrees, dangling flags) hoisted
and checkpointed once; dangling mass is a flag-filtered 1-row aggregate
broadcast back — no driver round-trip inside the loop. ``localCheckpoint``
cuts lineage per round (swap for ``checkpoint`` + an HDFS dir on a real
cluster for fault tolerance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pagerank_fixed_point(
    edges: DataFrame,
    *,
    n_iters: int,
    scale: int,
    damp_num: int = 85,
    damp_den: int = 100,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, r) after ``n_iters`` damped rounds; ranks are BIGINTs that
    sum to ~``scale``. Duplicate edges are collapsed (set semantics, the
    convention of the corpus query and its oracle)."""
    base_num = (scale * (damp_den - damp_num)) // damp_den
    e = (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    edges_deg = e.join(deg, "src").localCheckpoint(eager=True)
    nodes_flag = (
        nodes.join(deg, nodes["node"] == deg["src"], "left")
        .select("node", F.col("deg").isNull().alias("dangling"))
        .localCheckpoint(eager=True)
    )

    ranks = nodes_flag.withColumn(
        "r", F.lit(scale // n_nodes)
    ).localCheckpoint(eager=True)
    for _ in range(n_iters):
        inc = (
            edges_deg.join(
                ranks.select(F.col("node").alias("src"), "r"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("r div deg")).alias("s"))
        )
        dang = ranks.filter(F.col("dangling")).agg(
            F.coalesce(F.sum("r"), F.lit(0)).alias("dang")
        )
        ranks = (
            nodes_flag.crossJoin(F.broadcast(dang))
            .join(inc, "node", "left")
            .select(
                "node",
                "dangling",
                F.expr(
                    f"{base_num // n_nodes}"
                    f" + ({damp_num} * (coalesce(s, 0)"
                    f" + dang div {n_nodes})) div {damp_den}"
                ).alias("r"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks.select("node", "r")


def pagerank_reference(
    edge_list: list[tuple[int, int]],
    *,
    n_iters: int,
    scale: int,
    damp_num: int = 85,
    damp_den: int = 100,
) -> dict[int, int]:
    """Pure-Python single-threaded reference of the SAME fixed-point
    recurrence (for differential tests — every operation an int op, so
    it must match the distributed result bit-for-bit)."""
    eset = sorted(set(edge_list))
    nodes = sorted({n for ed in eset for n in ed})
    n = len(nodes)
    out: dict[int, list[int]] = {}
    for s, d in eset:
        out.setdefault(s, []).append(d)
    base = (scale * (damp_den - damp_num)) // damp_den // n
    r = {v: scale // n for v in nodes}
    for _ in range(n_iters):
        inc = {v: 0 for v in nodes}
        dang = 0
        for v in nodes:
            targets = out.get(v)
            if not targets:
                dang += r[v]
                continue
            c = r[v] // len(targets)
            for d in targets:
                inc[d] += c
        r = {
            v: base + (damp_num * (inc[v] + dang // n)) // damp_den
            for v in nodes
        }
    return r
