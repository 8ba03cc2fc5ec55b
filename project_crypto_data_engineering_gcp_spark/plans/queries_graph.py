"""Graph analytics corpus queries — iterative algorithms done Spark-first.

The reference engine has no graph surface; this module extends the
superset the way the dedup family's transitive closure
(``operators/components.py``) did: an inherently iterative computation
expressed as per-round DataFrame join+aggregate with lineage cuts, and —
unusually for an iterative op — a FULL value-exact DuckDB oracle.

Two design decisions make the oracle possible:

* **Fixed iteration count.** PageRank here runs exactly ``PR_ITERS``
  rounds (production would iterate to an L1-delta tolerance; the per
  round plan is identical). A fixed count unrolls into ``PR_ITERS``
  chained CTEs on the DuckDB side.
* **Fixed-point integer arithmetic.** Ranks are BIGINTs scaled by
  ``PR_SCALE``; every per-round operation (contribution split, damping,
  dangling redistribution) is integer multiply/divide. Floating-point
  PageRank is NOT reproducible across engines — or even across two runs
  on different cluster sizes, because double summation order changes with
  partitioning. Integer sums are associative-exact, so the result is
  bit-identical on any parallelism AND in DuckDB (Spark ``div`` and
  DuckDB ``//`` agree on non-negative operands; every quantity here is
  non-negative). Truncation error is bounded by 1/PR_SCALE = 1e-12 per
  division — invisible at ranking granularity.

Scale mechanics (the components.py doctrine): each round is one
key-partitioned join (ranks x edges on src) + one aggregate on dst, the
dangling-mass term is a 1-row aggregate broadcast back (no driver
collect), and every round ends in an eager ``localCheckpoint`` cutting
lineage — on a cluster, swap for ``checkpoint`` to an HDFS dir for fault
tolerance. State per round: one BIGINT per node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.tables import load_table
from .corpus import corpus_query

PR_SCALE = 10**12          # fixed-point scale: rank mass sums to ~PR_SCALE
PR_ITERS = 5               # fixed rounds (production: iterate to tolerance)
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100          # damping d = 0.85
PR_BASE_NUM = (PR_SCALE * (PR_DAMP_DEN - PR_DAMP_NUM)) // PR_DAMP_DEN
# (1-d)*PR_SCALE = 150_000_000_000; per-node base is this div N


def _pagerank_oracle() -> str:
    """Unrolled ``PR_ITERS``-round PageRank as chained CTEs, mirroring the
    Spark integer arithmetic operation-for-operation (`//` == `div` on
    non-negatives; SUMs cast back to BIGINT because DuckDB widens to
    HUGEINT)."""
    parts = [
        f"""
    WITH edges AS (
        SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    nodes AS (
        SELECT DISTINCT node FROM (
            SELECT src AS node FROM edges
            UNION ALL
            SELECT dst AS node FROM edges
        ) u
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    deg AS (SELECT src, COUNT(*) AS deg FROM edges GROUP BY src),
    r0 AS (SELECT node, {PR_SCALE} // n AS r FROM nodes, nn)"""
    ]
    for i in range(PR_ITERS):
        parts.append(
            f""",
    inc{i} AS (
        SELECT e.dst AS node, CAST(SUM(r.r // d.deg) AS BIGINT) AS s
        FROM edges e
        JOIN r{i} r ON r.node = e.src
        JOIN deg d ON d.src = e.src
        GROUP BY e.dst
    ),
    dang{i} AS (
        SELECT CAST(COALESCE(SUM(r.r), 0) AS BIGINT) AS dang
        FROM r{i} r LEFT JOIN deg d ON d.src = r.node
        WHERE d.src IS NULL
    ),
    r{i + 1} AS (
        SELECT n.node,
               {PR_BASE_NUM} // nn.n
               + ({PR_DAMP_NUM} * (COALESCE(i.s, 0) + dg.dang // nn.n))
                 // {PR_DAMP_DEN} AS r
        FROM nodes n
        CROSS JOIN nn
        CROSS JOIN dang{i} dg
        LEFT JOIN inc{i} i ON i.node = n.node
    )"""
        )
    parts.append(
        f"""
    SELECT node,
           CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END
               AS node_type,
           r AS rank_fp
    FROM r{PR_ITERS}"""
    )
    return "".join(parts)


@corpus_query("graph_pagerank", oracle=_pagerank_oracle(), bench=True)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the customer->supplier trade graph (edges = distinct
    (o_custkey, l_suppkey) pairs; customer nodes 2k, supplier nodes 2k+1
    keep the id spaces disjoint). {PR_ITERS} damped rounds at d=0.85 in
    {PR_SCALE}-scaled fixed point — see the module docstring for why
    integer arithmetic is what makes an iterative algorithm value-exact
    across engines and cluster sizes.

    Suppliers have no outgoing edges, so the graph exercises the dangling
    -mass path every round: dangling rank is summed in a 1-row aggregate
    and redistributed uniformly (broadcast cross-join — no driver
    round-trip, same pattern as operators/share.py).
    """
    from ..operators.graph import pagerank_fixed_point

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    edges = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).select(
        (F.col("o_custkey") * 2).alias("src"),
        (F.col("l_suppkey") * 2 + 1).alias("dst"),
    )
    ranks = pagerank_fixed_point(
        edges,
        n_iters=PR_ITERS,
        scale=PR_SCALE,
        damp_num=PR_DAMP_NUM,
        damp_den=PR_DAMP_DEN,
    )
    return ranks.select(
        "node",
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_type"),
        F.col("r").alias("rank_fp"),
    )
