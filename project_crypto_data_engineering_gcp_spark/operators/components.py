"""Connected components over a similarity-pair graph (transitive dedup).

The one-pass dedup queries mark each doc a duplicate of its smallest
more-similar neighbor; full dedup needs the TRANSITIVE closure — if A~B
and B~C, all three form one cluster even when A~C is below threshold.
That is connected components, an inherently iterative algorithm.

Implementation: large-star/small-star-style label propagation — every
node starts labeled with its own id; each round, every node adopts the
minimum label in its closed neighborhood; converged when no label
changes. Rounds = O(graph diameter); near-dup graphs are unions of small
cliques, so 2-4 rounds in practice.

Scale mechanics: each round is one join (labels x edges, key-partitioned)
+ one min-aggregate — both shuffle on node id only. Lineage is cut every
round with ``localCheckpoint`` (iterative algorithms otherwise stack
plans until the optimizer chokes); on a cluster with an HDFS checkpoint
dir, ``checkpoint`` gives the same with fault tolerance. The convergence
check is a count of changed labels (one scalar per round — the only
driver involvement).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable
    over the undirected edge set. Edges need not be deduplicated."""
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    nodes = sym.select(F.col("a").alias("node")).distinct()
    labels = nodes.withColumn("component", F.col("node")).localCheckpoint(eager=False)

    for _ in range(max_iterations):
        # each node's new label: min(own label, min label among neighbors)
        neighbor_labels = (
            sym.join(labels, sym.b == labels.node)
            .select(F.col("a").alias("node"), F.col("component"))
        )
        new_labels = (
            labels.select("node", "component")
            .unionByName(neighbor_labels)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels
