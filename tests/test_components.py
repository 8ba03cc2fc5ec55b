"""Connected-components verification against a pure-Python union-find on
the same edge set, plus convergence on an adversarial chain graph."""

from __future__ import annotations

from project_crypto_data_engineering_gcp_spark.operators.components import (
    connected_components,
)
from project_crypto_data_engineering_gcp_spark.plans import all_queries

from .conftest import SF_ORACLE


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_components_match_union_find_on_similarity_graph(spark):
    pairs_df = (
        all_queries()["dedup_ngram_jaccard"].fn(spark, SF_ORACLE)
        .select("doc_a", "doc_b")
    )
    edges = [(r["doc_a"], r["doc_b"]) for r in pairs_df.collect()]
    assert edges, "expected a non-empty similarity graph"
    expected = _union_find(edges)
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs_df, src="doc_a", dst="doc_b").collect()
    }
    assert got == expected


def test_components_converge_on_chain(spark):
    # a path graph is the worst case for label propagation (diameter = n)
    n = 12
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, max_iterations=n + 2).collect()
    }
    assert set(got.values()) == {0}
    assert len(got) == n + 1
