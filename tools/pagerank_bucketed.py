#!/usr/bin/env python3
"""PageRank over bucketed storage (r8 verdict task 5): the durable twin
of the r8 in-memory co-partitioning result.

The r8 experiment (SCALE.md "PageRank co-partitioning experiment")
showed persist() of repartition+sort wins 2.7x at 60M edges because an
InMemoryRelation preserves partitioning. bucketBy moves that shuffle to
WRITE time: a fresh, cold process reads the bucketed table by name and
every per-round join still elides the edge-side exchange — zero cache
memory, the real-cluster idiom for frames bigger than RAM.

ISOLATED protocol (the r8 methodology): ONE variant per process, idle
box, amplified input read from disk cold. Run:

    python3 tools/pagerank_bucketed.py prepare   # write x{N} inputs once
    python3 tools/pagerank_bucketed.py baseline  # plain parquet, default mode
    python3 tools/pagerank_bucketed.py persist   # plain parquet, edge_partitions=64
    python3 tools/pagerank_bucketed.py bucketed  # bucketed table, pre-bucketed mode

Each variant prints one JSON line with cold (pass 1) and steady-state
(pass 2) wall seconds plus a (rank-sum, node-count) checksum —
bit-identical across variants by construction; compare the printed
checksums. The bucketed table stores the DISTINCT edge frame (the
pagerank pre-bucketed caller contract).

Env: SPARK_GRAFT_SCALE_LEVEL (default 100), SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1), SPARK_GRAFT_BUCKETS (default 64),
SPARK_GRAFT_WORKDIR (default /tmp/pr_bucketed). Scaffold
(prepare/run/timing/checksum) lives in tools/bucketed_common.py.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

import bucketed_common
from bench_common import amplify

LEVEL = int(os.environ.get("SPARK_GRAFT_SCALE_LEVEL", "100"))
BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "64"))
WORKDIR = os.environ.get("SPARK_GRAFT_WORKDIR", "/tmp/pr_bucketed")
N_ITERS, SCALE = 5, 10**12
TABLE = "pr_edges_bucketed"


def _spark():
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    return get_spark("pagerank_bucketed")


def _paths():
    return (
        os.path.join(WORKDIR, f"edges_plain_x{LEVEL}"),
        os.path.join(WORKDIR, f"edges_bucketed_x{LEVEL}"),
    )


def _base_edges(spark):
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    base = (
        orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    return amplify(spark, base, LEVEL, ("src", "dst"))


def _run_op(edges, **kwargs):
    from project_crypto_data_engineering_gcp_spark.operators.graph import (
        pagerank_fixed_point,
    )

    return pagerank_fixed_point(edges, n_iters=N_ITERS, scale=SCALE, **kwargs)


if __name__ == "__main__":
    step = sys.argv[1] if len(sys.argv) > 1 else "prepare"
    plain, bucketed = _paths()
    if step == "prepare":
        bucketed_common.prepare(
            _spark(),
            _base_edges(_spark()),
            workdir=WORKDIR,
            level=LEVEL,
            buckets=BUCKETS,
            key="src",
            table_name=TABLE,
            plain_path=plain,
            bucketed_path=bucketed,
        )
    elif step in ("baseline", "persist", "bucketed"):
        bucketed_common.run_variant(
            _spark(),
            step,
            op="pagerank",
            level=LEVEL,
            buckets=BUCKETS,
            key="src",
            table_name=TABLE,
            plain_path=plain,
            bucketed_path=bucketed,
            run_op=_run_op,
            checksum_cols=("r", "n"),
        )
    else:
        raise SystemExit(f"unknown step {step!r}")
