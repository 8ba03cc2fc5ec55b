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

each variant prints one JSON line with cold (pass 1) and steady-state
(pass 2) wall seconds plus a result checksum (sum of ranks + node
count) — bit-identical across variants by construction, verified by
comparing the printed checksums.

Env: SPARK_GRAFT_SCALE_LEVEL (default 100), SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1), SPARK_GRAFT_BUCKETS (default 64),
SPARK_GRAFT_WORKDIR (default /tmp/pr_bucketed).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from bench_common import amplify

LEVEL = int(os.environ.get("SPARK_GRAFT_SCALE_LEVEL", "100"))
BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "64"))
WORKDIR = os.environ.get("SPARK_GRAFT_WORKDIR", "/tmp/pr_bucketed")
N_ITERS, SCALE = 5, 10**12


def _spark():
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    return get_spark("pagerank_bucketed")


def _paths():
    return (
        os.path.join(WORKDIR, f"edges_plain_x{LEVEL}"),
        os.path.join(WORKDIR, f"edges_bucketed_x{LEVEL}"),
    )


def prepare() -> None:
    """Write the SAME amplified, distinct edge frame twice: plain
    parquet (baseline/persist variants) and bucketed by src (bucketed
    variant). The bucketed write's extra cost over the plain write IS
    the one-time price of the mode — both are timed."""
    from project_crypto_data_engineering_gcp_spark.sources.bucketing import (
        drop_bucketed,
        write_bucketed,
    )
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    shutil.rmtree(WORKDIR, ignore_errors=True)
    os.makedirs(WORKDIR)
    spark = _spark()
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
    edges = amplify(spark, base, LEVEL, ("src", "dst")).persist()
    n = edges.count()
    plain, bucketed = _paths()

    t0 = time.perf_counter()
    edges.write.parquet(plain)
    plain_write = round(time.perf_counter() - t0, 2)

    drop_bucketed(spark, "pr_edges_bucketed")
    t0 = time.perf_counter()
    write_bucketed(
        edges, "pr_edges_bucketed", bucketed, buckets=BUCKETS, key="src"
    )
    bucketed_write = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "step": "prepare",
                "level": LEVEL,
                "edges": n,
                "plain_write_sec": plain_write,
                "bucketed_write_sec": bucketed_write,
            }
        )
    )


def run_variant(variant: str) -> None:
    from project_crypto_data_engineering_gcp_spark.operators.graph import (
        pagerank_fixed_point,
    )

    spark = _spark()
    plain, bucketed = _paths()
    if variant == "bucketed":
        from project_crypto_data_engineering_gcp_spark.sources.bucketing import (
            register_bucketed,
        )

        edges = register_bucketed(
            spark,
            f"pr_edges_bucketed_x{LEVEL}_r",
            bucketed,
            buckets=BUCKETS,
            key="src",
        )
        kwargs = {"edges_pre_bucketed": True}
    else:
        edges = spark.read.parquet(plain)
        kwargs = {"edge_partitions": BUCKETS} if variant == "persist" else {}

    passes = []
    checksum = None
    for _ in range(2):
        t0 = time.perf_counter()
        ranks = pagerank_fixed_point(edges, n_iters=N_ITERS, scale=SCALE, **kwargs)
        row = ranks.agg(
            F.sum("r").alias("s"), F.count(F.lit(1)).alias("n")
        ).collect()[0]
        passes.append(round(time.perf_counter() - t0, 2))
        checksum = [int(row["s"]), int(row["n"])]
    print(
        json.dumps(
            {
                "variant": variant,
                "level": LEVEL,
                "cold_sec": passes[0],
                "steady_sec": passes[1],
                "rank_sum_and_nodes": checksum,
            }
        )
    )


if __name__ == "__main__":
    step = sys.argv[1] if len(sys.argv) > 1 else "prepare"
    if step == "prepare":
        prepare()
    elif step in ("baseline", "persist", "bucketed"):
        run_variant(step)
    else:
        raise SystemExit(f"unknown step {step!r}")
