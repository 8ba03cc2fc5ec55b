#!/usr/bin/env python3
"""LPA/BFS over bucketed storage: the pagerank_bucketed.py protocol
applied to label_propagation and bfs_distances (r9 follow-on —
SCALE.md's bucketed-storage claim covers the whole iterative family;
both share the symmetrized bucketed table). Select with
SPARK_GRAFT_OP=lpa|bfs (default lpa).

ISOLATED protocol: one variant per process, idle box, amplified input
read cold from disk. The bucketed table stores the SYMMETRIZED frame
(the operator's caller contract — both directions, duplicates kept).

    python3 tools/lpa_bucketed.py prepare
    python3 tools/lpa_bucketed.py baseline   # plain parquet, default mode
    python3 tools/lpa_bucketed.py persist    # edge_partitions=64
    python3 tools/lpa_bucketed.py bucketed   # bucketed sym table

Env: SPARK_GRAFT_SCALE_LEVEL (default 16), SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_BUCKETS (default 64), SPARK_GRAFT_WORKDIR.
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

LEVEL = int(os.environ.get("SPARK_GRAFT_SCALE_LEVEL", "16"))
BUCKETS = int(os.environ.get("SPARK_GRAFT_BUCKETS", "64"))
WORKDIR = os.environ.get("SPARK_GRAFT_WORKDIR", "/tmp/lpa_bucketed")
ROUNDS = 3
OP = os.environ.get("SPARK_GRAFT_OP", "lpa")


def _spark():
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    return get_spark("lpa_bucketed")


def _paths():
    return (
        os.path.join(WORKDIR, f"edges_plain_x{LEVEL}"),
        os.path.join(WORKDIR, f"sym_bucketed_x{LEVEL}"),
    )


def prepare() -> None:
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
            (F.col("o_custkey") * 2).alias("u"),
            (F.col("l_suppkey") * 2 + 1).alias("v"),
        )
        .localCheckpoint(eager=True)
    )
    edges = amplify(spark, base, LEVEL, ("u", "v")).persist()
    n = edges.count()
    plain, bucketed = _paths()
    t0 = time.perf_counter()
    edges.write.parquet(plain)
    plain_write = round(time.perf_counter() - t0, 2)
    sym = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    drop_bucketed(spark, "lpa_sym_bucketed")
    t0 = time.perf_counter()
    write_bucketed(sym, "lpa_sym_bucketed", bucketed, buckets=BUCKETS, key="u")
    bucketed_write = round(time.perf_counter() - t0, 2)
    print(
        json.dumps(
            {
                "step": "prepare",
                "level": LEVEL,
                "edges": n,
                "plain_write_sec": plain_write,
                "bucketed_sym_write_sec": bucketed_write,
            }
        )
    )


def run_variant(variant: str) -> None:
    from project_crypto_data_engineering_gcp_spark.operators.graph import (
        bfs_distances,
        label_propagation,
    )

    spark = _spark()
    plain, bucketed = _paths()
    if variant == "bucketed":
        from project_crypto_data_engineering_gcp_spark.sources.bucketing import (
            register_bucketed,
        )

        edges = register_bucketed(
            spark,
            f"lpa_sym_bucketed_x{LEVEL}_r",
            bucketed,
            buckets=BUCKETS,
            key="u",
        )
        kwargs = {"edges_pre_bucketed": True}
    else:
        edges = spark.read.parquet(plain)
        kwargs = {"edge_partitions": BUCKETS} if variant == "persist" else {}

    passes = []
    checksum = None
    for _ in range(2):
        t0 = time.perf_counter()
        if OP == "bfs":
            out = bfs_distances(edges, seed_mod=100, rounds=ROUNDS, **kwargs)
            agg = out.agg(F.sum("d").alias("s"), F.count(F.lit(1)).alias("n"))
        else:
            out = label_propagation(edges, rounds=ROUNDS, **kwargs)
            agg = out.agg(
                F.sum("community").alias("s"), F.count(F.lit(1)).alias("n")
            )
        row = agg.collect()[0]
        passes.append(round(time.perf_counter() - t0, 2))
        checksum = [int(row["s"]), int(row["n"])]
    print(
        json.dumps(
            {
                "op": OP,
                "variant": variant,
                "level": LEVEL,
                "cold_sec": passes[0],
                "steady_sec": passes[1],
                "checksum_sum_and_rows": checksum,
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
