#!/usr/bin/env python3
"""r13 pagerank A/B: broadcast-state rounds (new default under the
node ceiling) vs the r12 shuffle placement, interleaved min-of-N noop
passes on the graded graph_pagerank query at $SPARK_GRAFT_SF_DIR.

Also dumps the UNCUT loop-body plans (the returned frame's explain is
truncated at the final lazy lineage cut, so plan evidence needs the cut
disabled): DataFrame.localCheckpoint is monkeypatched to identity FOR
THE PLAN DUMP ONLY — never for timing — and the 2-round plan is written
to plans/r13/graph_pagerank_loopbody_{bcast,shuffle}.txt.

Usage: python tools/r13_pagerank_ab.py [--passes 4] [--iters-ab 3]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Spark 4: instances are the classic subclass — patching the public
# pyspark.sql.DataFrame parent would not intercept method dispatch
from pyspark.sql.classic.dataframe import DataFrame

from project_crypto_data_engineering_gcp_spark.plans import all_queries
from project_crypto_data_engineering_gcp_spark.session import get_spark


def main() -> None:
    passes = 4
    args = sys.argv[1:]
    if "--passes" in args:
        passes = int(args[args.index("--passes") + 1])

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("r13_pagerank_ab")
    fn = all_queries()["graph_pagerank"].fn
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warmup

    # ---- plan dumps: identity-patch the lineage cuts so the full
    # 2-round loop body is visible (PLAN INSPECTION ONLY) ----
    real_lc = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self  # type: ignore
    try:
        from project_crypto_data_engineering_gcp_spark.operators.graph import (
            pagerank_fixed_point,
        )
        from project_crypto_data_engineering_gcp_spark.sources.tables import (
            load_table,
        )
        from pyspark.sql import functions as F

        orders = load_table(spark, sf_dir, "orders")
        li = load_table(spark, sf_dir, "lineitem")
        edges = orders.join(li, orders.o_orderkey == li.l_orderkey).select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        for mode, env in (("bcast", ""), ("shuffle", "0")):
            os.environ["SPARK_GRAFT_BROADCAST_MAX_NODES"] = env
            df = pagerank_fixed_point(edges, n_iters=2, scale=10**9)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            with open(
                os.path.join(plan_dir, f"graph_pagerank_loopbody_{mode}.txt"), "w"
            ) as fh:
                fh.write(buf.getvalue())
            print(f"loop-body plan dumped: {mode}")
    finally:
        DataFrame.localCheckpoint = real_lc  # type: ignore
        os.environ.pop("SPARK_GRAFT_BROADCAST_MAX_NODES", None)

    # ---- interleaved timing, real operator (cuts intact) ----
    results = {"bcast": [], "shuffle": []}
    for p in range(passes):
        for mode, env in (("bcast", ""), ("shuffle", "0")):
            if env:
                os.environ["SPARK_GRAFT_BROADCAST_MAX_NODES"] = env
            else:
                os.environ.pop("SPARK_GRAFT_BROADCAST_MAX_NODES", None)
            spark.sparkContext.setJobDescription(f"pagerank {mode} pass{p}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            results[mode].append(dt)
            print(f"pass {p} {mode:8s} {dt:6.3f}s", flush=True)
    spark.sparkContext.setJobDescription(None)
    os.environ.pop("SPARK_GRAFT_BROADCAST_MAX_NODES", None)
    for mode, ts in results.items():
        print(f"{mode:8s} min {min(ts):.3f} med {sorted(ts)[len(ts)//2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
