#!/usr/bin/env python3
"""Two-decade scaling point for a23_bootstrap_ci (half-sample replication).

The query's scale claim: the ~24x replica explode feeds ONE map-combinable
groupBy whose shuffle is bounded at n_groups x 48 rows per partition, so
wall time should track the SCAN (linear in input), never the shuffle or
the window (both fixed-size). This tool amplifies `orders` x10 and x100
with shifted o_orderkey (copies get fresh hashes, so replica memberships
re-randomize honestly — the CI narrows as sqrt(n) like real data would)
and times the query at x1/x10/x100.

Usage: python3 tools/bootstrap_scale.py   (~5 min; prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_DIR = "/tmp/spark_graft_orders_amplified"


def amplify(src_dir: str, factor: int) -> str:
    import duckdb

    dst = f"{AMP_DIR}_x{factor}"
    if os.path.exists(f"{dst}/orders.parquet"):
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    orders = f"{src_dir}/orders.parquet"
    n = con.execute(
        f"SELECT MAX(o_orderkey) + 1 FROM read_parquet('{orders}')"
    ).fetchone()[0]
    part_dir = f"{dst}/orders.parquet"
    os.makedirs(part_dir, exist_ok=True)
    for lo in range(0, factor, 10):
        copies = " UNION ALL ".join(
            f"SELECT * REPLACE (o_orderkey + {c * n} AS o_orderkey) "
            f"FROM read_parquet('{orders}')"
            for c in range(lo, min(lo + 10, factor))
        )
        con.execute(
            f"COPY ({copies}) TO '{part_dir}/part_{lo:04d}.parquet' "
            "(FORMAT PARQUET)"
        )
    return dst


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.plans import all_queries
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dirs = [(base, "x1"), (amplify(base, 10), "x10"), (amplify(base, 100), "x100")]

    spark = get_spark("bootstrap_scale")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_queries()["a23_bootstrap_ci"]
    q.fn(spark, base).count()  # JVM/codegen warmup

    out: dict[str, float | int] = {}
    for sf_dir, tag in dirs:
        spark.catalog.clearCache()
        best = float("inf")
        rows = 0
        for _ in range(3):
            t0 = time.perf_counter()
            rows = q.fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        out[tag] = round(best, 2)
        out[f"rows_{tag}"] = rows
        print(f"{tag} {best:.2f}s rows={rows}", file=sys.stderr)
    out["ratio_10"] = round(out["x10"] / out["x1"], 2)
    out["ratio_100"] = round(out["x100"] / out["x10"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
