#!/usr/bin/env python3
"""Two-decade scaling points for the rank/scan statistics shapes.

a24_roc_auc (global_rank) and a25_ks_test (global_prefix_sum) carry the
claim that a 100 TB rank or running total never funnels through one
window task. This tool amplifies `events` x10 and x100 — event ids
shifted, each copy's value offset by c microunits so the distinct-value
frame grows density-constant alongside the row count — and times both
queries at x1/x10/x100. Expected profile: wall tracks the range-shuffle
scan (linear, amortized by idle cores at small x), never bends
superlinearly; outputs stay fixed-size (5 rows / 1 row).

Usage: python3 tools/rank_scan_scale.py   (~6 min; prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AMP_DIR = "/tmp/spark_graft_events_amplified"
# a27_pr_auc (r7) rides the same global_prefix_sum machinery as a25 over
# the same events frame — same amplifier, same expected profile
QUERIES = ("a24_roc_auc", "a25_ks_test", "a27_pr_auc")


def amplify(src_dir: str, factor: int) -> str:
    import duckdb

    dst = f"{AMP_DIR}_x{factor}"
    if os.path.exists(f"{dst}/events.parquet"):
        return dst
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    events = f"{src_dir}/events.parquet"
    n = con.execute(
        f"SELECT MAX(event_id) + 1 FROM read_parquet('{events}')"
    ).fetchone()[0]
    part_dir = f"{dst}/events.parquet"
    os.makedirs(part_dir, exist_ok=True)
    for lo in range(0, factor, 10):
        copies = " UNION ALL ".join(
            f"SELECT event_id + {c * n} AS event_id, ts, user_id, event_type, "
            f"value + {c} * 0.000001 AS value, props "
            f"FROM read_parquet('{events}')"
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

    spark = get_spark("rank_scan_scale")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    qs["a24_roc_auc"].fn(spark, base).count()  # JVM/codegen warmup

    out: dict[str, dict[str, float | int]] = {}
    for sf_dir, tag in dirs:
        spark.catalog.clearCache()
        for name in QUERIES:
            best = float("inf")
            rows = 0
            for _ in range(3):
                t0 = time.perf_counter()
                rows = qs[name].fn(spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            out.setdefault(name, {})[tag] = round(best, 2)
            out[name][f"rows_{tag}"] = rows
            print(f"{tag} {name} {best:.2f}s rows={rows}", file=sys.stderr)
    for name in QUERIES:
        r = out[name]
        r["ratio_10"] = round(r["x10"] / r["x1"], 2)
        r["ratio_100"] = round(r["x100"] / r["x10"], 2)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
