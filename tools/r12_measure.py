#!/usr/bin/env python3
"""r12 optimization-round measurement harness.

For each named query (or the full bench HEADLINE set): time the
computation through the noop sink (guide §1.4 — computes every column,
no driver materialization, appears in the SQL tab), min-of-N passes,
and dump ``explain('formatted')`` to plans/r12/<query>_<tag>.txt so the
plan claims in OPTIMIZATION_r12.md are auditable offline.

Usage:
  python tools/r12_measure.py [--tag before|after] [--passes 3]
                              [--no-plans] [query ...]

Defaults to the bench HEADLINE order. Prints one line per query:
  <warm_sec> <cold_sec> <name>
and a total. Uses the same session factory + sf dir contract as
bench.py so numbers are comparable (not identical: bench consumes via
count(), this consumes via noop — both full-compute for these plans;
bench.py's numbers remain the graded ones).
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from project_crypto_data_engineering_gcp_spark.plans import all_queries  # noqa: E402
from project_crypto_data_engineering_gcp_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    passes = 3
    dump_plans = True
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--passes":
            passes = int(next(it))
        elif a == "--no-plans":
            dump_plans = False
        else:
            names.append(a)
    if not names:
        names = list(HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r12")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("spark_graft_r12_measure")
    queries = all_queries()

    # same warmups as bench.py: JVM/codegen, Python worker pool, broadcast
    queries["q1_pricing_summary"].fn(spark, sf_dir).count()
    spark.range(32).mapInPandas(lambda it_: it_, schema="id long").count()
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame([(0, [0.0])], "k bigint, v array<double>")
    spark.range(8).join(F.broadcast(tiny), F.col("id") == F.col("k"), "left").count()

    results: dict[str, dict[str, float]] = {}
    for name in names:
        spark.catalog.clearCache()
        q = queries[name]
        spark.sparkContext.setJobDescription(f"r12 {tag}: {name}")
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        cold, warm = ts[0], min(ts[1:]) if len(ts) > 1 else ts[0]
        results[name] = {"warm": round(warm, 3), "cold": round(cold, 3)}
        print(f"{warm:8.3f} {cold:8.3f}  {name}", flush=True)
        if dump_plans:
            buf = io.StringIO()
            with redirect_stdout(buf):
                q.fn(spark, sf_dir).explain("formatted")
            with open(os.path.join(plan_dir, f"{name}_{tag}.txt"), "w") as fh:
                fh.write(buf.getvalue())

    total = round(sum(r["warm"] for r in results.values()), 3)
    print(f"TOTAL warm {total}")
    with open(os.path.join(plan_dir, f"measure_{tag}.json"), "w") as fh:
        json.dump({"total_warm": total, "queries": results, "sf_dir": sf_dir}, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
