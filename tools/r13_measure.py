#!/usr/bin/env python3
"""r13 optimization-round measurement harness.

For each named query (or the full bench HEADLINE set): time the
computation through the noop sink (guide §1.4 — computes every column,
no driver materialization, appears in the SQL tab), min-of-N passes,
and dump ``explain('formatted')`` to plans/r13/<query>_<tag>.txt so the
plan claims in OPTIMIZATION_r13.md are auditable offline.

Usage:
  python tools/r13_measure.py [--tag before|after] [--passes 3]
                              [--no-plans] [--pool-cold] [query ...]

Defaults to the bench HEADLINE order. Prints one line per query:
  <warm_sec> <cold_sec> <name>
and a total. Uses the same session factory + sf dir contract as
bench.py so numbers are comparable (not identical: bench consumes via
count(), this consumes via noop — both full-compute for these plans;
bench.py's numbers remain the graded ones).

r12 ADVICE fixes vs tools/r12_measure.py:
  - flag values are read with a usage error instead of a bare
    StopIteration, and --passes < 2 labels the number cold-only;
  - clearCache() is NOT issued per query by default (it unpersisted the
    pooled frames while the module-level memo pools kept returning
    them, so pooled queries were silently timed on a recompute path
    production repeat calls never hit). ``--pool-cold`` restores the
    old behaviour explicitly; either way the mode is printed.
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


def _usage(msg: str) -> None:
    sys.exit(f"r13_measure: {msg}\nusage: see module docstring")


def main() -> None:
    args = sys.argv[1:]
    tag = "before"
    passes = 3
    dump_plans = True
    pool_cold = False
    names: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it, None) or _usage("--tag needs a value")
        elif a == "--passes":
            v = next(it, None)
            if v is None:
                _usage("--passes needs a value")
            passes = int(v)
        elif a == "--no-plans":
            dump_plans = False
        elif a == "--pool-cold":
            pool_cold = True
        else:
            names.append(a)
    if not names:
        names = list(HEADLINE)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    plan_dir = os.path.join(here, "plans", "r13")
    os.makedirs(plan_dir, exist_ok=True)

    spark = get_spark("spark_graft_r13_measure")
    queries = all_queries()

    # same warmups as bench.py: JVM/codegen, Python worker pool, broadcast
    queries["q1_pricing_summary"].fn(spark, sf_dir).count()
    spark.range(32).mapInPandas(lambda it_: it_, schema="id long").count()
    from pyspark.sql import functions as F

    tiny = spark.createDataFrame([(0, [0.0])], "k bigint, v array<double>")
    spark.range(8).join(F.broadcast(tiny), F.col("id") == F.col("k"), "left").count()

    print(f"mode: {'pool-cold (clearCache per query)' if pool_cold else 'pool-warm'}"
          f", passes={passes}" + (" (cold-only!)" if passes < 2 else ""))
    results: dict[str, dict[str, float]] = {}
    for name in names:
        if pool_cold:
            spark.catalog.clearCache()
        q = queries[name]
        spark.sparkContext.setJobDescription(f"r13 {tag}: {name}")
        ts = []
        for _ in range(passes):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            ts.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        cold = ts[0]
        warm = min(ts[1:]) if len(ts) > 1 else ts[0]
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
        json.dump(
            {"total_warm": total, "queries": results, "sf_dir": sf_dir,
             "pool_cold": pool_cold, "passes": passes},
            fh, indent=1,
        )
    spark.stop()


if __name__ == "__main__":
    main()
