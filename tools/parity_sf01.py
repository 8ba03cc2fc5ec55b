#!/usr/bin/env python3
"""Corpus parity at sf0.1 — ten times the driver's checked scale.

The grading driver (and tests/test_corpus_parity.py) verify every query
against its DuckDB oracle at sf0.01. This tool replays the SAME
comparison at sf0.1 for every query whose ORACLE is tractable there —
extra evidence that correctness is not an artifact of the small scale
factor (partition-count-sensitive bugs, overflow at larger aggregates,
tie-handling across more duplicates all surface with 10x the data).

Skipped: only queries with no oracle at all (the rows-only set). The r5
skip list of "quadratic oracles" (brute-force similarity baseline, IVF/PQ
CROSS-JOIN CTEs, pairwise dedup verifies) was retired in r6 after
measuring every entry: the WORST skipped oracle runs in 4.4 s at sf0.1
(2000 x 64-dim embeddings and candidate-gated dedup joins are trivial for
multithreaded DuckDB) — the "hours" estimate behind the list was never
re-measured. Full-corpus sweep coverage means ROUND-tie and
scale-sensitive divergence is observable for EVERY oracle-paired query.

Usage: python3 tools/parity_sf01.py [query_name ...]
With names, checks only those queries (fast re-verify of a new batch);
with none, sweeps the full corpus.
Prints one JSON line {"checked": N, "ok": N, "failed": [...], "skipped": N}.

Sharding (r12): the full sweep is ~27 min at 253 queries — one corpus
growth away from the environment's ~30-min single-process ceiling
(SCALE.md r12). SPARK_GRAFT_PARITY_SHARDS=2 SPARK_GRAFT_PARITY_SHARD=0
runs every even-indexed registry query in its own process (shard 1 the
odd ones); run the shards SEQUENTIALLY (never two Spark sessions at
once) and sum the JSON lines.
"""

from __future__ import annotations

import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import __spark_entry__ as entry
    from project_crypto_data_engineering_gcp_spark.session import get_spark
    from tests.oracle_harness import assert_frames_match, run_duckdb

    sf_dir = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")

    # the engine session factory (16g driver default): a bare default
    # session OOMs the JVM partway through the sweep at sf0.1
    spark = get_spark("parity_sf01")
    spark.sparkContext.setLogLevel("ERROR")

    qs, osql = entry.queries(), entry.oracle_sql()
    n_shards = int(os.environ.get("SPARK_GRAFT_PARITY_SHARDS", "1"))
    shard = int(os.environ.get("SPARK_GRAFT_PARITY_SHARD", "0"))
    if n_shards > 1:
        qs = {
            n: f for i, (n, f) in enumerate(qs.items()) if i % n_shards == shard
        }
    only = set(sys.argv[1:])
    if only:
        unknown = only - set(qs)
        if unknown:
            raise SystemExit(f"unknown queries: {sorted(unknown)}")
        qs = {n: f for n, f in qs.items() if n in only}
    failed: list[str] = []
    checked = 0
    skipped = 0
    for name, fn in qs.items():
        if name not in osql:
            skipped += 1
            continue
        try:
            assert_frames_match(fn(spark, sf_dir), run_duckdb(osql[name], sf_dir), name)
            checked += 1
        except Exception:
            checked += 1
            failed.append(name)
            print(f"FAIL {name}", file=sys.stderr)
            traceback.print_exc(limit=3, file=sys.stderr)
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "checked": checked,
                "ok": checked - len(failed),
                "failed": failed,
                "skipped": skipped,
            }
        )
    )
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
