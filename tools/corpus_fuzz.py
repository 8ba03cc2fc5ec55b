#!/usr/bin/env python3
"""Differential corpus fuzzing: run every query and its DuckDB oracle
over SEEDED ADVERSARIAL perturbations of the testdata — the input
domains the fixed sf fixtures never exercise (empty groups, customers
without orders, near-empty dimensions, heavy value ties, duplicate
rows, colliding documents/embeddings).

The fixed-sf differential corpus proves the two engines agree on ONE
realistic dataset; this tool probes whether they agree on the whole
input DOMAIN the queries' contracts claim (null-guarded divisions,
explicit tiebreakers, empty-slice behavior). Every perturbation is
applied ONCE, in DuckDB, and written to parquet — both engines then
read the identical files, so any mismatch is a genuine cross-engine
semantics gap in the query pair, never generation noise.

Perturbations per seed (all decisions from one seeded RNG + per-row
DuckDB hash(key, seed) marks, deterministic within a DuckDB version):

  subsample    keep a per-table fraction in [0.3, 0.9] — creates
               orphaned FKs, empty groups, missing join partners
  near-empty   ONE relational table crushed to <= 3 rows (documents/
               embeddings floored at 50: index contracts like IVF
               cell counts and PQ subspaces need a working corpus)
  duplicates   (opt-in, --dups PCT) full rows re-appended verbatim —
               probes BAG-semantics equivalence OUTSIDE the tables'
               unique-key contracts; exploration only, not the gate
  tie quantize value columns snapped to a coarse grid and event
               timestamps truncated to the minute — stresses every
               ORDER BY's tiebreaker; a query pair whose orders
               disagree only under ties is a real contract bug
  collisions   ~1 in 6 documents adopts another surviving document's
               text; same for embedding vectors — true duplicates
               with DISTINCT keys (what exact/minhash/simhash/cosine
               dedup exist to find), plus exact cosine ties for topk

Usage:
    python3 tools/corpus_fuzz.py                  # seeds 1..3, all queries
    python3 tools/corpus_fuzz.py --seeds 7 8      # specific seeds
    python3 tools/corpus_fuzz.py --queries dedup_exact,a36_gini_drift_by_nation

Exit 1 on any mismatch. ~6-8 min per seed for the full corpus.
"""
from __future__ import annotations

import argparse
import os
import random
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE_DEFAULT = "/root/testdata/sf0.001"

# (table, key column used for deterministic row marks)
KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 10 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

# tables eligible for the near-empty crush (documents/embeddings are
# floored instead: ANN/PQ/IVF queries carry corpus-size contracts —
# k-NN needs neighbors to exist, PQ needs training rows per subspace)
CRUSHABLE = ("supplier", "part", "customer", "orders", "lineitem", "events")

# value columns snapped to a coarse tie grid (keys and text untouched)
QUANTIZE = {
    "customer": {"c_acctbal": "round(c_acctbal / 100) * 100"},
    "supplier": {"s_acctbal": "round(s_acctbal / 100) * 100"},
    "orders": {"o_totalprice": "round(o_totalprice / 500) * 500"},
    "part": {"p_retailprice": "round(p_retailprice / 100) * 100"},
    "lineitem": {
        "l_extendedprice": "round(l_extendedprice / 500) * 500",
        "l_quantity": "round(l_quantity / 5) * 5",
        "l_discount": "round(l_discount, 1)",
        "l_tax": "round(l_tax, 1)",
    },
    "events": {
        "value": "round(value / 10) * 10",
        "ts": "date_trunc('minute', ts)",
    },
}


def build_fuzz_dataset(
    base_dir: str,
    out_dir: str,
    seed: int,
    *,
    dup_pct: int = 0,
    crush_rows: int = 3,
    con=None,
) -> dict[str, int]:
    """Write the seed's perturbed copy of every table under ``out_dir``
    and return {table: rows}. All transforms run inside DuckDB and the
    result is plain parquet — Spark and the oracle read identical bytes.

    ``dup_pct`` re-appends that percentage of rows verbatim. OFF by
    default: every table carries a unique-key contract (doc_id,
    o_orderkey, ...) that the oracle corpus is entitled to assume, so
    duplicate keys probe BAG-semantics equivalence outside the
    contract — useful exploration (--dups surfaced intersect-vs-
    intersectAll style gaps), but not a correctness gate."""
    import duckdb

    rng = random.Random(seed)
    keep_pct = {t: rng.uniform(0.30, 0.90) for t in KEYS}
    crush = rng.choice(CRUSHABLE) if rng.random() < 0.7 else None
    quantize = rng.random() < 0.7
    collide_mod = 6

    own = con is None
    con = con or duckdb.connect()
    os.makedirs(out_dir, exist_ok=True)
    rows: dict[str, int] = {}
    try:
        for table, key in KEYS.items():
            src = os.path.join(base_dir, f"{table}.parquet")
            cols = [
                r[0]
                for r in con.execute(
                    f"DESCRIBE SELECT * FROM read_parquet('{src}')"
                ).fetchall()
            ]
            sel = list(cols)
            if quantize:
                for c, expr in QUANTIZE.get(table, {}).items():
                    sel[sel.index(c)] = f"{expr} AS {c}"
            mark = f"hash({key}, {seed})"
            kept = (
                f"SELECT {', '.join(sel)} FROM read_parquet('{src}')"
                f" WHERE {mark} % 1000 < {int(keep_pct[table] * 1000)}"
            )
            if table == crush:
                kept = (
                    f"SELECT * FROM ({kept}) ORDER BY {key}"
                    f" LIMIT {crush_rows}"
                )
            elif table in ("documents", "embeddings"):
                # floor the corpus tables: keep the subsample but top it
                # back up to 50 rows from the base if the draw went low
                kept = (
                    f"SELECT * FROM ({kept}) UNION "
                    f"SELECT {', '.join(sel)} FROM ("
                    f"  SELECT * FROM read_parquet('{src}')"
                    f"  ORDER BY {key} LIMIT 50)"
                )
            body = f"kept AS ({kept})"
            final = "SELECT * FROM kept"
            if table == "documents":
                # ~1/collide_mod of rows adopt the text of the first
                # surviving doc in their doc_id//13 block: true
                # duplicates under distinct keys (and n_chars kept
                # consistent with the adopted text — the generator
                # honors the column's derivation contract)
                body += f""",
                collided AS (
                    SELECT * REPLACE (
                        CASE WHEN hash(doc_id, {seed + 1}) % {collide_mod} = 0
                             THEN first_value(text) OVER w ELSE text END AS text,
                        CASE WHEN hash(doc_id, {seed + 1}) % {collide_mod} = 0
                             THEN first_value(n_chars) OVER w ELSE n_chars
                             END AS n_chars)
                    FROM kept
                    WINDOW w AS (PARTITION BY doc_id // 13 ORDER BY doc_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING))
                """
                final = "SELECT * FROM collided"
            elif table == "embeddings":
                body += f""",
                collided AS (
                    SELECT * REPLACE (
                        CASE WHEN hash(vec_id, {seed + 1}) % {collide_mod} = 0
                             THEN first_value(embedding) OVER w
                             ELSE embedding END AS embedding)
                    FROM kept
                    WINDOW w AS (PARTITION BY vec_id // 13 ORDER BY vec_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND UNBOUNDED FOLLOWING))
                """
                final = "SELECT * FROM collided"
            full = final
            if dup_pct:
                full += (
                    f" UNION ALL {final}"
                    f" WHERE hash({key}, {seed + 2}) % 100 < {dup_pct}"
                )
            out = os.path.join(out_dir, f"{table}.parquet")
            con.execute(f"COPY (WITH {body} {full}) TO '{out}' (FORMAT PARQUET)")
            rows[table] = con.execute(
                f"SELECT count(*) FROM read_parquet('{out}')"
            ).fetchone()[0]
    finally:
        if own:
            con.close()
    return rows


def run_fuzz(
    spark,
    seed: int,
    *,
    base_dir: str = BASE_DEFAULT,
    names=None,
    dup_pct: int = 0,
    crush_rows: int = 3,
) -> list[tuple[str, str]]:
    """Build the seed's dataset and compare every (or the given) query
    pair on it; returns [(name, error)] for mismatches."""
    import __spark_entry__ as entrymod
    from tests.oracle_harness import assert_frames_match, run_duckdb

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = sorted(names or qs)
    # Perturbation params are part of the dir name: streaming queries
    # memoize their events-source copy BY PATH (_STREAM_SRC_MEMO), so
    # two datasets sharing a path (same pid+seed, different crush/dup)
    # would silently reuse a stale events copy (ADVICE r9).
    out_dir = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_fuzz_{os.getpid()}_{seed}_c{crush_rows}_d{dup_pct}",
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    rows = build_fuzz_dataset(
        base_dir, out_dir, seed, dup_pct=dup_pct, crush_rows=crush_rows
    )
    print(f"seed {seed}: " + " ".join(f"{t}={n}" for t, n in rows.items()))
    fails: list[tuple[str, str]] = []
    try:
        for name in names:
            try:
                assert_frames_match(
                    qs[name](spark, out_dir), run_duckdb(osql[name], out_dir), name
                )
            except Exception as ex:  # noqa: BLE001 — report and continue
                fails.append((name, str(ex)[:300]))
                print(f"FAIL seed={seed} {name}: {fails[-1][1]}")
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        # Each fuzz dataset dir is a distinct sf_dir, so any streaming
        # query run above left a never-freed mkdtemp events copy keyed
        # by out_dir in _STREAM_SRC_MEMO — exactly the /tmp
        # accumulation the memo exists to stop, re-created one copy
        # per seed per session (ADVICE r9). Evict and delete ours.
        from project_crypto_data_engineering_gcp_spark.plans import queries_relational as _qr

        for key in [k for k in _qr._STREAM_SRC_MEMO if k[1] == out_dir]:
            shutil.rmtree(_qr._STREAM_SRC_MEMO.pop(key), ignore_errors=True)
    return fails


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--seeds", type=int, nargs="+", default=[1, 2, 3])
    ap.add_argument("--base", default=BASE_DEFAULT)
    ap.add_argument("--queries", default=None, help="comma-separated subset")
    ap.add_argument(
        "--crush-rows", type=int, default=3, metavar="N",
        help="row count for the per-seed near-empty table (default 3;"
        " 0 = a fully EMPTY table — the harshest edge: empty scans,"
        " empty aggregates, every join unmatched). Changing it changes"
        " the dataset a seed denotes, so the pytest gate pins the"
        " default.",
    )
    ap.add_argument(
        "--dups", type=int, default=0, metavar="PCT",
        help="re-append PCT%% of rows verbatim (bag-semantics exploration,"
        " outside the unique-key contract — not part of the gate)",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    names = args.queries.split(",") if args.queries else None
    t0, all_fails = time.time(), []
    for seed in args.seeds:
        fails = run_fuzz(
            spark, seed, base_dir=args.base, names=names,
            dup_pct=args.dups, crush_rows=args.crush_rows,
        )
        all_fails.extend((seed, n, e) for n, e in fails)
    n_named = len(names) if names else "all"
    print(
        f"fuzzed {n_named} queries x {len(args.seeds)} seeds:"
        f" {len(all_fails)} mismatches, {round(time.time() - t0, 1)} s"
    )
    spark.stop()
    return 1 if all_fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
