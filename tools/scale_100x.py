#!/usr/bin/env python3
"""TWO-DECADE scaling curve for the flagship dedup/ANN/text shapes.

tools/scale_spotcheck.py measures one decade (sf0.1 -> 10x amplified).
This tool extends the same density-constant amplification to 100x
(500k documents, 200k embeddings — the sf10-equivalent corpus for the
document workload) and times the graded flagship queries at sf0.1, 10x,
and 100x, giving a log-log curve over two decades. A shape that is
secretly superlinear hides easily in one noisy decade; it cannot hide
in two.

Amplification is the spotcheck tool's exact scheme (word-tagged copies:
duplicate DENSITY and shingle-df skew constant, no artificial cross-copy
dups; embedding copies share IVF cells so cell populations scale
honestly). Copies are generated in DuckDB batches to bound memory.

Usage: python3 tools/scale_100x.py   (~15 min; prints one JSON line)
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = (
    # the graded candidate-generation dedup shapes (banded joins + caps)
    "dedup_minhash_lsh_capped",
    "mm_simhash_payload",
    # ANN serving shapes: cell-pruned and packed-scan
    "sim_ann_ivf_topk",
    "sim_binary_hamming_topk",
    # full-pass text scoring (~linear in token volume by design)
    "text_bm25_topk",
)


def amplify(src_dir: str, dst_dir: str, factor: int) -> None:
    import duckdb

    os.makedirs(dst_dir, exist_ok=True)
    con = duckdb.connect()
    docs = f"{src_dir}/documents.parquet"
    n_docs = con.execute(
        f"SELECT MAX(doc_id) + 1 FROM read_parquet('{docs}')"
    ).fetchone()[0]
    # batch the UNION ALL: one COPY per 10 copies, appended parquet parts
    part_dir = f"{dst_dir}/documents.parquet"
    if os.path.isdir(part_dir) or os.path.exists(part_dir):
        pass
    os.makedirs(part_dir, exist_ok=True)
    for lo in range(0, factor, 10):
        copies = " UNION ALL ".join(
            f"""SELECT doc_id + {c * n_docs} AS doc_id,
                   {'text' if c == 0 else
                    f"array_to_string(list_transform(string_split(text, ' '), w -> w || '~{c}'), ' ')"} AS text,
                   lang, source, n_chars
                FROM read_parquet('{docs}')"""
            for c in range(lo, min(lo + 10, factor))
        )
        con.execute(
            f"COPY ({copies}) TO '{part_dir}/part_{lo:04d}.parquet' (FORMAT PARQUET)"
        )

    emb = f"{src_dir}/embeddings.parquet"
    n_vec = con.execute(
        f"SELECT MAX(vec_id) + 1 FROM read_parquet('{emb}')"
    ).fetchone()[0]
    emb_dir = f"{dst_dir}/embeddings.parquet"
    os.makedirs(emb_dir, exist_ok=True)
    for lo in range(0, factor, 20):
        vcopies = " UNION ALL ".join(
            f"SELECT vec_id + {c * n_vec} AS vec_id, embedding, label "
            f"FROM read_parquet('{emb}')"
            for c in range(lo, min(lo + 20, factor))
        )
        con.execute(
            f"COPY ({vcopies}) TO '{emb_dir}/part_{lo:04d}.parquet' (FORMAT PARQUET)"
        )


def main() -> None:
    from project_crypto_data_engineering_gcp_spark.plans import all_queries
    from project_crypto_data_engineering_gcp_spark.session import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    amp10 = "/tmp/spark_graft_sf1_amplified"  # shared with scale_spotcheck
    amp100 = "/tmp/spark_graft_sf10_amplified"
    if not os.path.exists(f"{amp10}/embeddings.parquet"):
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        import scale_spotcheck

        scale_spotcheck.amplify(base, amp10)
    if not os.path.exists(f"{amp100}/embeddings.parquet"):
        amplify(base, amp100, 100)

    spark = get_spark("scale_100x")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    qs["q1_pricing_summary"].fn(spark, base).count()  # JVM/codegen warmup
    spark.range(32).mapInPandas(lambda it: it, schema="id long").count()

    out: dict[str, dict[str, float]] = {}
    for sf_dir, tag in ((base, "x1"), (amp10, "x10"), (amp100, "x100")):
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
        r["ratio_10"] = round(r["x10"] / r["x1"], 2) if r["x1"] else None
        r["ratio_100"] = round(r["x100"] / r["x10"], 2) if r["x10"] else None
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
