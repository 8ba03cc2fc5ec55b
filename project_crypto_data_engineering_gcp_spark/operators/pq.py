"""Product quantization: encode / ADC scoring / persisted codes index.

The memory-compressed ANN tier (reference: BASELINE.json similarity
north star; Jégou et al., "Product Quantization for Nearest Neighbor
Search", TPAMI 2011): vectors are split into M subspaces, each snapped
to its nearest of C deterministic codewords, so a vector stores as M
small ints. At query time each query precomputes an M x C partial-dot
lookup table (LUT); candidate scores are joins on the CODES — original
vectors are never read at serve time.

All arithmetic is deterministic (sequential folds, fixed-order partial
sums), so an answer served from the persisted codes is bit-identical to
the inline operator and to the SQL oracle — the property that keeps the
compressed tier differential-testable.

Scale: every frame here carries scalars (codes, partial dots); the only
array-bearing stage is encoding, a broadcast join against the M x C
codeword frame. ADC scoring cost is N x M x n_queries scalar rows —
the classic linear scan, shuffled only for the per-query top-k.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vectors import dot_prenorm, norm, normalized

CODES_SUBDIR = "codes"
CODEBOOK_SUBDIR = "_codebook"


def pq_subspaces(e: DataFrame, *, m: int, subdim: int) -> DataFrame:
    """(vec_id, nv) -> (vec_id, m, sub): each vector split into ``m``
    contiguous ``subdim``-wide sub-vectors."""
    return e.select(
        "vec_id",
        F.posexplode(
            F.array(*[F.slice("nv", i * subdim + 1, subdim) for i in range(m)])
        ).alias("m", "sub"),
    )


def pq_codebook(subs: DataFrame, *, n_codes: int) -> DataFrame:
    """Deterministic codebook: the sub-vectors of vec_id < ``n_codes``
    act as that subspace's codewords (no RNG, reproducible — the same
    seeding rule as the IVF centroids)."""
    return subs.filter(F.col("vec_id") < n_codes).select(
        "m", F.col("vec_id").alias("code"), F.col("sub").alias("cw")
    )


def pq_encode(subs: DataFrame, cb: DataFrame) -> DataFrame:
    """Snap every (vec_id, m) sub-vector to its nearest codeword by
    squared L2 (sequential fold; ties break on code ASC). Broadcast join
    against the M x C codebook — the corpus never shuffles."""
    sqdist = F.aggregate(
        F.zip_with("sub", "cw", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    wenc = Window.partitionBy("vec_id", "m").orderBy(F.asc("sqd"), F.asc("code"))
    return (
        subs.join(F.broadcast(cb), "m")
        .select("vec_id", "m", "code", sqdist.alias("sqd"))
        .withColumn("rk", F.row_number().over(wenc))
        .filter(F.col("rk") == 1)
        .select("vec_id", "m", "code")
    )


def pq_lut(qsubs: DataFrame, cb: DataFrame) -> DataFrame:
    """Per-query ADC lookup table: partial dot of every query sub-vector
    with every codeword of its subspace — n_queries x M x C rows."""
    return (
        qsubs.withColumnRenamed("vec_id", "qid")
        .join(F.broadcast(cb), "m")
        .select("qid", "m", "code", dot_prenorm("sub", "cw").alias("pdot"))
    )


def pq_adc_topk(
    codes: DataFrame,
    lut: DataFrame,
    *,
    m: int,
    k: int,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Approximate top-k: LUT-join on (m, code), then a FIXED-ORDER
    pivot sum of the ``m`` partial dots (p0+p1+...), never an
    order-dependent SUM — both engines add the same doubles in the same
    order, keeping the approximation bit-exact.

    ``candidates`` (qid, vec_id) gates the scan (the IVFPQ composition:
    only codes of vectors in the query's probed cells are scored). The
    gate join runs on vec_id BEFORE the LUT join, so pruned vectors'
    codes never fan out to n_queries rows; candidates is shuffle-joined,
    not broadcast — at scale it is n_queries x (n_probe/n_cells) x N."""
    if candidates is not None:
        scan = codes.join(candidates, "vec_id").join(
            F.broadcast(lut), ["qid", "m", "code"]
        )
    else:
        scan = codes.join(F.broadcast(lut), ["m", "code"])
    parts = (
        scan.groupBy("qid", "vec_id")
        .agg(
            *[
                F.max(F.when(F.col("m") == i, F.col("pdot"))).alias(f"p{i}")
                for i in range(m)
            ]
        )
    )
    score = sum((F.col(f"p{i}") for i in range(1, m)), F.col("p0"))
    wq = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    return (
        parts.select("qid", "vec_id", score.alias("score"))
        .withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(
            "qid", "vec_id", F.round("score", 6).alias("approx_score"), "rank"
        )
    )


def normalized_vectors(emb: DataFrame) -> DataFrame:
    """(vec_id, embedding) -> (vec_id, nv): unit-normalized doubles, the
    shared input convention of the PQ pipeline."""
    return emb.select(
        "vec_id", normalized("embedding", norm("embedding")).alias("nv")
    )


def build_pq_index(
    emb: DataFrame, path: str, *, m: int, subdim: int, n_codes: int
) -> None:
    """One encode pass -> persisted codes (M small ints per vector) plus
    the M x C codebook side table. The codes table is the 100 TB serving
    artifact: ~(m x 8 bytes)/vector here vs dim x 4 raw — and queries
    read ONLY it plus the codebook."""
    subs = pq_subspaces(normalized_vectors(emb), m=m, subdim=subdim).cache()
    cb = pq_codebook(subs, n_codes=n_codes)
    cb.write.mode("overwrite").parquet(os.path.join(path, CODEBOOK_SUBDIR))
    pq_encode(subs, cb).write.mode("overwrite").parquet(
        os.path.join(path, CODES_SUBDIR)
    )
    subs.unpersist()


def query_pq_index(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    *,
    m: int,
    subdim: int,
    k: int,
) -> DataFrame:
    """Top-k from the persisted codes for a (vec_id, embedding) query
    frame. Touches only the codes + codebook tables — never the corpus
    embeddings (plan-asserted in tests)."""
    cb = spark.read.parquet(os.path.join(path, CODEBOOK_SUBDIR))
    codes = spark.read.parquet(os.path.join(path, CODES_SUBDIR))
    qsubs = pq_subspaces(normalized_vectors(queries), m=m, subdim=subdim)
    return pq_adc_topk(codes, pq_lut(qsubs, cb), m=m, k=k)
