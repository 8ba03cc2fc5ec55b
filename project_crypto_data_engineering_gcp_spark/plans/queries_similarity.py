"""Similarity-search corpus queries over the ``embeddings`` table.

ANN over an ``array<float>`` embedding column (BASELINE.json north star):
brute-force cosine as the exact baseline, sign-bit LSH bucketing as the
scale path. Cosine math uses the bit-deterministic fold from
functions/vectors.py so results hash-match the DuckDB oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.vectors import cosine, cosine_sql, norm, norm_sql
from ..sources.tables import load_table
from .corpus import corpus_query

COSINE_PAIR_THRESHOLD = 0.3
TOPK_QUERIES = 20  # vec_id < 20 are the query vectors
TOPK_K = 5
# sign bits of these (1-based) dimensions form the LSH bucket id
LSH_DIMS = (1, 9, 17, 25)


@corpus_query(
    "sim_embedding_norms",
    oracle=f"""
    SELECT vec_id, label,
           len(embedding) AS dim,
           ROUND({norm_sql("embedding")}, 6) AS l2_norm
    FROM embeddings
    """,
)
def sim_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding hygiene scan: dimensionality + L2 norm per vector (the
    pre-normalization step of any ANN pipeline)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        "label",
        F.size("embedding").alias("dim"),
        F.round(norm("embedding"), 6).alias("l2_norm"),
    )


@corpus_query(
    "sim_cosine_pairs",
    oracle=f"""
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           a.label AS label_a, b.label AS label_b,
           ROUND({cosine_sql("a.embedding", "b.embedding")}, 6) AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {cosine_sql("a.embedding", "b.embedding")} >= {COSINE_PAIR_THRESHOLD}
    """,
    bench=True,
)
def sim_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine similarity join: all pairs above
    {COSINE_PAIR_THRESHOLD}. The exact baseline ANN answers are measured
    against. Scale path: broadcast the smaller side and block the larger
    (O(n*m/p) per executor); beyond memory, switch to the LSH-bucketed
    variant (sim_ann_lsh_topk)."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.alias("a")
    b = emb.alias("b")
    cos = cosine(F.col("a.embedding"), F.col("b.embedding"))
    return (
        a.join(F.broadcast(b), F.col("a.vec_id") < F.col("b.vec_id"))
        .filter(cos >= COSINE_PAIR_THRESHOLD)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
            F.round(cos, 6).alias("cos_sim"),
        )
    )


@corpus_query(
    "sim_topk_neighbors",
    oracle=f"""
    SELECT vec_a, vec_b, cos_sim, rk FROM (
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
               ROUND({cosine_sql("q.embedding", "c.embedding")}, 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({cosine_sql("q.embedding", "c.embedding")}, 6) DESC,
                            c.vec_id
               ) AS rk
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id < {TOPK_QUERIES}
    ) t WHERE rk <= {TOPK_K}
    """,
)
def sim_topk_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force top-{TOPK_K} nearest neighbors for the first
    {TOPK_QUERIES} query vectors. Ranking is on the ROUNDED cosine with
    vec_id tie-break, making the cut deterministic cross-engine even at
    float ulp differences. Scale: query side is broadcast; candidate side
    streams through executors partition-parallel."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < TOPK_QUERIES).alias("q")
    c = emb.alias("c")
    cos_r = F.round(cosine(F.col("q.embedding"), F.col("c.embedding")), 6)
    w = Window.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), F.col("vec_b"))
    return (
        c.join(F.broadcast(q), F.col("c.vec_id") != F.col("q.vec_id"))
        .select(
            F.col("q.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            cos_r.alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_K)
    )


def _lsh_bucket_sql(tbl: str) -> str:
    return " + ".join(
        f"(CASE WHEN {tbl}.embedding[{d}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i, d in enumerate(LSH_DIMS)
    )


@corpus_query(
    "sim_ann_lsh_topk",
    oracle=f"""
    WITH e AS (
        SELECT vec_id, embedding, {_lsh_bucket_sql("embeddings")} AS bucket
        FROM embeddings
    )
    SELECT vec_a, vec_b, bucket, cos_sim, rk FROM (
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b, q.bucket AS bucket,
               ROUND({cosine_sql("q.embedding", "c.embedding")}, 6) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY ROUND({cosine_sql("q.embedding", "c.embedding")}, 6) DESC,
                            c.vec_id
               ) AS rk
        FROM e q JOIN e c ON q.bucket = c.bucket AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {TOPK_QUERIES}
    ) t WHERE rk <= {TOPK_K}
    """,
)
def sim_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-{TOPK_K} neighbors via sign-bit LSH: vectors bucket
    by the sign pattern of {len(LSH_DIMS)} fixed dimensions (a degenerate
    but deterministic random-hyperplane LSH); candidates are same-bucket
    only. The scale path: the pairwise join is gated on bucket equality, so
    cost drops by ~2^bits vs brute force, trading recall (measured against
    sim_topk_neighbors)."""
    emb = load_table(spark, sf_dir, "embeddings")
    bucket = None
    for i, d in enumerate(LSH_DIMS):
        term = F.when(F.element_at("embedding", d) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    e = emb.select("vec_id", "embedding", bucket.alias("bucket"))
    q = e.filter(F.col("vec_id") < TOPK_QUERIES).alias("q")
    c = e.alias("c")
    cos_r = F.round(cosine(F.col("q.embedding"), F.col("c.embedding")), 6)
    w = Window.partitionBy("vec_a").orderBy(F.col("cos_sim").desc(), F.col("vec_b"))
    return (
        c.join(
            F.broadcast(q),
            (F.col("q.bucket") == F.col("c.bucket"))
            & (F.col("c.vec_id") != F.col("q.vec_id")),
        )
        .select(
            F.col("q.vec_id").alias("vec_a"),
            F.col("c.vec_id").alias("vec_b"),
            F.col("q.bucket").alias("bucket"),
            cos_r.alias("cos_sim"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOPK_K)
    )
