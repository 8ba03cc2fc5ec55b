"""Training-data curation queries over the ``documents`` table.

The reproducibility layer of an LLM data pipeline: deterministic
hash-based splits (the same document lands in the same split on every
run, on any cluster size — no RNG, no seed-ordering dependence),
per-group quota selection, and train->test decontamination. All three
are pure built-in-expression plans (md5 + window + joins): JVM-side,
codegen'd, shuffle only on the declared keys, so they run unchanged from
the 500-row fixture to a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import md5_long, md5_long_sql
from ..functions.text import canonical_text, canonical_text_sql
from ..sources.tables import load_table
from .corpus import corpus_query

SPLIT_SALT = "split-v1:"
TRAIN_PCT, VAL_PCT = 90, 5  # remainder = test
QUOTA_PER_LANG = 15


def _split_bucket() -> F.Column:
    return md5_long(F.col("doc_id").cast("string"), SPLIT_SALT) % 100


def _split_bucket_sql() -> str:
    return f"{md5_long_sql('CAST(doc_id AS VARCHAR)', SPLIT_SALT)} % 100"


def _split_label(bucket: F.Column) -> F.Column:
    return (
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


def _split_label_sql(bucket: str) -> str:
    return (
        f"CASE WHEN {bucket} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {bucket} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )


@corpus_query(
    "curate_hash_split",
    oracle=f"""
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
        SELECT lang, n_chars,
               {_split_label_sql(f'({_split_bucket_sql()})')} AS split
        FROM documents
    ) assigned
    GROUP BY lang, split
    """,
)
def curate_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic {TRAIN_PCT}/{VAL_PCT}/rest train/val/test split:
    each document's salted 60-bit md5 mod 100 picks its bucket, so
    membership is a pure function of doc_id — stable across runs,
    repartitions, and engines (no sampling RNG). Rolled up to per
    (lang, split) doc and char counts, the numbers a pipeline audits
    before training."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "n_chars",
            _split_label(_split_bucket()).alias("split"),
        )
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


@corpus_query(
    "curate_quota_per_lang",
    oracle=f"""
    SELECT doc_id, lang, n_chars, rk FROM (
        SELECT doc_id, lang, n_chars,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY n_chars DESC, doc_id
               ) AS rk
        FROM documents
    ) ranked WHERE rk <= {QUOTA_PER_LANG}
    """,
)
def curate_quota_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quota selection: the {QUOTA_PER_LANG} longest
    documents of each language (doc_id tiebreak), the standard
    rebalancing step that stops a high-resource language from swamping
    the mixture. One window shuffle on lang; at scale, rank-pushdown via
    a per-partition pre-top-k would bound the shuffle input."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        docs.select("doc_id", "lang", "n_chars")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= QUOTA_PER_LANG)
    )


@corpus_query(
    "curate_decontaminate",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id,
               {md5_long_sql(canonical_text_sql("text"))} AS fingerprint,
               {_split_label_sql(f'({_split_bucket_sql()})')} AS split
        FROM documents
    )
    SELECT tr.doc_id AS train_doc, te.doc_id AS test_doc, tr.fingerprint
    FROM assigned tr
    JOIN assigned te
      ON tr.fingerprint = te.fingerprint
     AND tr.split = 'train' AND te.split = 'test'
    """,
)
def curate_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train->test contamination scan: train documents whose
    order-insensitive content fingerprint also appears in the test
    split — the leakage a benchmark-honest pipeline must remove before
    training. One fingerprint+split pass over the corpus, then a
    hash join on the 60-bit fingerprint (test side is a ~5% slice:
    broadcastable at any realistic corpus size)."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        md5_long(canonical_text("text")).alias("fingerprint"),
        _split_label(_split_bucket()).alias("split"),
    )
    train = assigned.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "fingerprint"
    )
    test = assigned.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc"),
        F.col("fingerprint").alias("fp_test"),
    )
    return (
        train.join(F.broadcast(test), train.fingerprint == test.fp_test)
        .select("train_doc", "test_doc", "fingerprint")
    )
