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
from ..functions.text import (
    canonical_text,
    canonical_text_sql,
    shingles_sql,
    stopword_count,
    stopword_count_sql,
    tokens,
    tokens_sql,
)
from ..sources.tables import load_table
from .corpus import corpus_query
from .queries_text import STOPWORDS

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


PACK_CAPACITY = 512  # tokens per packed context window


@corpus_query(
    "curate_pack_sequences",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang, len({tokens_sql("text")}) AS n_tokens
        FROM documents
    ),
    cum AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (
                   PARTITION BY lang ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) - n_tokens AS cum_before
        FROM sized
    )
    SELECT doc_id, lang, n_tokens,
           CAST(cum_before // {PACK_CAPACITY} AS BIGINT) AS bin_id
    FROM cum
    """,
)
def curate_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stride packing of documents into {PACK_CAPACITY}-token context
    windows: per language, docs in doc_id order accumulate a running
    token count and land in bin floor(tokens_before / capacity) — the
    deterministic fixed-stride packing used to batch pretraining data
    (docs may straddle a boundary; true first-fit packing is inherently
    sequential and not a relational plan). One window shuffle on lang;
    integer running sums, so no float drift."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sized = docs.select(
        "doc_id", "lang", F.size(tokens("text")).alias("n_tokens")
    )
    return sized.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(
            (F.sum("n_tokens").over(w) - F.col("n_tokens")) / PACK_CAPACITY
        ).alias("bin_id"),
    )


QUALITY_CUT_PCT = 0.25  # drop the bottom quartile per language


def _quality_sql() -> str:
    return f"""ROUND(
        0.5 * (CAST(len(list_distinct({tokens_sql("text")})) AS DOUBLE)
               / len({tokens_sql("text")}))
        + 0.3 * (1 - CAST({stopword_count_sql("text", STOPWORDS)} AS DOUBLE)
                     / len({tokens_sql("text")}))
        + 0.2 * least(1.0, len({tokens_sql("text")}) / 64.0), 6)"""


def _quality_col() -> F.Column:
    n_tokens = F.size(tokens("text"))
    distinct_ratio = F.size(F.array_distinct(tokens("text"))).cast("double") / n_tokens
    stop_ratio = stopword_count("text", STOPWORDS).cast("double") / n_tokens
    return F.round(
        0.5 * distinct_ratio
        + 0.3 * (F.lit(1) - stop_ratio)
        + 0.2 * F.least(F.lit(1.0), n_tokens / F.lit(64.0)),
        6,
    )


@corpus_query(
    "curate_quality_cut",
    oracle=f"""
    SELECT doc_id, lang, quality, ROUND(pr, 6) AS pctile FROM (
        SELECT doc_id, lang, quality,
               PERCENT_RANK() OVER (
                   PARTITION BY lang ORDER BY quality, doc_id
               ) AS pr
        FROM (SELECT doc_id, lang, {_quality_sql()} AS quality FROM documents) s
    ) ranked
    WHERE pr >= {QUALITY_CUT_PCT}
    """,
)
def curate_quality_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-percentile filter: drop each language's
    bottom quartile by the heuristic quality score (ties broken by
    doc_id, so the percentile is a pure function of the data). The
    per-language normalization is what keeps a verbose language's docs
    from outranking a terse one's — cutting on the raw global score
    would empty whole languages. percent_rank is (rank-1)/(n-1) on
    integer ranks: bit-identical across engines."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("quality", "doc_id")
    return (
        docs.select("doc_id", "lang", _quality_col().alias("quality"))
        .withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= QUALITY_CUT_PCT)
        .select("doc_id", "lang", "quality", F.round("pr", 6).alias("pctile"))
    )


MIX_TAKE = 200  # schedule length of the mixture prefix


@corpus_query(
    "curate_mix_sources",
    oracle=f"""
    WITH weighted AS (
        SELECT doc_id, source,
               CASE WHEN CAST(SUBSTR(source, 4) AS INT) % 2 = 1
                    THEN 3.0 ELSE 1.0 END AS weight,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    )
    SELECT doc_id, source, rn, ROUND(rn / weight, 6) AS position
    FROM weighted
    ORDER BY position, source, doc_id
    LIMIT {MIX_TAKE}
    """,
)
def curate_mix_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source interleaving: each source's docs get positions
    rn/weight (odd-numbered sources weighted 3x — the up-sampled
    domains), and the training schedule is the position-ordered prefix —
    deterministic data mixing without RNG. The prefix comes out of
    TakeOrderedAndProject (per-task heaps, no global sort); at 100 TB
    the position column is also a range-partitioning key, so the full
    schedule writes out sorted without one reducer seeing everything."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    weight = F.when(
        F.substring("source", 4, 10).cast("int") % 2 == 1, F.lit(3.0)
    ).otherwise(F.lit(1.0))
    return (
        docs.select("doc_id", "source")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("position", F.round(F.col("rn") / weight, 6))
        .orderBy("position", "source", "doc_id")
        .limit(MIX_TAKE)
        .select("doc_id", "source", "rn", "position")
    )


NGRAM_DECON_K = 3  # n-gram width; production eval-decontamination uses ~13
                   # on full-length documents — the fixture docs are short,
                   # so 3 keeps the query's collision structure non-trivial


@corpus_query(
    "curate_ngram_decontaminate",
    oracle=f"""
    WITH labeled AS (
        SELECT doc_id, text,
               {_split_label_sql(f'({_split_bucket_sql()})')} AS split
        FROM documents
    ),
    sh AS (
        SELECT doc_id, split,
               unnest({shingles_sql("text", NGRAM_DECON_K)}) AS s
        FROM labeled
    )
    SELECT tr.doc_id AS train_doc,
           CAST(COUNT(DISTINCT tr.s) AS BIGINT) AS n_shared_ngrams,
           CAST(COUNT(DISTINCT te.doc_id) AS BIGINT) AS n_test_docs,
           MIN(te.doc_id) AS example_test_doc
    FROM sh tr
    JOIN sh te ON te.s = tr.s AND tr.split = 'train' AND te.split = 'test'
    GROUP BY tr.doc_id
    """,
)
def curate_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram-overlap decontamination — the standard LLM-practice
    contamination test (exact fingerprint equality misses paraphrased /
    partially-copied eval items; any shared {NGRAM_DECON_K}-gram flags
    the train doc for review). Per flagged train doc: how many distinct
    n-grams leak, into how many test docs, and an example.

    Scale shape: the shingle explode is linear; the test-side shingle
    set is a ~5% slice of the corpus and ships as a BROADCAST to the
    train-side inverted index — no shuffle of the train corpus at all;
    the groupBy shuffles only (train_doc, shingle) survivors. The same
    stop-shingle df-cap as dedup_ngram_jaccard applies before the join
    at production scale."""
    from ..functions.text import shingles_of_tokens

    docs = load_table(spark, sf_dir, "documents")
    labeled = docs.select(
        "doc_id",
        tokens("text").alias("__toks"),
        _split_label(_split_bucket()).alias("split"),
    ).select(
        "doc_id",
        "split",
        F.explode(shingles_of_tokens("__toks", NGRAM_DECON_K)).alias("s"),
    )
    train = labeled.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), "s"
    )
    test = labeled.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc"), F.col("s").alias("s_test")
    )
    return (
        train.join(F.broadcast(test), F.col("s") == F.col("s_test"))
        .groupBy("train_doc")
        .agg(
            F.countDistinct("s").alias("n_shared_ngrams"),
            F.countDistinct("test_doc").alias("n_test_docs"),
            F.min("test_doc").alias("example_test_doc"),
        )
    )


LENGTH_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048, 4096)


def _bucket_case_sql(n: str) -> str:
    whens = " ".join(
        f"WHEN {n} <= {b} THEN {b}" for b in LENGTH_BUCKETS
    )
    return f"CASE {whens} ELSE {LENGTH_BUCKETS[-1] * 2} END"


def _bucket_case(n: F.Column) -> F.Column:
    expr = F.lit(LENGTH_BUCKETS[-1] * 2)
    for b in reversed(LENGTH_BUCKETS):
        expr = F.when(n <= b, F.lit(b)).otherwise(expr)
    return expr


@corpus_query(
    "curate_length_buckets",
    oracle=f"""
    WITH sized AS (
        SELECT doc_id, lang,
               len({tokens_sql("text")}) AS n_tokens
        FROM documents
    ), bucketed AS (
        SELECT lang, n_tokens,
               {_bucket_case_sql("n_tokens")} AS bucket
        FROM sized
    )
    SELECT lang, bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(bucket - n_tokens) AS DOUBLE)
               / SUM(bucket) AS pad_waste_ratio
    FROM bucketed
    GROUP BY lang, bucket
    """,
)
def curate_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-length bucketing for batch shaping: documents assigned to a
    fixed power-of-2 capacity menu (a CASE chain — deliberately NOT
    log2(); fixed boundaries are what production batchers use and a libm
    call would break cross-engine bit parity), with per-(lang, bucket)
    volume and the padding-waste ratio the batcher would pay. The waste
    ratio is one IEEE division of two exact integer sums — bit parity
    without rounding. Scan-stage expression work + one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang", F.size(tokens("text")).alias("n_tokens")
    ).withColumn("bucket", _bucket_case(F.col("n_tokens")))
    return sized.groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        (
            F.sum(F.col("bucket") - F.col("n_tokens")).cast("double")
            / F.sum("bucket")
        ).alias("pad_waste_ratio"),
    )


# per-source sampling rates (the mix recipe's execution knob): sources
# ending in an even digit downweighted to 30%, odd kept at 100%
SAMPLE_RATE_EVEN, SAMPLE_RATE_ODD = 0.30, 1.00
SAMPLE_SALT = "sample-v1:"
SAMPLE_MOD = 1_000_000


def _rate_col() -> F.Column:
    last = F.substring("source", -1, 1).cast("int")
    return F.when(last % 2 == 0, F.lit(SAMPLE_RATE_EVEN)).otherwise(
        F.lit(SAMPLE_RATE_ODD)
    )


def _rate_sql() -> str:
    return (
        f"CASE WHEN CAST(substr(source, -1, 1) AS INT) % 2 = 0 "
        f"THEN {SAMPLE_RATE_EVEN} ELSE {SAMPLE_RATE_ODD} END"
    )


@corpus_query(
    "curate_sample_rates",
    oracle=f"""
    WITH sampled AS (
        SELECT doc_id, source,
               {md5_long_sql("CAST(doc_id AS VARCHAR)", SAMPLE_SALT)}
                   % {SAMPLE_MOD} AS draw,
               {_rate_sql()} AS rate
        FROM documents
    )
    SELECT source,
           COUNT(*) AS n_total,
           COUNT(*) FILTER (draw < rate * {SAMPLE_MOD}) AS n_kept,
           ANY_VALUE(rate) AS rate
    FROM sampled
    GROUP BY source
    """,
)
def curate_sample_rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source rate sampling — executing a data-mix
    recipe (downweight noisy corpora, keep clean ones) WITHOUT RNG:
    membership is salted-md5(doc_id) mod 1e6 < rate*1e6, a pure function
    of the document id, so the same doc is kept on every run, any
    cluster size, either engine — and rates can later be RAISED without
    resampling the already-kept set (hash-threshold monotonicity: the
    kept set at 30% is a subset of the kept set at 60%). Output audits
    kept/total per source against its configured rate."""
    docs = load_table(spark, sf_dir, "documents")
    draw = md5_long(F.col("doc_id").cast("string"), SAMPLE_SALT) % SAMPLE_MOD
    sampled = docs.select(
        "source",
        draw.alias("draw"),
        _rate_col().alias("rate"),
    )
    return sampled.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(F.col("draw") < F.col("rate") * SAMPLE_MOD, 1)).alias(
            "n_kept"
        ),
        F.any_value("rate").alias("rate"),
    )


CHUNK_SIZE, CHUNK_STRIDE = 64, 48  # tokens per chunk / stride (16 overlap)


@corpus_query(
    "curate_chunk_overlap",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {tokens_sql("text")} AS t FROM documents
    ), starts AS (
        SELECT doc_id, t,
               unnest(range(1, greatest(len(t) - {CHUNK_SIZE}, 0)
                               + {CHUNK_STRIDE}, {CHUNK_STRIDE})) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) / {CHUNK_STRIDE} AS INT) AS chunk_idx,
           array_to_string(list_slice(t, s, s + {CHUNK_SIZE} - 1), ' ')
               AS chunk_text,
           least(CAST(len(t) AS BIGINT) - s + 1, {CHUNK_SIZE}) AS n_tokens
    FROM starts
    WHERE s <= len(t)
    """,
)
def curate_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping context-window chunking (RAG / long-doc training
    prep): each document splits into {CHUNK_SIZE}-token chunks with
    stride {CHUNK_STRIDE} ({CHUNK_SIZE - CHUNK_STRIDE}-token overlap so
    no boundary context is lost). Chunk starts come from an arithmetic
    sequence (scan-stage expression), the slice+join is linear in output
    size, and chunk_idx is derivable from the start offset — fully
    deterministic, no window function needed at all."""
    docs = load_table(spark, sf_dir, "documents")
    t = tokens("text")
    starts = F.expr(
        f"sequence(1, greatest(size(split(text, ' ')) - {CHUNK_SIZE}, 0)"
        f" + {CHUNK_STRIDE} - 1, {CHUNK_STRIDE})"
    )
    exploded = docs.select(
        "doc_id",
        t.alias("t"),
        F.explode(starts).alias("s"),
    ).filter(F.col("s") <= F.size("t"))
    return exploded.select(
        "doc_id",
        (((F.col("s") - 1) / CHUNK_STRIDE).cast("int")).alias("chunk_idx"),
        F.concat_ws(" ", F.slice("t", F.col("s"), CHUNK_SIZE)).alias("chunk_text"),
        F.least(
            F.size("t").cast("long") - F.col("s") + 1, F.lit(CHUNK_SIZE).cast("long")
        ).alias("n_tokens"),
    )


TEMP_SALT = "tempmix-v1:"   # decorrelated from SAMPLE_SALT's draws
TEMP_W_SCALE = 1000         # fixed-point scale for sqrt(n) source weights


@corpus_query(
    "curate_temperature_mix",
    oracle=f"""
    WITH s AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(FLOOR(SQRT(COUNT(*)) * {TEMP_W_SCALE}) AS BIGINT)
                   AS weight_fp
        FROM documents GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(weight_fp) AS BIGINT) AS w_sum,
               CAST(SUM(n_total) AS BIGINT) // 2 AS budget
        FROM s
    ),
    q AS (
        SELECT source, n_total, weight_fp,
               (budget * weight_fp) // w_sum AS quota
        FROM s, tot
    ),
    k AS (
        SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_kept
        FROM documents d JOIN q ON d.source = q.source
        WHERE q.quota >= q.n_total
           OR ({md5_long_sql("CAST(d.doc_id AS VARCHAR)", TEMP_SALT)}
               % {SAMPLE_MOD}) * q.n_total < q.quota * {SAMPLE_MOD}
        GROUP BY d.source
    )
    SELECT q.source, q.n_total, q.weight_fp, q.quota,
           COALESCE(k.n_kept, 0) AS n_kept
    FROM q LEFT JOIN k ON k.source = q.source
    """,
)
def curate_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): each source's share
    of a half-corpus training budget is proportional to sqrt(n_source) —
    the multilingual/domain re-balancing rule (keep-rate ~ n^(alpha-1),
    so small sources are up-weighted relative to their raw share, large
    ones down-weighted) — executed as deterministic hash-threshold
    sampling, no RNG.

    Every quantity is integer fixed-point so the audit is value-exact in
    both engines AND on any cluster size: weights are
    floor(sqrt(n)*{TEMP_W_SCALE}) (sqrt is IEEE-correctly-rounded, floor
    pins the one inexact step), quotas are integer-ratio division of the
    budget, and membership is the integer cross-multiplication
    draw * n < quota * {SAMPLE_MOD} — the same md5-threshold scheme as
    curate_sample_rates (monotone: raising a quota only ADDS documents).
    Headroom: budget*weight and draw*n stay < 2^63 out to ~1e9 docs per
    source.

    Scale: one groupBy for source stats, a 1-row total broadcast, a
    broadcast join of the (tiny) per-source quota table back onto the
    corpus, one more groupBy to audit kept counts. The kept SET itself
    (not materialized here) is the filter predicate applied at scan time."""
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.floor(F.sqrt(F.count(F.lit(1))) * TEMP_W_SCALE)
        .cast("long")
        .alias("weight_fp"),
    )
    tot = s.agg(
        F.sum("weight_fp").alias("w_sum"),
        F.expr("sum(n_total) div 2").alias("budget"),
    )
    q = (
        s.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_total",
            "weight_fp",
            F.expr("(budget * weight_fp) div w_sum").alias("quota"),
        )
    )
    draw = md5_long(F.col("doc_id").cast("string"), TEMP_SALT) % SAMPLE_MOD
    kept = (
        docs.select("source", draw.alias("draw"))
        .join(F.broadcast(q), "source")
        .filter(
            (F.col("quota") >= F.col("n_total"))
            | (F.col("draw") * F.col("n_total") < F.col("quota") * SAMPLE_MOD)
        )
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        q.join(kept, "source", "left")
        .select(
            "source",
            "n_total",
            "weight_fp",
            "quota",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
        )
    )


SHUFFLE_SALT = "shuffle-v1:"
N_SHARDS = 8


@corpus_query(
    "curate_shuffle_shards",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               {md5_long_sql("CAST(doc_id AS VARCHAR)", SHUFFLE_SALT)} AS hv
        FROM documents
    )
    SELECT doc_id, hv % {N_SHARDS} AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY hv % {N_SHARDS} ORDER BY hv, doc_id
           ) AS BIGINT) AS pos
    FROM h
    """,
)
def curate_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle -> shard assignment: the LAST step of
    every training-data pipeline (decorrelate document order before the
    loader streams shards sequentially). Order is md5(salt||doc_id) — a
    reproducible permutation: same docs, same salt, same shard layout on
    any cluster, any run, either engine; bump the salt to reshuffle.

    Scale: shard = hash mod {N_SHARDS} needs no shuffle at all (pure
    projection); the within-shard position is one hash-partitioned
    window — the exact plan of the real write
    (``repartition(shard).sortWithinPartitions(hv)`` + per-shard files).
    Shard count scales with corpus size so a shard stays
    executor-sized; the permutation quality is the hash's, with no
    global sort anywhere."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        md5_long(F.col("doc_id").cast("string"), SHUFFLE_SALT).alias("hv"),
    )
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return (
        h.withColumn("shard", F.col("hv") % N_SHARDS)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


ZORDER_BITS = 16          # bits interleaved per dimension
ZORDER_BUCKET_SHIFT = 18  # zkey div 2^18 -> "file" buckets


def _zorder_sql(x: str, y: str, *, spark_dialect: bool) -> str:
    """Bit-interleave two {ZORDER_BITS}-bit ints into a Morton (Z-order)
    key — pure integer bit ops, identical semantics in both engines
    (only the shift syntax differs: Spark functions vs DuckDB operators)."""
    if spark_dialect:
        shl = "shiftleft({v}, {n})"
        shr = "shiftright({v}, {n})"
    else:
        shl = "(({v}) << {n})"
        shr = "(({v}) >> {n})"
    terms = []
    for i in range(ZORDER_BITS):
        xbit = f"({shr.format(v=x, n=i)} & 1)"
        ybit = f"({shr.format(v=y, n=i)} & 1)"
        terms.append(shl.format(v=xbit, n=2 * i))
        terms.append(shl.format(v=ybit, n=2 * i + 1))
    return " + ".join(terms)


def _zorder_oracle() -> str:
    x = f"(o_custkey % {1 << ZORDER_BITS})"
    y = f"(CAST(datediff('day', DATE '1992-01-01', o_orderdate) AS BIGINT)"\
        f" % {1 << ZORDER_BITS})"
    z = _zorder_sql(x, y, spark_dialect=False)
    return f"""
    WITH keyed AS (
        SELECT o_custkey AS x_raw,
               CAST(datediff('day', DATE '1992-01-01', o_orderdate)
                    AS BIGINT) AS y_raw,
               ({z}) >> {ZORDER_BUCKET_SHIFT} AS bucket
        FROM orders
    )
    SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
           MIN(x_raw) AS x_min, MAX(x_raw) AS x_max,
           MIN(y_raw) AS y_min, MAX(y_raw) AS y_max
    FROM keyed GROUP BY bucket
    """


@corpus_query("curate_zorder_layout", oracle=_zorder_oracle())
def curate_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering layout for multi-dimension data
    skipping — the OPTIMIZE ZORDER technique: interleaving the bits of
    (customer, order-day) makes lexicographic key ranges approximate 2-D
    tiles, so every "file" bucket gets a TIGHT min/max zonemap on BOTH
    columns and a scan filtered on either one prunes most buckets. A
    plain sort by customer gives tight customer ranges but each file
    spans the full date range (and vice versa) — this query OUTPUTS the
    per-bucket zonemaps, so the tightness claim is a graded result, not
    prose (see tests/test_graph.py for the quantified comparison vs a
    single-dimension sort).

    The key is {2 * ZORDER_BITS} bits of pure integer bit arithmetic
    (shift/and/add — exactly reproducible in any engine); at 100 TB the
    bucket id is the range-partitioning/sort key of the physical
    rewrite, and zonemaps land in the parquet footers for free."""
    orders = load_table(spark, sf_dir, "orders")
    x = f"(o_custkey % {1 << ZORDER_BITS})"
    y = f"(CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)"\
        f" % {1 << ZORDER_BITS})"
    z = _zorder_sql(x, y, spark_dialect=True)
    keyed = orders.select(
        F.col("o_custkey").alias("x_raw"),
        F.expr("CAST(datediff(o_orderdate, DATE '1992-01-01') AS BIGINT)")
        .alias("y_raw"),
        F.expr(f"shiftright({z}, {ZORDER_BUCKET_SHIFT})").alias("bucket"),
    )
    return keyed.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("x_raw").alias("x_min"),
        F.max("x_raw").alias("x_max"),
        F.min("y_raw").alias("y_min"),
        F.max("y_raw").alias("y_max"),
    )


NEG_SALT = "negpair-v1:"


@corpus_query(
    "curate_contrastive_pairs",
    oracle=f"""
    WITH h AS (
        SELECT doc_id,
               {md5_long_sql("CAST(doc_id AS VARCHAR)", NEG_SALT)} AS hv
        FROM documents
    ),
    sharded AS (
        SELECT doc_id, hv, hv % {N_SHARDS} AS shard FROM h
    )
    SELECT doc_id,
           LEAD(doc_id) OVER (PARTITION BY shard ORDER BY hv, doc_id)
               AS negative_doc_id,
           shard
    FROM sharded
    """,
)
def curate_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    document is paired with the NEXT document in a salted-md5 permutation
    of its hash shard — a uniform-random-looking negative that is a pure
    function of (doc_id, salt): reproducible on any cluster, any run,
    either engine, and re-drawable by bumping the salt (epoch-indexed
    salts give fresh negatives per epoch with zero RNG state).

    Scale: the permutation window is PER SHARD (hash-partitioned, the
    curate_shuffle_shards layout), so no global sort and no unbounded
    partition; the last doc of each shard surfaces with a NULL negative
    (callers drop or wrap it — kept here so the contract is visible)."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        md5_long(F.col("doc_id").cast("string"), NEG_SALT).alias("hv"),
    ).withColumn("shard", F.col("hv") % N_SHARDS)
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        F.lead("doc_id").over(w).alias("negative_doc_id"),
        "shard",
    )


@corpus_query(
    "curate_pack_offsets",
    oracle=f"""
    WITH h AS (
        SELECT doc_id, n_chars,
               {md5_long_sql("CAST(doc_id AS VARCHAR)", SHUFFLE_SALT)} AS hv
        FROM documents
    ),
    sharded AS (
        SELECT doc_id, n_chars, hv, hv % {N_SHARDS} AS shard FROM h
    )
    SELECT doc_id, shard,
           CAST(COALESCE(SUM(n_chars + 1) OVER (
               PARTITION BY shard ORDER BY hv, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) AS BIGINT) AS byte_offset,
           CAST(n_chars + 1 AS BIGINT) AS byte_len
    FROM sharded
    """,
)
def curate_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The loader MANIFEST for concatenated shard files: every document's
    byte offset and length inside its shard, were the shard written as
    newline-joined text in the deterministic shuffle order
    (curate_shuffle_shards' md5 permutation — the two queries share the
    salt and shard formula verbatim, so this manifest indexes exactly
    that layout). Offsets are an exclusive prefix sum of (n_chars + 1)
    per shard — one hash-partitioned window over the same partitioning
    the shard write itself uses, no global sort. With the manifest, a
    training loader random-accesses any document in O(1) seeks without
    a parquet runtime."""
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        "n_chars",
        md5_long(F.col("doc_id").cast("string"), SHUFFLE_SALT).alias("hv"),
    ).withColumn("shard", F.col("hv") % N_SHARDS)
    w = (
        Window.partitionBy("shard")
        .orderBy("hv", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return h.select(
        "doc_id",
        "shard",
        F.coalesce(F.sum(F.col("n_chars") + 1).over(w), F.lit(0))
        .cast("bigint")
        .alias("byte_offset"),
        (F.col("n_chars") + 1).cast("bigint").alias("byte_len"),
    )


def _corpus_report_oracle() -> str:
    from .queries_text import quality_sql

    return f"""
    WITH q AS ({quality_sql()}),
    base AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(DISTINCT {md5_long_sql("text")}) AS BIGINT)
                   AS n_unique_texts,
               CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(SUM(len({tokens_sql("text")})) AS BIGINT) AS total_tokens
        FROM documents
    ),
    qq AS (
        SELECT CAST(SUM(CAST(ROUND(quality * 1000000) AS BIGINT)) AS BIGINT)
                   AS q_micro_sum
        FROM q
    )
    SELECT n_docs, n_unique_texts,
           ROUND(1.0 - CAST(n_unique_texts AS DOUBLE)
                 / CAST(n_docs AS DOUBLE), 6) AS exact_dup_rate,
           n_langs, total_tokens,
           ROUND(CAST(q_micro_sum AS DOUBLE)
                 / CAST(n_docs AS DOUBLE) / 1000000, 6) AS mean_quality
    FROM base, qq
    """


@corpus_query("curate_corpus_report", oracle=_corpus_report_oracle())
def curate_corpus_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus health dashboard: document count, exact-duplicate
    rate, language count, total token volume, and mean quality — the
    numbers a curation run prints before/after each stage. Everything is
    integer/decimal-exact (the quality mean goes through micro-scaled
    BIGINTs so summation order cannot perturb it); the whole report is
    two scans collapsing to 1-row aggregates combined by broadcast
    cross-join."""
    from ..functions.hashing import md5_long as _md5
    from .queries_text import text_quality_score

    docs = load_table(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(_md5("text")).cast("bigint").alias("n_unique_texts"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        F.sum(F.size(tokens("text"))).cast("bigint").alias("total_tokens"),
    )
    qq = text_quality_score(spark, sf_dir).agg(
        F.sum(F.round(F.col("quality") * 1000000).cast("bigint"))
        .cast("bigint")
        .alias("q_micro_sum")
    )
    j = base.crossJoin(F.broadcast(qq))
    return j.select(
        "n_docs",
        "n_unique_texts",
        F.round(
            1.0
            - F.col("n_unique_texts").cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("exact_dup_rate"),
        "n_langs",
        "total_tokens",
        F.round(
            F.col("q_micro_sum").cast("double")
            / F.col("n_docs").cast("double")
            / 1000000,
            6,
        ).alias("mean_quality"),
    )


# ------------------------------------------- exact stratified sampling

STRATIFIED_PCT = 10          # keep ceil(10%) of every stratum
STRATIFIED_SALT = "strat-v1"  # freeze the sample against other salted ops


@corpus_query(
    "curate_stratified_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang, source,
               {md5_long_sql('CAST(doc_id AS VARCHAR)', STRATIFIED_SALT)}
                   AS skey
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, lang, source,
               ROW_NUMBER() OVER (
                   PARTITION BY lang, source ORDER BY skey, doc_id
               ) AS rk,
               COUNT(*) OVER (PARTITION BY lang, source) AS n
        FROM keyed
    )
    SELECT doc_id, lang, source, rk AS sample_rank
    FROM ranked
    WHERE rk <= ({STRATIFIED_PCT} * n + 99) // 100
    """,
)
def curate_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT stratified sampling: ceil({STRATIFIED_PCT}%) of every
    (lang, source) stratum, selected in salted-hash order — the
    training-data subsampling step that preserves the mixture
    composition exactly. ``df.sampleBy`` gives only EXPECTED fractions
    (Bernoulli per row: a small stratum can lose every row); quota by
    per-stratum rank over a deterministic hash gives the exact count,
    reproducibly (the salt freezes this sample against every other
    salted operator in the repo), and remains a pure function of
    doc_id — new corpus snapshots keep previously sampled docs stable.

    Scale shape: ranks ride operators/rank.py::grouped_global_rank
    (range-partition on (stratum, hash) — no per-stratum window funnel;
    a hot stratum at 100 TB spreads over many range partitions), counts
    are one map-combinable groupBy broadcast back; the quota threshold
    ceil(p*n/100) = (p*n + 99) DIV 100 is exact integer arithmetic."""
    from ..operators.rank import grouped_global_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        "source",
        md5_long(F.col("doc_id").cast("string"), STRATIFIED_SALT).alias(
            "skey"
        ),
    )
    ranked = grouped_global_rank(
        docs, ["lang", "source"], ["skey", "doc_id"], rank_col="sample_rank"
    )
    counts = ranked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        ranked.join(F.broadcast(counts), ["lang", "source"])
        .filter(
            F.col("sample_rank")
            <= F.expr(f"({STRATIFIED_PCT} * n + 99) div 100")
        )
        .select("doc_id", "lang", "source", "sample_rank")
    )


# ----------------------------------------- weighted sampling (priority sample)

_PS_SALT = "psample-v1:"
_PS_K = 12  # sample size per language
_PS_UBITS = 1073741824  # 2^30: uniform denominator AND priority scale


@corpus_query(
    "curate_weighted_sample",
    oracle=f"""
    WITH w AS (
        SELECT lang, doc_id, source,
               GREATEST(n_chars, 1) AS weight,
               ({md5_long_sql("CAST(doc_id AS VARCHAR)", _PS_SALT)}
                   % {_PS_UBITS}) + 1 AS u
        FROM documents
    ),
    p AS (
        SELECT lang, doc_id, source, weight,
               (weight * {_PS_UBITS}) // u AS priority
        FROM w
    ),
    r AS (
        SELECT lang, doc_id, source, weight, priority,
               ROW_NUMBER() OVER (
                   PARTITION BY lang ORDER BY priority DESC, doc_id
               ) AS rk
        FROM p
    )
    SELECT lang, doc_id, source, weight, priority, rk
    FROM r WHERE rk <= {_PS_K}
    """,
)
def curate_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, k docs per language, via
    PRIORITY SAMPLING (Duffield-Lund-Thorup, JACM '07): each item gets
    priority q = w / u with u ~ Uniform(0,1]; the top-k by q is a
    weighted sample without replacement with near-optimal variance for
    subset-sum estimation. The LLM-mixing use case: sample long/high-
    quality documents proportionally more while keeping the draw
    reproducible across runs and cluster sizes.

    Determinism + cross-engine exactness: u is the salted-md5 uniform
    (functions/hashing.py) and the priority is computed entirely in
    BIGINT arithmetic -- u' = h % 2^30 + 1 in (0, 2^30], priority =
    (w * 2^30) DIV u' = floor of the real-valued w/u scaled by 2^30.
    Integer floor-division is bit-identical in both engines, so the
    ranking has ZERO float-tie exposure (the [[round-ties-lesson]]
    doctrine) and the oracle mirrors it exactly.

    Scale shape: one window partitioned by lang with the rk <= k filter
    directly above it -- Spark's WindowGroupLimit rewrite keeps a
    per-task top-k heap BEFORE the shuffle, so each map task emits at
    most k rows per language regardless of input size; the reduce side
    merges tiny per-task heads. No full sort, no data-sized window
    funnel even for a 2-language 100 TB corpus (plan-pinned in
    tests/test_plan_shapes.py).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = docs.select(
        "lang",
        "doc_id",
        "source",
        F.greatest(F.col("n_chars"), F.lit(1)).alias("weight"),
        (
            md5_long(F.col("doc_id").cast("string"), _PS_SALT) % _PS_UBITS + 1
        ).alias("u"),
    )
    p = w.select(
        "lang",
        "doc_id",
        "source",
        "weight",
        F.expr(f"(weight * {_PS_UBITS}) div u").alias("priority"),
    )
    win = Window.partitionBy("lang").orderBy(
        F.col("priority").desc(), F.col("doc_id")
    )
    return (
        p.withColumn("rk", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rk") <= _PS_K)
        .select("lang", "doc_id", "source", "weight", "priority", "rk")
    )


# --------------------- deterministic reservoir per source (r11)

RESERVOIR_K = 5
RESERVOIR_SALT = "rsv1"


@corpus_query(
    "curate_reservoir_per_source",
    oracle=f"""
    WITH h AS (
        SELECT source, doc_id,
               {md5_long_sql("CAST(doc_id AS VARCHAR)", RESERVOIR_SALT)} AS hv
        FROM documents
    ),
    ranked AS (
        SELECT source, doc_id, hv,
               ROW_NUMBER() OVER (
                   PARTITION BY source ORDER BY hv, doc_id
               ) AS rk
        FROM h
    )
    SELECT source, CAST(rk AS BIGINT) AS rk, doc_id
    FROM ranked WHERE rk <= {RESERVOIR_K}
    """,
)
def curate_reservoir_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic EXACT-k uniform sample per source — reservoir
    sampling without the reservoir: rank every document by a salted
    hash of its id and keep the first {RESERVOIR_K} per source. A fixed
    salt makes the "random" permutation a pure function of the data, so
    the sample is reproducible across runs, engines, and partitionings
    (the property audit/eval splits need that streaming reservoir
    algorithms cannot give), while staying uniform over each source.
    Complements [curate_stratified_sample] (percentage per stratum —
    grows with the stratum) with the fixed-BUDGET variant (k per
    stratum — the "show me 5 docs from every source" review sample).

    Scale design: the per-source top-k rides grouped_global_rank
    (range-partition on (source, hash) + per-(partition, source)
    offsets) — no per-source window funnel when sources are few and
    huge; the filter keeps k rows per source, so the result is
    dimension-sized. Hash is the cross-engine 60-bit md5 scheme
    (functions/hashing.py), ties impossible to matter (doc_id is the
    final key)."""
    from ..operators.rank import grouped_global_rank

    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        md5_long(F.col("doc_id").cast("string"), RESERVOIR_SALT).alias("hv"),
    )
    ranked = grouped_global_rank(
        docs, ["source"], ["hv", "doc_id"], rank_col="rk"
    )
    return (
        ranked.filter(F.col("rk") <= RESERVOIR_K)
        .select("source", F.col("rk").cast("bigint").alias("rk"), "doc_id")
    )
