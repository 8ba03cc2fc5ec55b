"""Multimodal-column corpus queries (BASELINE.json north star).

The payload bytes here are UTF-8 text stand-ins (the container has no
codec libraries and the testdata has no real media), so the *byte-level*
operators — length, content hash, frame slicing — are real and
oracle-checked; the decode step is the documented stub in
operators/multimodal.py, exercised by the rows-only query + pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.multimodal import (
    as_media_frame,
    byte_histogram,
    extract_media_meta,
    resize_media_meta,
    sample_frames,
)
from ..sources.tables import load_table
from .corpus import corpus_query

FRAME_STRIDE = 64
N_FRAMES = 4
RESIZE_W, RESIZE_H = 224, 224


def _stub_dim_sql(hex_pos: int, mod: int, base: int) -> str:
    """DuckDB twin of the decode stub's md5-derived fake dimensions:
    byte i of md5(utf8(text)) == hex chars [2i+1, 2i+2] parsed base-16.
    DuckDB's md5(VARCHAR) hashes the UTF-8 encoding — identical bytes to
    the Python stub's md5(payload)."""
    return (
        f"CAST({base} + ('0x' || substr(md5(text), {hex_pos}, 2))::INT"
        f" % {mod} AS INTEGER)"
    )


@corpus_query(
    "mm_payload_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           'image/fake' AS media_type
    FROM documents
    """,
)
def mm_payload_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-payload hygiene scan, pure-expression form: exact byte
    length + content sha256 on the binary column. Column pruning means a
    metadata-only query like this never reads payload bytes it does not
    select at scale."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        F.octet_length("content").alias("n_bytes"),
        F.sha2("content", 256).alias("sha256"),
        "media_type",
    )


@corpus_query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id, frame_idx, frame_offset,
           substr(text, frame_offset + 1, {FRAME_STRIDE}) AS frame_text
    FROM (
        SELECT doc_id, text, unnest(range(0, {N_FRAMES})) AS frame_idx,
               unnest(range(0, {N_FRAMES})) * {FRAME_STRIDE} AS frame_offset
        FROM documents
    ) t
    WHERE frame_offset < octet_length(encode(text))
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (video-like payloads): {N_FRAMES} evenly
    spaced byte offsets per payload, sliced JVM-side via posexplode —
    the row-explosion shape a real frame extractor would feed."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, n_frames=N_FRAMES, frame_stride_bytes=FRAME_STRIDE)


@corpus_query(
    "mm_media_meta_stub",
    oracle=f"""
    SELECT doc_id, 'image/fake' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           {_stub_dim_sql(1, 240, 16)} AS width,
           {_stub_dim_sql(3, 240, 16)} AS height,
           {_stub_dim_sql(5, 4, 1)} AS channels
    FROM documents
    """,
)
def mm_media_meta_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas metadata extraction with the STUBBED
    decode (deterministic fake dimensions — see operators/multimodal.py).
    Fully oracle-checked even though the decode is Python-side: the fake
    dims are a pure md5 function of the payload, which DuckDB replays."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return extract_media_meta(media)


@corpus_query(
    "mm_resize_meta",
    oracle=f"""
    WITH decoded AS (
        SELECT doc_id,
               {_stub_dim_sql(1, 240, 16)} AS width,
               {_stub_dim_sql(3, 240, 16)} AS height,
               {_stub_dim_sql(5, 4, 1)} AS channels,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    )
    SELECT doc_id, width, height, channels,
           {RESIZE_W} AS target_w, {RESIZE_H} AS target_h,
           ROUND({RESIZE_W} / CAST(width AS DOUBLE), 6) AS scale_x,
           ROUND({RESIZE_H} / CAST(height AS DOUBLE), 6) AS scale_y,
           LEAST(n_bytes, {RESIZE_W} * {RESIZE_H} * CAST(channels AS BIGINT))
               AS n_bytes_out
    FROM decoded
    """,
)
def mm_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing to a {RESIZE_W}x{RESIZE_H} box: source dims from
    the stub decode, float scale factors, and the output byte budget.
    Scale-factor rounding is tie-free for any width in [16, 256), so
    numpy's and DuckDB's rounding agree bit-for-bit."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return resize_media_meta(media, target_w=RESIZE_W, target_h=RESIZE_H)


@corpus_query(
    "mm_byte_histogram",
    oracle="""
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n_bytes,
               hex(encode(text)) AS hx
        FROM documents
    ), nib AS (
        -- high nibble of byte i == hex digit at odd position 2i+1
        SELECT b.doc_id,
               strpos('0123456789ABCDEF',
                      substr(b.hx, CAST(2 * u.i + 1 AS BIGINT), 1)) - 1 AS bin
        FROM b, UNNEST(range(0, b.n_bytes)) AS u(i)
    ), cnt AS (
        SELECT doc_id, bin, CAST(COUNT(*) AS BIGINT) AS n_in_bin
        FROM nib GROUP BY doc_id, bin
    )
    SELECT b.doc_id,
           b.n_bytes,
           CAST(g.bin AS INTEGER) AS bin,
           COALESCE(c.n_in_bin, 0) AS n_in_bin,
           CAST(COALESCE(c.n_in_bin, 0) AS DOUBLE)
               / GREATEST(b.n_bytes, 1) AS density
    FROM b
    CROSS JOIN (SELECT UNNEST(range(0, 16)) AS bin) g
    LEFT JOIN cnt c ON c.doc_id = b.doc_id AND c.bin = g.bin
    """,
)
def mm_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-value histogram features (16 bins over the high nibble) in
    LONG format — one row per (doc, bin), zero bins included — via one
    numpy bincount per payload. density is a single IEEE double division
    (no rounding), so numpy and the DuckDB oracle (which replays the
    nibble extraction off ``hex(encode(text))``) agree bit-for-bit."""
    media = as_media_frame(load_table(spark, sf_dir, "documents"))
    return byte_histogram(media)


# ----------------------------------------- binary-payload near-dedup

MM_SIMHASH_BITS = 32
MM_SIMHASH_BANDS = 4          # 4 bands x 8 bits
MM_HAMMING_MAX = 3            # <= bands - 1 -> recall exact by pigeonhole
MM_GRAM_BYTES = 4             # non-overlapping payload 4-grams


def _mm_simhash_oracle() -> str:
    from ..functions.hashing import md5_long_sql

    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS s{i}"
        for i in range(MM_SIMHASH_BITS)
    )
    hash_expr = " + ".join(
        f"(CASE WHEN s{i} >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(MM_SIMHASH_BITS)
    )
    band_rows = "\n        UNION ALL ".join(
        f"SELECT doc_id, simhash, {k} AS k,"
        f" (simhash >> {8 * k}) & 255 AS bv FROM sh"
        for k in range(MM_SIMHASH_BANDS)
    )
    return f"""
    WITH grams AS (
        SELECT doc_id, {md5_long_sql("gram")} AS h FROM (
            SELECT DISTINCT doc_id, gram FROM (
                SELECT doc_id,
                       unnest(list_transform(
                           range(1, length(text) + 1, {MM_GRAM_BYTES}),
                           p -> substr(text, p, {MM_GRAM_BYTES}))) AS gram
                FROM documents) u) d
    ),
    bits AS (SELECT doc_id, {bit_sums} FROM grams GROUP BY doc_id),
    sh AS (SELECT doc_id, {hash_expr} AS simhash FROM bits),
    bands AS (
        {band_rows}
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.simhash AS ha, b.simhash AS hb
        FROM bands a
        JOIN bands b ON b.k = a.k AND b.bv = a.bv AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
    FROM cands WHERE bit_count(xor(ha, hb)) <= {MM_HAMMING_MAX}
    """


@corpus_query("mm_simhash_payload", oracle=_mm_simhash_oracle())
def mm_simhash_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dedup for BINARY payloads (the multimodal rung of the dedup
    ladder — dedup_exact's sha256 only catches bit-identical media):
    {MM_SIMHASH_BITS}-bit SimHash over distinct non-overlapping
    {MM_GRAM_BYTES}-byte payload grams, banded into {MM_SIMHASH_BANDS} x
    8-bit keys for candidate generation, exact Hamming verify via
    xor+popcount. Recall is EXACT BY PIGEONHOLE at this threshold: a
    pair with Hamming <= {MM_HAMMING_MAX} differs in at most
    {MM_HAMMING_MAX} of {MM_SIMHASH_BANDS} bands, so at least one band
    matches exactly and the pair always becomes a candidate — banding
    here is pure pruning, not approximation.

    Scale shape: sketch = one map-side-combinable vote aggregate (the
    dedup_simhash shape, over payload grams instead of tokens); the
    pairwise stage is gated on the band equi-join, never all-pairs;
    verify is integer xor+popcount on two 32-bit signatures. Payload
    bytes are the documents text stand-in (module docstring), so gram
    slicing is the same char-based substring in both engines."""
    from ..functions.hashing import md5_long

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    f"CASE WHEN length(text) < 1 THEN array() ELSE "
                    f"transform(sequence(1, length(text), {MM_GRAM_BYTES}),"
                    f" p -> substring(text, p, {MM_GRAM_BYTES})) END"
                )
            )
        ).alias("gram"),
    ).select("doc_id", md5_long("gram").alias("h"))
    bits = grams.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1
                ).otherwise(-1)
            ).alias(f"s{i}")
            for i in range(MM_SIMHASH_BITS)
        ]
    )
    simhash = None
    for i in range(MM_SIMHASH_BITS):
        term = F.when(F.col(f"s{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        simhash = term if simhash is None else simhash + term
    sh = bits.select("doc_id", simhash.cast("bigint").alias("simhash"))
    bands = sh.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("k"),
                        F.shiftright(F.col("simhash"), 8 * k)
                        .bitwiseAND(255)
                        .alias("bv"),
                    )
                    for k in range(MM_SIMHASH_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", "b.k", "b.bv")
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(
            b,
            (F.col("b.k") == F.col("a.k"))
            & (F.col("b.bv") == F.col("a.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return cands.filter(hamming <= MM_HAMMING_MAX).select(
        "doc_a", "doc_b", hamming.cast("bigint").alias("hamming")
    )
