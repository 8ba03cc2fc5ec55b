"""Python UDTF demonstrator (Spark 4 user-defined table functions).

The engine's position on Python in the hot path is documented
throughout: row-expanding transforms ship as JVM expressions (explode
over a sequence — plans/queries_curation.py::curate_chunk_overlap) or
Arrow-batched Pandas UDFs, never per-row Python. UDTFs are the one
modern-PySpark API that position leaves unexercised, so this module
demonstrates it HONESTLY: :class:`ChunkDocs` reimplements the exact
chunking semantics of ``curate_chunk_overlap`` ({CHUNK_SIZE}-token
chunks, {CHUNK_STRIDE} stride) as a lateral-joinable table function,
and tests/test_udtf_chunker.py pins row-for-row equality with the JVM
fast path (itself DuckDB-oracle-checked — the UDTF is transitively
exact).

When to actually use a UDTF at scale: per-row logic that genuinely
cannot be expressed as expressions or vectorized over Arrow batches
(stateful per-row parsers, third-party row libraries). For everything
else the fast path wins — that asymmetry is the point this module
documents, with the registration one-liner SQL users need:

    from project_crypto_data_engineering_gcp_spark.functions.udtf_chunker import register_chunk_udtf
    register_chunk_udtf(spark)
    spark.sql("SELECT d.doc_id, c.* FROM docs d, LATERAL sg_chunk(d.text) c")
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

CHUNK_SIZE, CHUNK_STRIDE = 64, 48  # mirror curate_chunk_overlap exactly


@udtf(returnType="chunk_idx int, chunk_text string, n_tokens bigint")
class ChunkDocs:
    """Overlapping token-window chunks of a single-space-tokenized text —
    the same (start, slice, count) arithmetic as the JVM expression form:
    starts s = 1, 1+stride, ... capped at max(n - size, 0) + stride - 1
    (no new chunk once a previous one reaches the tail) and at n;
    chunk_idx = (s - 1) / stride."""

    def eval(self, text: str):  # noqa: D102 — interface method
        if text is None:
            return
        toks = text.split(" ")
        n = len(toks)
        limit = min(max(n - CHUNK_SIZE, 0) + CHUNK_STRIDE - 1, n)
        s = 1
        while s <= limit:
            yield (
                (s - 1) // CHUNK_STRIDE,
                " ".join(toks[s - 1 : s - 1 + CHUNK_SIZE]),
                min(n - s + 1, CHUNK_SIZE),
            )
            s += CHUNK_STRIDE


def register_chunk_udtf(spark: SparkSession, name: str = "sg_chunk") -> str:
    """Register :class:`ChunkDocs` as a session TVF usable in LATERAL
    position. Returns the registered name."""
    spark.udtf.register(name, ChunkDocs)
    return name
