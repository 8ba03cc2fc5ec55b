"""End-to-end training-data curation pipeline.

The runnable artifact a training-data engineer actually ships: raw
documents -> exact dedup (keep smallest doc_id) -> per-language quality
cut -> deterministic hash split -> train-side decontamination against the
test slice -> stride packing -> per-split parquet shards + an audit
manifest. Composes the individually-oracle-checked curation/dedup
operators (queries_curation.py, queries_dedup.py) into one lineage — one
Spark job, no intermediate materialization until the shard write.

Determinism contract (the whole point of this pipeline): every stage is
a pure function of document content/ids — salted-md5 split membership,
hash dedup, percentile cut with doc_id tiebreak, integer running sums
for packing. Two runs on any cluster size produce identical shards.

Scale: one scan of the corpus; dedup shuffles (hash, id) only; the
quality window and packing window shuffle on lang; decontamination
broadcasts the ~5% test fingerprint slice; shard writes partition by
(split) with packing bins clustering the files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.hashing import md5_long
from ..functions.text import canonical_text, tokens
from ..sources.tables import load_table
from .queries_curation import (
    PACK_CAPACITY,
    _split_bucket,
    _split_label,
)
from .queries_curation import _quality_col  # per-language heuristic score

QUALITY_CUT_PCT = 0.25  # drop each language's bottom quartile


def curate_training_shards(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict[str, int]:
    """Run the full curation lineage and write per-split shards.
    Returns the audit manifest (docs surviving each stage)."""
    docs = load_table(spark, sf_dir, "documents")
    manifest: dict[str, int] = {"raw": docs.count()}

    # 1. exact dedup: keep the smallest doc_id per canonical fingerprint
    w_dup = Window.partitionBy(md5_long(canonical_text("text"))).orderBy("doc_id")
    deduped = (
        docs.withColumn("__rn", F.row_number().over(w_dup))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )

    # 2. per-language quality cut (percent_rank with doc_id tiebreak)
    w_q = Window.partitionBy("lang").orderBy("quality", "doc_id")
    scored = deduped.withColumn("quality", _quality_col())
    kept = (
        scored.withColumn("__pr", F.percent_rank().over(w_q))
        .filter(F.col("__pr") >= QUALITY_CUT_PCT)
        .drop("__pr")
    )

    # 3. deterministic split + fingerprint for decontamination
    labeled = kept.withColumn("split", _split_label(_split_bucket())).withColumn(
        "fingerprint", md5_long(canonical_text("text"))
    )
    labeled = labeled.cache()
    manifest["after_dedup_and_quality"] = labeled.count()

    # 4. decontaminate: drop train docs whose fingerprint appears in test
    test_fps = (
        labeled.filter(F.col("split") == "test")
        .select(F.col("fingerprint").alias("fp_test"))
        .distinct()
    )
    clean = labeled.join(
        F.broadcast(test_fps),
        (F.col("split") == "train") & (F.col("fingerprint") == F.col("fp_test")),
        "left_anti",
    )

    # 5. stride packing: per (split, lang), integer running token counts
    sized = clean.withColumn("n_tokens", F.size(tokens("text")))
    w_pack = (
        Window.partitionBy("split", "lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = sized.withColumn(
        "pack_bin",
        F.floor(
            (F.sum("n_tokens").over(w_pack) - F.col("n_tokens"))
            / F.lit(PACK_CAPACITY)
        ).cast("int"),
    )

    # 6. shard write: split is the partition column; sort within
    # partitions on (lang, pack_bin, doc_id) so shard files cluster by
    # packing bin (selective row-group stats for bin-ranged reads)
    out = packed.select(
        "doc_id", "text", "lang", "source", "split", "n_tokens", "pack_bin"
    )
    (
        out.repartition("split")
        .sortWithinPartitions("lang", "pack_bin", "doc_id")
        .write.mode("overwrite")
        .partitionBy("split")
        .parquet(os.path.join(out_dir, "shards"))
    )
    shards = spark.read.parquet(os.path.join(out_dir, "shards"))
    for split in ("train", "val", "test"):
        manifest[f"{split}_docs"] = shards.filter(F.col("split") == split).count()
    labeled.unpersist()
    return manifest


def read_shards(spark: SparkSession, out_dir: str, split: str | None = None) -> DataFrame:
    """Read back curated shards; a split filter prunes partitions."""
    df = spark.read.parquet(os.path.join(out_dir, "shards"))
    return df.filter(F.col("split") == split) if split else df
