"""End-to-end curation pipeline: determinism, decontamination, shard
layout, and stage-monotonic manifest."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.hashing import md5_long
from project_crypto_data_engineering_gcp_spark.functions.text import canonical_text
from project_crypto_data_engineering_gcp_spark.plans.curation_pipeline import (
    curate_training_shards,
    read_shards,
)

from .conftest import SF_SMOKE


def test_curation_pipeline_end_to_end(spark, tmp_path):
    out1 = str(tmp_path / "run1")
    manifest = curate_training_shards(spark, SF_SMOKE, out1)

    # stage-monotonic: each stage only removes docs
    total = sum(manifest[f"{s}_docs"] for s in ("train", "val", "test"))
    assert manifest["raw"] >= manifest["after_dedup_and_quality"] >= total > 0
    assert manifest["train_docs"] > manifest["val_docs"]

    shards = read_shards(spark, out1)
    # no duplicate content within the curated corpus (dedup ran)
    fps = shards.select(md5_long(canonical_text("text")).alias("fp"))
    assert fps.count() == fps.distinct().count()
    # no train/test fingerprint leakage (decontamination ran)
    train_fp = shards.filter(F.col("split") == "train").select(
        md5_long(canonical_text("text")).alias("fp")
    )
    test_fp = shards.filter(F.col("split") == "test").select(
        md5_long(canonical_text("text")).alias("fp")
    )
    assert train_fp.join(test_fp, "fp").count() == 0
    # packing bins are dense non-negative ints per (split, lang)
    assert shards.filter(F.col("pack_bin") < 0).count() == 0

    # split partition pruning works on the shard layout
    assert read_shards(spark, out1, "val").count() == manifest["val_docs"]

    # determinism: a second run produces the identical corpus
    out2 = str(tmp_path / "run2")
    manifest2 = curate_training_shards(spark, SF_SMOKE, out2)
    assert manifest2 == manifest
    a, b = read_shards(spark, out1), read_shards(spark, out2)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
