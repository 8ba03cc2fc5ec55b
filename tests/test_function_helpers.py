"""Unit tests for helper paths not exercised by the corpus: the fast
(xxhash) hashing variant and the one-shot shingle expression."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.hashing import md5_long
from project_crypto_data_engineering_gcp_spark.functions.text import (
    shingles,
    shingles_of_tokens,
    tokens,
)


def test_md5_long_fast_variant_properties(spark):
    df = spark.createDataFrame([(f"s{i}",) for i in range(200)], "s string")
    out = df.select(
        md5_long("s").alias("slow"),
        md5_long("s", fast=True).alias("fast"),
        md5_long("s", salt="x:", fast=True).alias("fast_salted"),
    ).collect()
    assert all(0 <= r["fast"] < 2**60 for r in out)  # pmod keeps range
    assert len({r["fast"] for r in out}) == len(out)  # injective on sample
    assert any(r["fast"] != r["fast_salted"] for r in out)  # salt matters
    # run twice: deterministic
    again = df.select(md5_long("s", fast=True).alias("fast")).collect()
    assert [r["fast"] for r in out] == [r["fast"] for r in again]


def test_shingles_variants_agree(spark):
    df = spark.createDataFrame(
        [("a b c d",), ("a b",), ("solo",), ("x y z",)], "text string"
    )
    one_shot = df.select(shingles("text", 3).alias("s")).collect()
    via_tokens = (
        df.select(tokens("text").alias("t"))
        .select(shingles_of_tokens("t", 3).alias("s"))
        .collect()
    )
    assert [r["s"] for r in one_shot] == [r["s"] for r in via_tokens]
    assert one_shot[0]["s"] == ["a b c", "b c d"]
    assert one_shot[1]["s"] == []  # shorter than k -> empty set
