"""Source/sink format menu: gold output round-trips through CSV and ORC
without value loss (the engine is parquet-first; these prove the rest of
the standard format surface works for interchange)."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.plans import all_queries

from .conftest import SF_SMOKE


def test_orc_roundtrip(spark, tmp_path):
    df = all_queries()["q1_pricing_summary"].fn(spark, SF_SMOKE)
    path = str(tmp_path / "q1_orc")
    df.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    # nullability flags legitimately differ after a round-trip; names and
    # types must survive
    assert [(f.name, f.dataType) for f in back.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    df = all_queries()["q1_pricing_summary"].fn(spark, SF_SMOKE)
    path = str(tmp_path / "q1_csv")
    df.write.mode("overwrite").option("header", True).csv(path)
    back = spark.read.schema(df.schema).option("header", True).csv(path)
    # doubles survive CSV via shortest-repr round-trip
    assert back.exceptAll(df).count() == 0 and df.exceptAll(back).count() == 0
