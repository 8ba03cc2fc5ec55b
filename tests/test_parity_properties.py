"""Property tests for the cross-engine parity primitives on randomized +
adversarial inputs — the foundations the whole differential corpus rests
on (exact decimal sums, HALF_UP rounding, md5-derived hashing, fold-based
vector math). Seeded generation, executed in one DataFrame per property
to keep Spark round-trips cheap."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.hashing import (
    md5_long,
    md5_long_sql,
)
from project_crypto_data_engineering_gcp_spark.functions.numeric import (
    dsum,
    dsum_expr_sql,
)
from project_crypto_data_engineering_gcp_spark.functions.vectors import (
    dot,
    dot_sql,
)

RNG = np.random.default_rng(424242)


def _duck(sql: str, **frames):
    con = duckdb.connect()
    for name, df in frames.items():
        con.register(name, df)
    try:
        return con.execute(sql).fetchall()
    finally:
        con.close()


def test_decimal_sum_parity_random_cents(spark):
    # 20k random 2-decimal values incl. negatives and magnitude extremes
    vals = np.round(RNG.uniform(-1e6, 1e6, 20_000), 2)
    vals = np.append(vals, [0.01, -0.01, 999999999.99, -999999999.99, 0.0])
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = sdf.agg(dsum("x", 18, 2).alias("s")).collect()[0]["s"]
    import pandas as pd

    exp = _duck(
        f"SELECT {dsum_expr_sql('x', 18, 2)} FROM t", t=pd.DataFrame({"x": vals})
    )[0][0]
    assert got == exp  # bit-exact, any partitioning


@pytest.mark.parametrize("scale", [0, 2, 4, 8])
def test_round_parity_random_and_binary_exact_halves(spark, scale):
    """The corpus design rule (see functions/numeric.py): ROUND is only
    applied to computed/arbitrary doubles, or at a scale >= the data's
    own decimal width. Within that envelope Spark and DuckDB agree —
    verified here on random doubles plus binary-exact .5 halves."""
    import pandas as pd

    vals = RNG.uniform(-1e4, 1e4, 5_000)
    vals = np.append(vals, [0.5, -0.5, 2.5, 122.5, 0.125, -0.125])
    sdf = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = [
        r["r"] for r in sdf.select(F.round("x", scale).alias("r")).collect()
    ]
    exp = [
        r[0]
        for r in _duck(
            f"SELECT ROUND(x, {scale}) FROM t", t=pd.DataFrame({"x": vals})
        )
    ]
    assert got == exp


def test_round_divergence_outside_design_rule_is_real(spark):
    """Documented divergence class the design rule exists to avoid:
    a double whose shortest decimal repr terminates with '5' right past
    the rounding scale (e.g. 1.005 at scale 2, binary 1.00499999...).
    Spark rounds the shortest-repr digits (HALF_UP -> 1.01); DuckDB
    rounds the binary value (-> 1.0). Corpus queries must never round a
    data-borne short decimal below its own scale."""
    sdf = spark.createDataFrame([(1.005,)], "x double")
    spark_val = sdf.select(F.round("x", 2).alias("r")).collect()[0]["r"]
    duck_val = duckdb.connect().execute(
        "SELECT ROUND(CAST(1.005 AS DOUBLE), 2)"
    ).fetchone()[0]
    assert spark_val == 1.01 and duck_val == 1.0  # they genuinely differ


def test_md5_long_parity_unicode(spark):
    import pandas as pd

    strings = [
        "",
        "a",
        "hello world",
        "çãó-ünïcode-文字-🙂",
        "line\nbreak\ttab",
        "' OR 1=1 --",
        "x" * 10_000,
    ] + ["s%d" % i for i in range(500)]
    sdf = spark.createDataFrame([(s,) for s in strings], "s string")
    got = sorted(
        r["h"] for r in sdf.select(md5_long("s").alias("h")).collect()
    )
    exp = sorted(
        r[0]
        for r in _duck(
            f"SELECT {md5_long_sql('s')} FROM t", t=pd.DataFrame({"s": strings})
        )
    )
    assert got == exp


def test_vector_fold_parity_random_float32(spark):
    import pandas as pd

    dim = 64
    a = RNG.normal(0, 1, (200, dim)).astype(np.float32)
    b = RNG.normal(0, 1, (200, dim)).astype(np.float32)
    pdf = pd.DataFrame(
        {"a": [row.tolist() for row in a], "b": [row.tolist() for row in b]}
    )
    sdf = spark.createDataFrame(
        pdf, "a array<float>, b array<float>"
    )
    got = [r["d"] for r in sdf.select(dot("a", "b").alias("d")).collect()]
    exp = [r[0] for r in _duck(f"SELECT {dot_sql('a', 'b')} FROM t", t=pdf)]
    assert got == exp  # bit-exact fold, incl. float32 -> double casts
    # and bit-exact vs the blockwise numpy dimension-sequential loop
    acc = np.zeros(len(a))
    A, B = a.astype(np.float64), b.astype(np.float64)
    for i in range(dim):
        acc += A[:, i] * B[:, i]
    assert got == acc.tolist()


def test_roundfx_engine_identity(spark):
    """roundfx must produce bit-identical doubles in Spark and DuckDB,
    INCLUDING on exact half-boundary ties where the engines' native
    ROUND implementations disagree (dyadic rationals like 5/2048) —
    the r5 ROUND-tie bug class this helper retires."""
    import duckdb
    from pyspark.sql import functions as F

    from project_crypto_data_engineering_gcp_spark.functions.numeric import (
        roundfx,
        roundfx_sql,
    )

    vals = [
        5 / 2048, -5 / 2048, 3 / 4096, 1 / 3, 2 / 3, 0.1234565,
        0.9999995, -0.9999995, 0.125, 0.0, 123456.789,
    ]
    duck = duckdb.sql(
        "SELECT " + ", ".join(roundfx_sql(repr(v)) for v in vals)
    ).fetchall()[0]
    row = (
        spark.range(1)
        .select(*[roundfx(F.lit(v)).alias(f"v{i}") for i, v in enumerate(vals)])
        .collect()[0]
    )
    assert tuple(row) == duck
