"""Differential-test harness replicating the driver's verify semantics:
run the Spark query and its DuckDB oracle on the same parquet tables and
compare row count + column names + order-insensitive values (exact, no
float tolerance — the engine is designed for bit parity)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from project_crypto_data_engineering_gcp_spark.sources.tables import TESTDATA_TABLES

__test__ = False


def run_duckdb(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    try:
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(s) or isinstance(
            s.dtype, pd.api.types.pandas_dtype("Int64").__class__
        ):
            # Unify int widths to int64 but KEEP integer-ness: the driver's
            # hash is type-sensitive, so an oracle HUGEINT (DuckDB SUM(int))
            # arriving as float64 must FAIL here, not be coerced green.
            if s.isna().any():
                df[c] = s.astype("float64")  # nullable ints: both engines
                # surface these as float64 in pandas, nothing to compare
            else:
                df[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
    df = df.sort_values(by=list(df.columns), na_position="last", kind="mergesort")
    return df.reset_index(drop=True)


def assert_frames_match(spark_df, duck_df: pd.DataFrame, name: str = "") -> None:
    sp = _normalize(spark_df.toPandas())
    du = _normalize(duck_df)
    assert list(sp.columns) == list(du.columns), (
        f"{name}: column mismatch spark={list(sp.columns)} duck={list(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    for c in sp.columns:
        a, b = sp[c], du[c]
        assert a.dtype.kind == b.dtype.kind, (
            f"{name}: column {c!r} dtype-kind mismatch "
            f"spark={a.dtype} duck={b.dtype} (uncast HUGEINT oracle SUM?)"
        )
        if pd.api.types.is_float_dtype(a):
            eq = (a.values == b.values) | (np.isnan(a.values) & np.isnan(b.values))
        else:
            eq = (a.values == b.values) | (pd.isna(a).values & pd.isna(b).values)
        if not eq.all():
            bad = np.where(~eq)[0][:5]
            raise AssertionError(
                f"{name}: column {c!r} mismatch at rows {bad.tolist()}: "
                f"spark={a.iloc[bad].tolist()} duck={b.iloc[bad].tolist()}"
            )
