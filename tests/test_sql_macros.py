"""SQL-UDF surface (functions/sql_macros.py) vs the Column-API twins.

Each ``sg_*`` SQL function must be VALUE-IDENTICAL to the corresponding
helper in functions/hashing.py / text.py / vectors.py on real corpus
data — the macros are documentation-enforced copies of the same
expressions, and this is the pin that keeps them in lock-step.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.functions.hashing import md5_long
from project_crypto_data_engineering_gcp_spark.functions.sql_macros import (
    register_sql_functions,
)
from project_crypto_data_engineering_gcp_spark.functions.text import (
    canonical_text,
    shingles_of_tokens,
    stopword_count,
    tokens,
)
from project_crypto_data_engineering_gcp_spark.functions.vectors import (
    cosine,
    dot,
    norm,
)
from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

from .conftest import SF_ORACLE


def _mismatches(df, a: str, b: str) -> int:
    return df.filter(~F.col(a).eqNullSafe(F.col(b))).count()


def test_register_is_idempotent(spark):
    names = register_sql_functions(spark)
    assert register_sql_functions(spark) == names
    assert all(n.startswith("sg_") for n in names)


def test_text_macros_match_column_helpers(spark):
    register_sql_functions(spark)
    docs = load_table(spark, SF_ORACLE, "documents").limit(200)
    docs.createOrReplaceTempView("sg_macro_docs")
    got = spark.sql(
        """SELECT doc_id,
                  sg_md5_long(text) AS h_sql,
                  sg_md5_long_salted(text, 'x') AS hs_sql,
                  sg_tokens(text) AS t_sql,
                  sg_canonical_text(text) AS c_sql,
                  sg_shingles(text, 3) AS sh_sql,
                  sg_stopword_count(text, array('the', 'a', 'of')) AS sw_sql
           FROM sg_macro_docs"""
    )
    # shingles_of_tokens needs the pre-split array column
    want = (
        docs.select("doc_id", "text", tokens("text").alias("__toks"))
        .select(
            "doc_id",
            md5_long("text").alias("h_py"),
            md5_long("text", "x").alias("hs_py"),
            tokens("text").alias("t_py"),
            canonical_text("text").alias("c_py"),
            shingles_of_tokens("__toks", 3).alias("sh_py"),
            stopword_count("text", ("the", "a", "of")).alias("sw_py"),
        )
    )
    j = got.join(want, "doc_id")
    for a, b in (
        ("h_sql", "h_py"),
        ("hs_sql", "hs_py"),
        ("t_sql", "t_py"),
        ("c_sql", "c_py"),
        ("sh_sql", "sh_py"),
        ("sw_sql", "sw_py"),
    ):
        assert _mismatches(j, a, b) == 0, (a, b)


def test_vector_macros_match_column_helpers(spark):
    register_sql_functions(spark)
    emb = load_table(spark, SF_ORACLE, "embeddings").limit(200)
    emb.createOrReplaceTempView("sg_macro_emb")
    got = spark.sql(
        """SELECT vec_id,
                  sg_dot(embedding, embedding) AS d_sql,
                  sg_l2norm(embedding) AS n_sql,
                  sg_cosine(embedding, embedding) AS c_sql
           FROM sg_macro_emb"""
    )
    want = emb.select(
        "vec_id",
        dot("embedding", "embedding").alias("d_py"),
        norm("embedding").alias("n_py"),
        cosine("embedding", "embedding").alias("c_py"),
    )
    j = got.join(want, "vec_id")
    for a, b in (("d_sql", "d_py"), ("n_sql", "n_py"), ("c_sql", "c_py")):
        assert _mismatches(j, a, b) == 0, (a, b)


def test_macros_inline_into_codegen(spark):
    """The macro body must inline into the caller's plan — no Python
    eval nodes, no extra project barrier beyond a plain expression."""
    register_sql_functions(spark)
    docs = load_table(spark, SF_ORACLE, "documents").limit(10)
    docs.createOrReplaceTempView("sg_macro_docs2")
    df = spark.sql("SELECT sg_md5_long(text) AS h FROM sg_macro_docs2")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
