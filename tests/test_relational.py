"""Semantic tests for queries whose nature precludes an exact oracle."""

from __future__ import annotations

from pyspark.sql import functions as F

from project_crypto_data_engineering_gcp_spark.plans import all_queries

from .conftest import SF_ORACLE


def test_approx_distinct_error_bound(spark):
    """HLL++ rsd is 5%; the query's approx_within_tol flag asserts the
    sketch stays within 3x of it — every group must come back True (the
    oracle states the same invariant as literal TRUE)."""
    df = all_queries()["approx_distinct_parts"].fn(spark, SF_ORACLE)
    rows = df.collect()
    assert rows and all(r["approx_within_tol"] for r in rows), rows


def test_lsh_recall_vs_bruteforce(spark):
    """The sign-bit LSH top-k must (a) only return same-bucket candidates
    and (b) achieve nonzero recall of the exact top-k."""
    qs = all_queries()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in qs["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in qs["sim_ann_lsh_topk"].fn(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert 0.05 < recall <= 1.0, recall


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with 4-of-16 probed cells should recover most of the exact
    top-k (data-adaptive cells beat fixed hyperplanes on recall), and
    never exceed it."""
    qs = all_queries()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in qs["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["vec_a"], r["vec_b"])
        for r in qs["sim_ann_ivf_topk"].fn(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert 0.3 < recall <= 1.0, recall


def test_pq_recall_vs_bruteforce(spark):
    """PQ-ADC top-k with a 4x16 codebook over 64 dims is a coarse
    quantization, but the approximate ranking must still recover a solid
    share of the exact top-k, and score must decrease along each query's
    ranked list (rank is BY approx score)."""
    qs = all_queries()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in qs["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    rows = qs["sim_pq_topk"].fn(spark, SF_ORACLE).collect()
    approx = {(r["qid"], r["vec_id"]) for r in rows}
    recall = len(exact & approx) / len(exact)
    assert 0.2 < recall <= 1.0, recall
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    for q, lst in by_q.items():
        lst.sort(key=lambda r: r["rank"])
        scores = [r["approx_score"] for r in lst]
        assert scores == sorted(scores, reverse=True), (q, scores)


def test_semantic_blocked_subset_and_recall(spark):
    """Cluster-blocked semantic dedup must emit a SUBSET of the exact
    threshold pairs (blocking can only drop pairs, never invent or
    rescore them) and recover most of them (high-cosine pairs co-cluster
    by construction)."""
    from project_crypto_data_engineering_gcp_spark.operators.similarity import (
        cosine_pairs_grid,
    )
    from project_crypto_data_engineering_gcp_spark.plans.queries_similarity import (
        SEMANTIC_BLOCK_THRESHOLD,
        dedup_semantic_blocked,
    )
    from project_crypto_data_engineering_gcp_spark.sources.tables import load_table

    emb = load_table(spark, SF_ORACLE, "embeddings")
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in cosine_pairs_grid(
            emb, threshold=SEMANTIC_BLOCK_THRESHOLD
        ).collect()
    }
    blocked = {
        (r["vec_a"], r["vec_b"])
        for r in dedup_semantic_blocked(spark, SF_ORACLE).collect()
    }
    assert blocked <= exact, blocked - exact
    recall = len(blocked) / len(exact)
    assert 0.3 < recall <= 1.0, recall


def test_ivf_kmeans_recall_vs_bruteforce(spark):
    """The k-means-TRAINED IVF quantizer must recover a solid share of
    the exact top-k — data-adaptive cells are the production recipe
    precisely because they probe efficiently."""
    qs = all_queries()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in qs["sim_topk_neighbors"].fn(spark, SF_ORACLE).collect()
    }
    approx = {
        (r["qid"], r["vec_b"])
        for r in qs["sim_ann_ivf_kmeans"].fn(spark, SF_ORACLE).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert 0.3 < recall <= 1.0, recall


def test_range_join_bucketization_is_exact(spark):
    """The bucketized range join must equal the naive inequality join
    (here checked via row count against the DuckDB naive formulation,
    which the oracle already covers — this guards the bucket arithmetic
    against off-by-one drift at bucket boundaries)."""
    df = all_queries()["range_join_event_pairs"].fn(spark, SF_ORACLE)
    n = df.count()
    assert df.filter(
        (F.col("gap_us") <= 0) | (F.col("gap_us") > 3_600_000_000)
    ).count() == 0
    assert n == df.distinct().count()  # bucket overlap introduced no dupes


def test_minhash_recall_vs_exact_ngram(spark):
    """MinHash+LSH candidates verified at the same threshold as the exact
    shingle join must be a SUBSET of the exact result (verification is
    exact) with high recall (banding may miss borderline pairs)."""
    qs = all_queries()
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_ngram_jaccard"].fn(spark, SF_ORACLE).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in qs["dedup_minhash_lsh"].fn(spark, SF_ORACLE).collect()
    }
    assert exact, "expected nonempty exact near-dup pairs"
    assert lsh <= exact
    recall = len(lsh) / len(exact)
    assert recall >= 0.8, f"LSH recall too low: {recall:.2f}"


def test_bootstrap_ci_brackets_point_estimate(spark):
    """The 95% half-sample CI must contain the full-sample point
    estimate and be properly ordered for every priority group."""
    from project_crypto_data_engineering_gcp_spark.plans import all_queries

    rows = (
        all_queries()["a23_bootstrap_ci"]
        .fn(spark, "/root/testdata/sf0.01")
        .collect()
    )
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo_cents_e6"] < r["point_mean_cents_e6"] < r["ci_hi_cents_e6"], r
        assert r["n_orders"] > 0


def test_bootstrap_ci_empty_replicas_filtered(spark, tmp_path):
    """r13 focused test for the wide conditional-aggregate rewrite: a
    single-order priority leaves ~half the replicas EMPTY (bit b of the
    one hash is 0). The exploded r7-r12 shape never produced those
    (prio, b) rows; the wide form produces n=0 cells and must filter
    them — otherwise mean_e6 divides by zero and the rank-ordered CI
    indexes shift. Differential vs a DuckDB oracle restricted to the
    tiny fixture."""
    import duckdb

    from tests.oracle_harness import assert_frames_match, run_duckdb
    from project_crypto_data_engineering_gcp_spark.plans import all_queries

    src_dir = "/root/testdata/sf0.001"
    d = str(tmp_path)
    con = duckdb.connect()
    # one priority with ONE order (empty replicas guaranteed), the rest
    # of the table intact
    con.execute(
        f"""COPY (
            SELECT * FROM read_parquet('{src_dir}/orders.parquet')
            WHERE o_orderpriority <> '1-URGENT'
               OR o_orderkey = (
                    SELECT MIN(o_orderkey)
                    FROM read_parquet('{src_dir}/orders.parquet')
                    WHERE o_orderpriority = '1-URGENT')
        ) TO '{d}/orders.parquet' (FORMAT PARQUET)"""
    )
    for t in ("region", "nation", "customer", "supplier", "part",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"""COPY (SELECT * FROM read_parquet('{src_dir}/{t}.parquet'))
                TO '{d}/{t}.parquet' (FORMAT PARQUET)"""
        )
    q = all_queries()["a23_bootstrap_ci"]
    assert_frames_match(
        q.fn(spark, d), run_duckdb(q.oracle, d), "a23 single-order prio"
    )


def test_target_encoding_is_leakage_free(spark):
    """Differential check of the out-of-fold property: for one
    (nation, fold) cell, recompute the smoothed encoding from a pandas
    groupby that EXCLUDES that fold — must match the query's table."""
    import duckdb

    from project_crypto_data_engineering_gcp_spark.plans import all_queries

    sf = "/root/testdata/sf0.01"
    got = {
        (r["c_nationkey"], r["fold"]): (r["n_oof"], r["enc_cents_e6"])
        for r in all_queries()["feat_target_encoding"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    pdf = con.execute(f"""
        SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
               ('0x' || substr(md5('tefold-v1:' || CAST(o.o_orderkey AS VARCHAR)), 1, 15))::BIGINT % 5 AS fold,
               CAST(CAST(o.o_totalprice * 100 AS DECIMAL(18,0)) AS BIGINT) AS cents
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/customer.parquet') c ON c.c_custkey = o.o_custkey
    """).df()
    gmean_e6 = int(pdf["cents"].sum()) * 1000000 // len(pdf)
    for nation, fold in [(0, 0), (7, 3), (24, 4)]:
        oof = pdf[(pdf["nation"] == nation) & (pdf["fold"] != fold)]
        n_oof = len(oof)
        enc = (int(oof["cents"].sum()) * 1000000 + 100 * gmean_e6) // (n_oof + 100)
        assert got[(nation, fold)] == (n_oof, enc), (nation, fold)


def test_roc_auc_matches_pandas_average_rank(spark):
    """Differential: the tie-corrected rank-sum AUC must equal the
    textbook formulation with pandas average ranks (floor-divided into
    ppm the same way)."""
    import duckdb

    from project_crypto_data_engineering_gcp_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_pos"], r["n_neg"], r["auc_ppm"])
        for r in all_queries()["a24_roc_auc"].fn(spark, sf).collect()
    }
    con = duckdb.connect()
    pdf = con.execute(f"""
        SELECT event_type,
               CAST(CAST(value * 1000000 AS DECIMAL(18,0)) AS BIGINT) AS v
        FROM read_parquet('{sf}/events.parquet')
    """).df()
    ranks2 = (pdf["v"].rank(method="average") * 2).astype("int64")
    n = len(pdf)
    for etype, (n_pos, n_neg, auc_ppm) in got.items():
        pos = pdf["event_type"] == etype
        assert (int(pos.sum()), n - int(pos.sum())) == (n_pos, n_neg)
        r2 = int(ranks2[pos].sum())
        expect = (r2 - n_pos * (n_pos + 1)) * 1000000 // (2 * n_pos * n_neg)
        assert expect == auc_ppm, etype


def test_pr_auc_zero_positives_guard(spark, tmp_path):
    """a27_pr_auc on a slice with NO positive ('purchase') rows must
    yield NULL ap_ppm in BOTH engines — unguarded, DuckDB raised a
    division-by-zero while Spark NULLed, an engine-divergent failure
    mode (ADVICE r8)."""
    import datetime

    import duckdb

    from project_crypto_data_engineering_gcp_spark.plans.corpus import get_query

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, datetime.datetime(2025, 1, 1, 0, 0, 0), 10, "view", 0.25, "{}"),
            (2, datetime.datetime(2025, 1, 1, 0, 1, 0), 11, "click", 0.75, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    q = get_query("a27_pr_auc")
    row = q.fn(spark, sf_dir).collect()[0]
    assert row["n_pos"] == 0 and row["n"] == 2 and row["ap_ppm"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    duck = con.execute(q.oracle).df()
    con.close()
    assert duck["n_pos"][0] == 0 and duck["ap_ppm"].isna().all()


def test_mann_whitney_single_nation_guard(spark, tmp_path):
    """a30_mann_whitney_u on a slice where ONE nation holds every
    customer (n_out = 0) must yield NULL u_ppm in BOTH engines instead
    of a DuckDB division-by-zero (code-review r8; a27 doctrine)."""
    import duckdb

    from project_crypto_data_engineering_gcp_spark.plans.corpus import get_query

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, 7, 100.50), (2, 7, -3.25), (3, 7, 8.00)],
        "c_custkey long, c_nationkey long, c_acctbal double",
    ).write.parquet(f"{sf_dir}/customer.parquet")

    q = get_query("a30_mann_whitney_u")
    row = q.fn(spark, sf_dir).collect()[0]
    assert row["n_in"] == 3 and row["n_out"] == 0 and row["u_ppm"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW customer AS SELECT * FROM"
        f" read_parquet('{sf_dir}/customer.parquet/*.parquet')"
    )
    duck = con.execute(q.oracle).df()
    con.close()
    assert duck["n_out"][0] == 0 and duck["u_ppm"].isna().all()


def test_cramers_v_degenerate_table_guard(spark, tmp_path):
    """a32_cramers_v_sq on a slice with a SINGLE event_type
    (min(r-1, c-1) = 0) must yield NULL v_sq_ppm in BOTH engines
    (code-review r8; a27 doctrine)."""
    import datetime

    import duckdb

    from project_crypto_data_engineering_gcp_spark.plans.corpus import get_query

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [
            (1, datetime.datetime(2025, 1, 1, 2, 0, 0), 10, "view", 0.25, "{}"),
            (2, datetime.datetime(2025, 1, 1, 14, 0, 0), 11, "view", 0.75, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf_dir}/events.parquet")

    q = get_query("a32_cramers_v_sq")
    row = q.fn(spark, sf_dir).collect()[0]
    assert row["n_rows_dim"] == 1 and row["v_sq_ppm"] is None

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM"
        f" read_parquet('{sf_dir}/events.parquet/*.parquet')"
    )
    duck = con.execute(q.oracle).df()
    con.close()
    assert duck["n_rows_dim"][0] == 1 and duck["v_sq_ppm"].isna().all()


def test_referential_integrity_empty_child_guard(spark, tmp_path):
    """dq_referential_integrity on a slice with an EMPTY child table
    must agree between engines: n_orphans 0 (not NULL) and NULL
    orphan_ppm on the empty child's edges (code-review r8 second pass;
    a27 doctrine)."""
    import duckdb

    from project_crypto_data_engineering_gcp_spark.plans.corpus import get_query

    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(1, 1)], "n_nationkey long, n_regionkey long"
    ).write.parquet(f"{sf_dir}/nation.parquet")
    spark.createDataFrame(
        [(10, 1, 5.0)], "c_custkey long, c_nationkey long, c_acctbal double"
    ).write.parquet(f"{sf_dir}/customer.parquet")
    spark.createDataFrame(
        [(20, 1)], "s_suppkey long, s_nationkey long"
    ).write.parquet(f"{sf_dir}/supplier.parquet")
    spark.createDataFrame([(30,)], "p_partkey long").write.parquet(
        f"{sf_dir}/part.parquet"
    )
    spark.createDataFrame(
        [(40, 10)], "o_orderkey long, o_custkey long"
    ).write.parquet(f"{sf_dir}/orders.parquet")
    # EMPTY lineitem — the degenerate child
    spark.createDataFrame(
        [], "l_orderkey long, l_partkey long, l_suppkey long"
    ).write.parquet(f"{sf_dir}/lineitem.parquet")

    q = get_query("dq_referential_integrity")
    rows = {r["edge"]: r for r in q.fn(spark, sf_dir).collect()}
    li_edge = rows["lineitem.l_orderkey->orders"]
    assert li_edge["n_child"] == 0
    assert li_edge["n_orphans"] == 0
    assert li_edge["orphan_ppm"] is None

    con = duckdb.connect()
    for t in ("nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{sf_dir}/{t}.parquet/*.parquet')"
        )
    duck = con.execute(q.oracle).df().set_index("edge")
    con.close()
    d = duck.loc["lineitem.l_orderkey->orders"]
    assert int(d["n_orphans"]) == 0
    import pandas as pd

    assert pd.isna(d["orphan_ppm"])
