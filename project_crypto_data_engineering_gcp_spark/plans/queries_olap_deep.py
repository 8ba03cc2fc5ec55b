"""Deeper OLAP query shapes (TPC-H Q2/Q4/Q7/Q8/Q10/Q12/Q14/Q15/Q17/Q19/Q22
adapted to the testdata's columns — no partsupp/commitdate/shipmode here,
so each query keeps the *plan shape* of its namesake on the columns that
exist).

Together with queries_olap.py this completes the classic decision-support
menu: EXISTS/NOT-EXISTS rewrites, disjunctive predicate pushdown,
conditional aggregation, correlated-average thresholds, argmin-per-group,
scalar-subquery maxima, and multi-dimension nation-pair rollups. All money
math goes through the exact-decimal parity scheme (functions/numeric.py);
counts of CASE-sums are cast to BIGINT on the DuckDB side (its SUM(int)
returns HUGEINT).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.numeric import dec, dsum_expr_sql
from ..sources.tables import load_table
from .corpus import corpus_query

_REVENUE_DEC = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _revenue() -> F.Column:
    return dec("l_extendedprice", 12, 2) * (F.lit(1) - dec("l_discount", 4, 2))


@corpus_query(
    "q2_cheapest_supplier",
    oracle="""
    WITH shipped AS (
        SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    ), ranked AS (
        SELECT sh.l_partkey AS p_partkey, su.s_suppkey, su.s_name, su.s_acctbal,
               ROW_NUMBER() OVER (
                   PARTITION BY sh.l_partkey ORDER BY su.s_acctbal, su.s_suppkey
               ) AS rn
        FROM shipped sh JOIN supplier su ON su.s_suppkey = sh.l_suppkey
    )
    SELECT p_partkey, s_suppkey, s_name, s_acctbal FROM ranked WHERE rn = 1
    """,
)
def q2_cheapest_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q2 shape (argmin-per-group join-back): for every part, the
    lowest-acctbal supplier that ever shipped it, suppkey as tiebreaker.
    The DISTINCT shrinks lineitem to the (part, supplier) edge set before
    the supplier dim (broadcast) and the ranking window touch it."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    shipped = li.select("l_partkey", "l_suppkey").distinct()
    w = Window.partitionBy("l_partkey").orderBy("s_acctbal", "s_suppkey")
    return (
        shipped.join(F.broadcast(supp), supp.s_suppkey == shipped.l_suppkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            "s_suppkey",
            "s_name",
            "s_acctbal",
        )
    )


@corpus_query(
    "q4_priority_with_returns",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey AND l_returnflag = 'R'
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q4 shape: EXISTS decorrelated to a LEFT SEMI join — order
    counts by priority for a half-year window, keeping only orders with
    at least one returned line. The semi join never widens orders and
    deduplicates lineitem matches for free."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "leftsemi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@corpus_query(
    "q7_nation_trade_flows",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(vol) AS DOUBLE) AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l_shipdate) AS INTEGER) AS l_year,
               {_REVENUE_DEC} AS vol
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) flows
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def q7_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q7 shape: bidirectional nation-pair trade volume by ship
    year. Supplier+nation and customer+nation sides both broadcast (the
    nation filter prunes them to ~1/25 each); lineitem-orders is the only
    big join, and the pair filter is pushed below the aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    supp_side = (
        load_table(spark, sf_dir, "supplier")
        .join(
            nation.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            ),
            F.col("s_nationkey") == F.col("s_nk"),
        )
        .filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))
        .select("s_suppkey", "supp_nation")
    )
    cust_side = (
        load_table(spark, sf_dir, "customer")
        .join(
            nation.select(
                F.col("n_nationkey").alias("c_nk"),
                F.col("n_name").alias("cust_nation"),
            ),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .filter(F.col("cust_nation").isin("NATION_1", "NATION_2"))
        .select("c_custkey", "cust_nation")
    )
    pair_ok = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_side), li.l_suppkey == supp_side.s_suppkey)
        .join(F.broadcast(cust_side), orders.o_custkey == cust_side.c_custkey)
        .filter(pair_ok)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@corpus_query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol END) AS DOUBLE)
               / CAST(SUM(vol) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
               n1.n_name AS supp_nation,
               {_REVENUE_DEC} AS vol
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n1 ON n1.n_nationkey = s_nationkey
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n2 ON n2.n_nationkey = c_nationkey
        JOIN region ON r_regionkey = n2.n_regionkey
        WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
    ) all_sales
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q8 shape: one nation's share of PROMO-part revenue sold into
    EUROPE, by order year. The numerator is a null-else conditional
    decimal SUM (SUM skips the non-matching NULLs exactly like DuckDB);
    both sums are exact decimals so the final double ratio is
    bit-deterministic. Part/supplier/customer dims all broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    supp_side = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("s_nk"),
                F.col("n_name").alias("supp_nation"),
            )
        ),
        F.col("s_nationkey") == F.col("s_nk"),
    )
    cust_side = (
        load_table(spark, sf_dir, "customer")
        .join(
            F.broadcast(
                nation.join(region, nation.n_regionkey == region.r_regionkey).select(
                    F.col("n_nationkey").alias("c_nk")
                )
            ),
            F.col("c_nationkey") == F.col("c_nk"),
        )
        .select("c_custkey")
    )
    vol = _revenue()
    sales = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(supp_side), supp_side.s_suppkey == li.l_suppkey)
        .join(F.broadcast(cust_side), cust_side.c_custkey == orders.o_custkey)
        .select(
            F.year("o_orderdate").alias("o_year"),
            F.col("supp_nation"),
            vol.alias("vol"),
        )
    )
    return sales.groupBy("o_year").agg(
        (
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))).cast(
                "double"
            )
            / F.sum("vol").cast("double")
        ).alias("mkt_share")
    )


@corpus_query(
    "q10_returned_revenue_topk",
    oracle=f"""
    SELECT c_custkey, c_name, n_name,
           CAST(SUM({_REVENUE_DEC}) AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON o_custkey = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON n_nationkey = c_nationkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q10 shape: top-20 customers by revenue lost to returns in a
    half-year window — selective fact filter, star join with broadcast
    dims, grouped exact-decimal revenue, TakeOrderedAndProject top-k with
    a custkey tiebreaker (exact sums make the ordering engine-stable)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), cust.c_custkey == orders.o_custkey)
        .join(F.broadcast(nation), nation.n_nationkey == cust.c_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@corpus_query(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q12 shape: conditional aggregation — per line status, how
    many 1996-shipped lines belong to urgent/high vs other orders. The
    CASE-sums are integer counts (no float order-dependence); orders
    carries only two columns into the join after pruning."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@corpus_query(
    "q14_promo_revenue_by_month",
    oracle=f"""
    SELECT strftime(l_shipdate, '%Y-%m') AS ym,
           CAST(100 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN vol END)
                           AS DOUBLE)
                / CAST(SUM(vol) AS DOUBLE) AS DOUBLE) AS promo_share
    FROM (
        SELECT l_shipdate, p_type, {_REVENUE_DEC} AS vol
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    ) sales
    GROUP BY ym
    """,
)
def q14_promo_revenue_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q14 shape, widened to a per-month series: PROMO parts' share
    of each 1996 month's revenue. Conditional decimal numerator over an
    exact decimal denominator; part broadcasts; one shuffle (the month
    aggregate)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    vol = _revenue()
    sales = li.join(F.broadcast(part), part.p_partkey == li.l_partkey).select(
        F.date_format("l_shipdate", "yyyy-MM").alias("ym"),
        F.col("p_type"),
        vol.alias("vol"),
    )
    return sales.groupBy("ym").agg(
        (
            F.lit(100)
            * F.sum(F.when(F.col("p_type") == "PROMO", F.col("vol"))).cast("double")
            / F.sum("vol").cast("double")
        )
        .cast("double")
        .alias("promo_share")
    )


@corpus_query(
    "q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey, CAST(SUM({_REVENUE_DEC}) AS DOUBLE) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q15 shape: the supplier(s) hitting the MAX of a derived
    per-supplier revenue view — scalar subquery over an aggregate of an
    aggregate. The revenue frame is computed once and reused for both the
    max and the equality filter (cached to avoid double lineage); the
    double equality is safe because both sides come from the same exact
    decimal sums."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(F.sum(_revenue()).cast("double").alias("total_revenue"))
        .cache()
    )
    rev.count()  # populate before both consumers race the cache
    best = rev.agg(F.max("total_revenue").alias("best_revenue"))
    return (
        rev.join(F.broadcast(best), F.col("total_revenue") == F.col("best_revenue"))
        .join(F.broadcast(supp), supp.s_suppkey == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@corpus_query(
    "q17_small_quantity_revenue",
    oracle="""
    WITH pq AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               CAST(COUNT(*) AS DECIMAL(10,0)) AS n_lines
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN pq ON pq.l_partkey = l.l_partkey
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * 5 * pq.n_lines < pq.sum_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q17 shape: revenue from orders below 20% of the part's
    average quantity. The correlated AVG threshold is decorrelated into a
    per-part aggregate joined back; the < comparison is done in cleared
    form (5 * n * qty < sum_qty) so it is exact integer/decimal math in
    both engines — no float threshold to disagree on."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pq = li.groupBy(F.col("l_partkey").alias("pq_partkey")).agg(
        F.sum(dec("l_quantity", 18, 2)).alias("sum_qty"),
        F.count(F.lit(1)).cast("decimal(10,0)").alias("n_lines"),
    )
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(pq, F.col("pq_partkey") == li.l_partkey)
        .filter(dec("l_quantity", 18, 2) * 5 * F.col("n_lines") < F.col("sum_qty"))
        .agg(
            (F.sum(dec("l_extendedprice", 12, 2)).cast("double") / 7.0)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@corpus_query(
    "q19_disjunctive_predicates",
    oracle=f"""
    SELECT CAST(SUM({_REVENUE_DEC}) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q19 shape: three OR'd brand/size/quantity bands over the
    part-lineitem join. Catalyst extracts the common join key and pushes
    the per-side conjuncts (brand/size unions to the part scan, quantity
    union to lineitem) below the join before evaluating the residual."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    q, sz, br = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bands = (
        ((br == "Brand#12") & sz.between(1, 5) & q.between(1, 11))
        | ((br == "Brand#23") & sz.between(1, 10) & q.between(10, 20))
        | ((br == "Brand#34") & sz.between(1, 15) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .filter(bands)
        .agg(F.sum(_revenue()).cast("double").alias("revenue"))
    )


@corpus_query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q6: the pure scan-filter-aggregate — discount revenue that
    would be forfeited by dropping mid-band discounts on small-quantity
    1996 lines. All three predicates push to the parquet scan (date range,
    discount band, quantity cap); no join, no shuffle beyond the final
    2-phase aggregate. The benchmark's floor for scan throughput."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.sum(dec("l_extendedprice", 12, 2) * dec("l_discount", 4, 2))
        .cast("double")
        .alias("revenue")
    )


@corpus_query(
    "q9_product_profit",
    oracle=f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           CAST(SUM({_REVENUE_DEC}
                    - CAST(p_retailprice AS DECIMAL(12,2))
                      * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS profit
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    JOIN orders ON o_orderkey = l_orderkey
    WHERE p_name LIKE '%red%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q9 shape: profit on red parts by supplier nation and order
    year. The reference schema has no partsupp, so per-unit cost is the
    part's retail price (same plan shape: 4 broadcast dims + the one big
    lineitem-orders join). The name LIKE prunes part before broadcast;
    profit stays exact decimal until the final double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    supp = load_table(spark, sf_dir, "supplier")
    profit = _revenue() - dec("p_retailprice", 12, 2) * dec("l_quantity", 18, 2)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .join(F.broadcast(supp), supp.s_suppkey == li.l_suppkey)
        .join(F.broadcast(nation), nation.n_nationkey == supp.s_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@corpus_query(
    "q11_important_parts",
    oracle="""
    WITH base AS (
        SELECT l_partkey,
               CAST(p_retailprice AS DECIMAL(12,2))
                   * CAST(l_quantity AS DECIMAL(18,2)) AS v
        FROM lineitem JOIN part ON p_partkey = l_partkey
    ),
    value_by_part AS (
        SELECT l_partkey, CAST(SUM(v) AS DOUBLE) AS part_value
        FROM base GROUP BY l_partkey
    ),
    total AS (SELECT CAST(SUM(v) AS DOUBLE) * 0.0006 AS threshold FROM base)
    SELECT l_partkey, part_value
    FROM value_by_part, total
    WHERE part_value > threshold
    ORDER BY part_value DESC, l_partkey
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q11 shape: parts whose shipped inventory value exceeds
    0.06% of the total (retailprice x quantity standing in for partsupp's
    supplycost x availqty). The per-part and global sums share one scanned
    base frame (cached, eagerly populated); both are exact decimals, so
    threshold and values cast to the same doubles in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    base = (
        li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
        .select(
            "l_partkey",
            (dec("p_retailprice", 12, 2) * dec("l_quantity", 18, 2)).alias("v"),
        )
        .cache()
    )
    base.count()  # populate before the two aggregates race the cache
    by_part = base.groupBy("l_partkey").agg(
        F.sum("v").cast("double").alias("part_value")
    )
    threshold = base.agg(
        (F.sum("v").cast("double") * F.lit(0.0006)).alias("threshold")
    )
    return (
        by_part.crossJoin(F.broadcast(threshold))
        .filter(F.col("part_value") > F.col("threshold"))
        .select("l_partkey", "part_value")
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


@corpus_query(
    "q21_sole_returning_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q21 shape: suppliers solely responsible for returns on
    finalized multi-supplier orders ('R' lines standing in for the
    missing receipt-after-commit columns). The correlated EXISTS /
    NOT-EXISTS pair decorrelates to a LEFT SEMI + LEFT ANTI self-join on
    lineitem, each shrunk to its DISTINCT (orderkey, suppkey) edge set
    before shuffling, then top-20 via TakeOrderedAndProject."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    orders_f = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = (
        li.select(
            F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
        ).distinct()
    )
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
        .distinct()
    )
    return (
        l1.join(orders_f, l1.l_orderkey == F.col("o_orderkey"))
        .join(
            l2,
            (F.col("k2") == F.col("l_orderkey")) & (F.col("s2") != F.col("l_suppkey")),
            "leftsemi",
        )
        .join(
            l3,
            (F.col("k3") == F.col("l_orderkey")) & (F.col("s3") != F.col("l_suppkey")),
            "leftanti",
        )
        .join(F.broadcast(supp), supp.s_suppkey == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@corpus_query(
    "q22_dormant_rich_customers",
    oracle="""
    WITH avg_bal AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
                   / COUNT(*) AS threshold
        FROM customer WHERE c_acctbal > 0
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
    FROM customer c, avg_bal
    WHERE c.c_acctbal > avg_bal.threshold
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q22 shape: above-average-balance customers who never
    ordered, rolled up by segment. The global average is an exact
    decimal-sum/count scalar broadcast back via cross join (no driver
    collect); the NOT EXISTS is a LEFT ANTI join on orders. The threshold
    double is bit-identical across engines, so the > cut is stable."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    threshold = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (F.sum(dec("c_acctbal", 18, 2)).cast("double") / F.count(F.lit(1))).alias(
                "threshold"
            )
        )
    )
    return (
        cust.crossJoin(F.broadcast(threshold))
        .filter(F.col("c_acctbal") > F.col("threshold"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal", 18, 2)).cast("double").alias("total_bal"),
        )
    )


# ------------------------------------------------------------- skyline


@corpus_query(
    "skyline_pareto_parts",
    oracle="""
    SELECT p_partkey, p_name, p_retailprice, p_size
    FROM part p
    WHERE NOT EXISTS (
        SELECT 1 FROM part q
        WHERE (q.p_retailprice < p.p_retailprice AND q.p_size >= p.p_size)
           OR (q.p_retailprice <= p.p_retailprice AND q.p_size > p.p_size))
    """,
)
def skyline_pareto_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (cheaper price, larger size). The oracle states the definition as a
    quadratic NOT EXISTS; the Spark plan computes the same set in
    O(n log n) with ZERO pairwise work — the classic sort-scan skyline:

      1. collapse to max(size) per distinct price (hash aggregate),
      2. one window over the price-ordered distinct-price frame:
         running max of size over prices < here (``cum_lt``) and
         <= here (``cum_le``),
      3. a part is on the frontier iff its size beats every strictly
         cheaper part (size > cum_lt) and nothing at its own price is
         strictly larger (size == cum_le).

    The window is unpartitioned but runs on the DISTINCT-PRICE aggregate,
    not the fact table — dimension-sized input, same justification as the
    heavy-hitters re-rank. If the distinct-price domain itself were
    huge, the prefix-max is associative and two-passes (per-range max,
    then prefix over range boundaries) restore partitioning; the
    single-window form is the right plan below ~1e7 frontier candidates.
    Core in operators/skyline.py, differential-tested on random tied
    data against the brute-force definition."""
    from ..operators.skyline import pareto_frontier_2d

    part = load_table(spark, sf_dir, "part")
    return pareto_frontier_2d(part, "p_retailprice", "p_size").select(
        "p_partkey", "p_name", "p_retailprice", "p_size"
    )


# ------------------------------------------------ incremental maintenance


@corpus_query(
    "a12_incremental_merge",
    oracle=f"""
    SELECT o_orderpriority,
           {dsum_expr_sql('o_totalprice', 18, 2)} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def a12_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance by ALGEBRAIC PARTIAL-AGGREGATE MERGE:
    the per-priority rollup is computed as two independent partial
    aggregates — the 'base' (every month but the newest) and the 'delta'
    (the newest month only, what a daily pipeline would re-read) — then
    merged with sum-of-sums / sum-of-counts / min-of-mins / max-of-maxs.
    The oracle is the direct full recompute, so the green row PROVES the
    merge is lossless.

    This is the 100 TB pattern for maintained rollups: only the delta
    partition is re-scanned per run, the base lives as a tiny persisted
    aggregate, and the merge is a union of two aggregate frames — Spark's
    own partial/final aggregation split, reified at the pipeline level.
    The newest-month boundary comes from a 1-row aggregate broadcast back
    (no driver collect), so the split itself is plan-side and
    deterministic."""
    orders = load_table(spark, sf_dir, "orders").withColumn(
        "mon", F.date_trunc("month", F.col("o_orderdate"))
    )
    last_mon = orders.agg(F.max("mon").alias("last_mon"))
    tagged = orders.crossJoin(F.broadcast(last_mon))

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.sum(dec("o_totalprice", 18, 2)).alias("p_rev"),
            F.count(F.lit(1)).alias("p_n"),
            F.min("o_totalprice").alias("p_min"),
            F.max("o_totalprice").alias("p_max"),
        )

    base = partial(tagged.filter(F.col("mon") < F.col("last_mon")))
    delta = partial(tagged.filter(F.col("mon") == F.col("last_mon")))
    return (
        base.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("p_rev").cast("double").alias("revenue"),
            F.sum("p_n").cast("bigint").alias("n_orders"),
            F.min("p_min").alias("min_price"),
            F.max("p_max").alias("max_price"),
        )
    )


# --------------------------------------------- exact-moment correlation


def _corr_moments_sql() -> str:
    cents = "CAST(l_quantity * 100 AS DECIMAL(18,0))"
    price = "CAST(l_extendedprice * 100 AS DECIMAL(18,0))"
    return f"""
    WITH m AS (
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM({cents}) AS DECIMAL(38,0)) AS sx,
               CAST(SUM({price}) AS DECIMAL(38,0)) AS sy,
               CAST(SUM({cents} * {price}) AS DECIMAL(38,0)) AS sxy,
               CAST(SUM({cents} * {cents}) AS DECIMAL(38,0)) AS sxx,
               CAST(SUM({price} * {price}) AS DECIMAL(38,0)) AS syy
        FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, n,
           ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
                 6) AS corr_qty_price
    FROM m
    """


@corpus_query("a13_correlation_moments", oracle=_corr_moments_sql())
def a13_correlation_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation per group WITHOUT the built-in ``corr`` — via
    exact integer/decimal moments (n, Σx, Σy, Σxy, Σx², Σy²), the final
    double formula applied once per group. The built-in streams doubles
    and its result depends on partition merge order (Welford merges);
    cent-scaled DECIMAL(38,0) moments are associative-exact, so this is
    the bit-stable-under-repartitioning formulation — the same trick the
    corpus uses for sums, extended to second moments. Moments partial-
    aggregate map-side, so the plan is one scan + one bounded shuffle;
    the correlation arithmetic runs on 3 group rows."""
    li = load_table(spark, sf_dir, "lineitem")
    cents = (F.col("l_quantity") * 100).cast("decimal(18,0)")
    price = (F.col("l_extendedprice") * 100).cast("decimal(18,0)")
    m = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(cents).cast("decimal(38,0)").alias("sx"),
        F.sum(price).cast("decimal(38,0)").alias("sy"),
        F.sum(cents * price).cast("decimal(38,0)").alias("sxy"),
        F.sum(cents * cents).cast("decimal(38,0)").alias("sxx"),
        F.sum(price * price).cast("decimal(38,0)").alias("syy"),
    )
    n, sx, sy = (F.col(c).cast("double") for c in ("n", "sx", "sy"))
    sxy, sxx, syy = (F.col(c).cast("double") for c in ("sxy", "sxx", "syy"))
    return m.select(
        "l_returnflag",
        "n",
        F.round(
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)),
            6,
        ).alias("corr_qty_price"),
    )


# ------------------------------------------------------ share of parent


@corpus_query(
    "a14_share_of_parent",
    oracle=f"""
    WITH per_nation AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               {dsum_expr_sql('o_totalprice', 18, 2)} AS revenue
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2
    )
    SELECT region, nation, revenue,
           ROUND(revenue / SUM(revenue) OVER (PARTITION BY region), 6)
               AS share_of_region,
           ROUND(revenue / SUM(revenue) OVER (), 6) AS share_of_total
    FROM per_nation
    """,
)
def a14_share_of_parent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent across a dimension hierarchy (nation within
    region within grand total) — the drill-down ratio every BI rollup
    needs, as two window sums OVER the already-aggregated frame: the
    fact table is scanned once into the (region, nation) aggregate, and
    the ratios ride that dimension-sized output (the empty-frame total
    is the broadcast-ish degenerate window, fine at dimension size).
    Revenue is an exact decimal sum; the ratio is one double division of
    identical exact operands in both engines, so ROUND(.,6) is stable.

    The share-of-total window mirrors the reference's market-dominance
    denominator quirk Q5 (SURVEY §2.11) at hierarchy depth 2."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    per_nation = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"), F.col("n_name").alias("nation")
        )
        .agg(F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return per_nation.select(
        "region",
        "nation",
        "revenue",
        F.round(
            F.col("revenue") / F.sum("revenue").over(w_region), 6
        ).alias("share_of_region"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias(
            "share_of_total"
        ),
    )


# ------------------------------------------------- CUBE / grouping sets


@corpus_query(
    "a22_sales_cube",
    oracle="""
    SELECT n_name, o_orderpriority,
           (CASE WHEN n_name IS NULL THEN 2 ELSE 0 END
            + CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(CAST(o_totalprice * 100 AS DECIMAL(18,0)) AS BIGINT))
               AS BIGINT) AS revenue_cents
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY CUBE (n_name, o_orderpriority)
    -- Spark's grouping-sets implementation (Expand + keyed aggregate)
    -- emits NO rows over an EMPTY input, unlike the SQL-standard
    -- grand-total row; the guard pins both engines to Spark's
    -- semantics (found by tools/corpus_fuzz.py --crush-rows 0, r9)
    HAVING COUNT(*) > 0
    """,
)
def a22_sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over (nation x order priority) with grand total and both
    one-dimension subtotals in a single pass — the grouping-sets family
    (df.cube / GROUP BY CUBE) that every BI export needs, here over the
    3-table orders->customer->nation join.

    Scale shape: Spark compiles cube() to ONE Expand operator (each
    input row is replicated into the 4 grouping sets map-side) feeding a
    single partial-aggregated shuffle — the subtotal rows cost one extra
    map-side projection each, NOT extra passes over the fact table, and
    partial aggregation collapses every task's output to at most
    |groups| rows before the exchange. At 100 TB this is scan + join +
    4x-expand + partial agg + one exchange of a few thousand group
    rows. nation (25 rows) is broadcast;
    customer is a DATA-SIZED dimension (1.5M rows/SF) so it joins on the
    shuffled o_custkey equi-key — deliberately NOT broadcast (AQE may
    still choose broadcast at small SFs where it fits).

    gid disambiguates genuine dimension values from subtotal NULLs
    (Spark's grouping_id(): first cube column = MSB). Both dims are
    non-null in the data, so the oracle reconstructs the identical id
    arithmetically from the NULL pattern — engine-neutral, avoiding any
    GROUPING() bit-order convention mismatch. Money in exact integer
    cents (zero ROUND-tie exposure).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    joined = (
        orders.join(
            customer.select("c_custkey", "c_nationkey"),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == nation.n_nationkey)
        .select(
            "n_name",
            "o_orderpriority",
            (F.col("o_totalprice") * 100)
            .cast("decimal(18,0)")
            .cast("bigint")
            .alias("cents"),
        )
    )
    return joined.cube("n_name", "o_orderpriority").agg(
        F.grouping_id().cast("bigint").alias("gid"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents").cast("bigint").alias("revenue_cents"),
    )
