"""Relational surface batch 2: the classic multi-join decision-support
shapes (TPC-H Q2/Q7/Q8/Q18/Q16 analogs, adapted to the fixture star
schema — it has no partsupp/commitdate, so Q2/Q21 are re-expressed over
lineitem observations).

SURVEY §2.7: the reference delegates every query-time join to OpenSearch
(which cannot join at all); these run the full fact-to-many-dims shapes
a warehouse user expects.

Scale notes: nation/region are broadcast (25/5 rows at every SF —
genuinely fixed-size dims). supplier/part/customer joins stay shuffle
equi-joins: they grow with SF, so hinting them broadcast would be wrong
at 100 TB; AQE converts them when a filter makes a side small. The Q18
shape pre-aggregates lineitem per order BEFORE joining orders/customer —
the join moves one row per qualifying order, not raw lineitems.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

def _revenue():
    # built lazily: module import happens before any SparkSession exists
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analog without partsupp: per size-10 part, the supplier with
    the lowest observed unit price in lineitem (argmin via row_number,
    suppkey tiebreak). The window runs on the (part, supplier) pre-
    aggregate, not raw lineitems."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 10)
    supp = load_table(spark, sf_dir, "supplier")
    # per-part argmin is independent across parts: prune lineitem to the
    # qualifying parts FIRST (broadcast semi join) so the aggregate and
    # window run on ~2% of the fact table
    li = li.join(
        F.broadcast(part.select("p_partkey")),
        li["l_partkey"] == F.col("p_partkey"),
        "left_semi",
    )
    # floor-truncate to 4 decimals instead of ROUND: both engines floor
    # the SAME IEEE double, whereas ROUND's tie handling differs (Spark
    # HALF_UP on the decimal expansion vs DuckDB's float rounding) and
    # flipped the 4th decimal on one sf0.1 part
    unit = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(
            (
                F.floor(
                    F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                    * 10000
                )
                / 10000.0
            ).alias("unit_price")
        )
    )
    w = Window.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    best = (
        unit.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
    return (
        best.join(part, best["l_partkey"] == part["p_partkey"])
        .join(supp, best["l_suppkey"] == supp["s_suppkey"])
        .select("p_partkey", "p_name", "s_name", "unit_price")
        .orderBy("p_partkey")
    )


def volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7: shipping volume between NATION_1 and NATION_2 (both
    directions) by ship year. nation is broadcast; the fact joins are
    keyed shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(supp, li["l_suppkey"] == supp["s_suppkey"])
        .join(n1, supp["s_nationkey"] == F.col("s_nk"))
        .join(n2, cust["c_nationkey"] == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        pairs.groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.round(F.sum(_revenue()), 2).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8: NATION_0 suppliers' share of revenue from ASIA customers'
    orders, by order year. One pass computes numerator and denominator
    with a conditional sum — no second scan, no self-join."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    cust_region = (
        cust.join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .join(region, nation["n_regionkey"] == region["r_regionkey"])
        .filter(F.col("r_name") == "ASIA")
        .select("c_custkey")
    )
    supp_nation = supp.join(
        nation.select(
            F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
        ),
        supp["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    rows = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust_region, orders["o_custkey"] == cust_region["c_custkey"], "left_semi")
        .join(supp_nation, li["l_suppkey"] == supp_nation["s_suppkey"])
    )
    return (
        rows.groupBy(F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_0", _revenue()).otherwise(0.0))
                / F.sum(_revenue()),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def large_quantity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: customers whose orders total > 250 units. lineitem is
    reduced to one row per qualifying order before any dimension join;
    top-100 by quantity (TakeOrderedAndProject)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        big.join(orders, big["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty"
        )
        .orderBy(F.col("sum_qty").desc(), "o_orderkey")
        .limit(100)
    )


def supplier_diversity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 analog: distinct suppliers observed shipping each part brand
    (excluding Brand#3x), count-desc. Distinct-agg over the joined
    (brand, suppkey) pairs — the join projects only the two columns."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(~F.col("p_brand").like("Brand#3%"))
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand")
    )


def grouping_sets_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form rollup/cube specialize):
    totals by (status, priority), by status alone, and grand total, with
    grouping_id disambiguating null-as-value from null-as-aggregated.
    One Expand + one aggregate — same plan family as cube/rollup."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus", "o_orderpriority"], ["o_orderstatus"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy("gid", "o_orderstatus", "o_orderpriority")
    )


QUERIES = {
    "min_cost_supplier": min_cost_supplier,
    "volume_shipping": volume_shipping,
    "nation_market_share": nation_market_share,
    "large_quantity_customers": large_quantity_customers,
    "supplier_diversity_by_brand": supplier_diversity_by_brand,
    "grouping_sets_status": grouping_sets_status,
}

ORACLE = {
    "min_cost_supplier": """
        WITH unit AS (
            SELECT l_partkey, l_suppkey,
                   FLOOR(MIN(l_extendedprice / l_quantity) * 10000)
                       / 10000.0 AS unit_price
            FROM lineitem GROUP BY 1, 2
        ),
        best AS (
            SELECT * FROM unit
            QUALIFY row_number() OVER (
                PARTITION BY l_partkey ORDER BY unit_price, l_suppkey) = 1
        )
        SELECT p_partkey, p_name, s_name, unit_price
        FROM best
        JOIN part ON l_partkey = p_partkey AND p_size = 10
        JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY p_partkey
    """,
    "volume_shipping": """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l_shipdate) AS l_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """,
    "nation_market_share": """
        SELECT year(o_orderdate) AS o_year,
               ROUND(SUM(CASE WHEN n_sup.n_name = 'NATION_0'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0.0 END)
                     / SUM(l_extendedprice * (1 - l_discount)), 6) AS mkt_share
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation n_sup ON s_nationkey = n_sup.n_nationkey
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
        )
        GROUP BY 1 ORDER BY 1
    """,
    "large_quantity_customers": """
        WITH big AS (
            SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS sum_qty
            FROM lineitem GROUP BY 1 HAVING ROUND(SUM(l_quantity), 2) > 250
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM big
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY sum_qty DESC, o_orderkey LIMIT 100
    """,
    "supplier_diversity_by_brand": """
        SELECT p_brand, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand NOT LIKE 'Brand#3%'
        GROUP BY 1 ORDER BY supplier_cnt DESC, p_brand
    """,
    "grouping_sets_status": """
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               COUNT(*) AS n,
               ROUND(SUM(o_totalprice), 2) AS total
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        ORDER BY gid, o_orderstatus, o_orderpriority
    """,
}
