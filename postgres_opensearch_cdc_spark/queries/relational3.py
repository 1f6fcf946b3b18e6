"""Relational batch 3: TPC-H Q4/Q6/Q12/Q17/Q22 analogs adapted to the
driver testdata's columns (no commit/receipt dates or ship modes — the
date-lag and priority semantics are preserved on the columns that
exist). Spark-native decision-support shapes the reference's embedded
SQL surface cannot express (SURVEY §2.7): semi-join aggregation,
selective single-pass filter aggregates, conditional two-way pivots,
correlated per-group thresholds (decorrelated to a broadcast join), and
anti-join + scalar-subquery composition. Every entry is oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

LATE_DAYS = 80  # ship-lag threshold standing in for commit<receipt


def priority_late_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analog (order priority checking): orders with at least
    one line shipped more than LATE_DAYS after the order date, counted
    per priority. EXISTS compiles to a left-semi join — the lineitem
    side is pre-filtered and only o_orderkey survives into the shuffle;
    the final agg is a 5-key partial."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(
            orders.select("o_orderkey", "o_orderdate"), li["l_orderkey"] == orders["o_orderkey"]
        )
        .filter(F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_DAYS))
        .select("l_orderkey")
        .distinct()
    )
    return (
        orders.join(late, orders["o_orderkey"] == late["l_orderkey"], "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecasting revenue change): one filter + one global
    aggregate — the canonical pushdown showcase. Every predicate
    (shipdate year, discount band, quantity cap) reaches the parquet
    scan; the plan is scan → partial sum → single-row exchange.
    The year filter targets 1995 — the fixture lineitem's shipdate
    domain is 1995-2001 (an earlier 2024 filter selected zero rows,
    making the aggregate vacuously NULL)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.02)
        & (F.col("l_discount") <= 0.06)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        )
    )


def ship_lag_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analog (shipping modes and order priority): lines
    bucketed by ship lag (on-time vs late), counting high- vs
    low-priority orders per bucket in ONE conditional aggregate after
    the join — no second pass, no pivot shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
    lag_bucket = F.when(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_DAYS), "late"
    ).otherwise("on_time")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy(lag_bucket.alias("lag_bucket"))
        .agg(
            F.sum(high.cast("long")).alias("high_priority_lines"),
            F.sum((~high).cast("long")).alias("low_priority_lines"),
        )
        .orderBy("lag_bucket")
    )


def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analog (small-quantity-order revenue): revenue from
    lines whose quantity is below half the part's average quantity,
    for one brand. The correlated per-part threshold decorrelates into
    a per-part aggregate broadcast back onto the fact scan — the
    classic rewrite Catalyst applies to correlated scalar subqueries,
    expressed explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    brand_parts = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    branded = li.join(
        F.broadcast(brand_parts), li["l_partkey"] == brand_parts["p_partkey"]
    )
    avg_qty = branded.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("qty_threshold")
    )
    return (
        branded.join(F.broadcast(avg_qty), "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("qualifying_lines"),
        )
    )


LOW_ENGAGEMENT_ORDERS = 8  # every fixture customer has SOME orders


def inactive_high_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analog (global sales opportunity): high-balance,
    low-engagement customers per nation — balance above the average
    positive balance AND fewer than LOW_ENGAGEMENT_ORDERS orders (the
    fixture has no order-less customers, so the classic anti-join is
    degenerate; the counting form keeps Q22's correlated-subquery
    shape). Composition of a 1-row broadcast scalar aggregate, a
    pre-aggregated order-count join (only (custkey, count) shuffles),
    and a small-key aggregation."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    order_cnt = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(order_cnt, cust["c_custkey"] == order_cnt["o_custkey"], "left")
        .filter(
            F.coalesce(F.col("n_orders"), F.lit(0)) < LOW_ENGAGEMENT_ORDERS
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer distribution): histogram of customers by how
    many orders they placed, including zero-order customers via the
    left outer join. Two cascaded aggregations — the first shuffles on
    o_custkey (pre-aggregated to (custkey, count) before joining the
    customer side), the second on the tiny count domain."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    order_cnt = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    return (
        cust.join(order_cnt, cust["c_custkey"] == order_cnt["o_custkey"], "left")
        .select(F.coalesce(F.col("n_orders"), F.lit(0)).alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


REVENUE_Q_START = "1996-04-01"
REVENUE_Q_END = "1996-07-01"


def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): suppliers whose quarterly shipped
    revenue equals the maximum over all suppliers. The revenue "view"
    is one filtered partial+final agg on l_suppkey; the max is a 1-row
    broadcast joined back (ties all surface, per the spec); the
    supplier dimension joins broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit(REVENUE_Q_START).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(REVENUE_Q_END).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )
    # max + equality on the UNROUNDED sums: each engine's max is bitwise
    # one of its own values, so the argmax join is exact within the
    # engine; rounding happens only at output
    max_rev = revenue.agg(F.max("revenue").alias("max_revenue"))
    return (
        revenue.join(
            F.broadcast(max_rev), revenue["revenue"] == max_rev["max_revenue"]
        )
        .join(F.broadcast(sup), revenue["l_suppkey"] == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("revenue"), 2).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


QUERIES = {
    "priority_late_orders": priority_late_orders,
    "forecast_revenue": forecast_revenue,
    "ship_lag_priority": ship_lag_priority,
    "small_quantity_revenue": small_quantity_revenue,
    "inactive_high_balance": inactive_high_balance,
    "customer_order_counts": customer_order_counts,
    "top_supplier_revenue": top_supplier_revenue,
}

ORACLE = {
    "priority_late_orders": f"""
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "forecast_revenue": """
        SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
          AND l_discount BETWEEN 0.02 AND 0.06
          AND l_quantity < 24
    """,
    "ship_lag_priority": f"""
        SELECT CASE WHEN l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY
                    THEN 'late' ELSE 'on_time' END AS lag_bucket,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 1 ELSE 0 END) AS BIGINT) AS high_priority_lines,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                             THEN 0 ELSE 1 END) AS BIGINT) AS low_priority_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "small_quantity_revenue": """
        WITH branded AS (
            SELECT l.*
            FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
            WHERE p.p_brand = 'Brand#1'
        ),
        t AS (
            SELECT l_partkey, AVG(l_quantity) * 0.5 AS qty_threshold
            FROM branded GROUP BY l_partkey
        )
        SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
               COUNT(*) AS qualifying_lines
        FROM branded b JOIN t USING (l_partkey)
        WHERE b.l_quantity < t.qty_threshold
    """,
    "inactive_high_balance": """
        SELECT c_nationkey,
               COUNT(*) AS numcust,
               ROUND(SUM(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                           WHERE c_acctbal > 0)
          AND (SELECT COUNT(*) FROM orders
               WHERE o_custkey = c_custkey) < 8
        GROUP BY c_nationkey ORDER BY c_nationkey
    """,
    "customer_order_counts": """
        WITH per_cust AS (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        SELECT c_count, COUNT(*) AS custdist
        FROM per_cust GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC
    """,
    "top_supplier_revenue": f"""
        WITH revenue AS (
            SELECT l_suppkey, SUM(l_extendedprice * (1 - l_discount)) AS rev
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '{REVENUE_Q_START}'
              AND l_shipdate < TIMESTAMP '{REVENUE_Q_END}'
            GROUP BY l_suppkey
        )
        SELECT s_suppkey, s_name, ROUND(rev, 2) AS total_revenue
        FROM revenue JOIN supplier ON l_suppkey = s_suppkey
        WHERE rev = (SELECT MAX(rev) FROM revenue)
        ORDER BY s_suppkey
    """,
}
