"""Scalar-function and subquery surface.

Covers the SQL operators embedded in the reference (SURVEY §2.5):
X5 date/interval arithmetic (create-sample-data.sh:28-36,42-49,61),
X6 string concatenation (create-sample-data.sh:67-70), plus the
subquery shapes (correlated EXISTS / IN / scalar) and CUBE that §2.7
lists as Spark-native extensions, and JSON field extraction (the
reference's JSONB → object mapping, TDD :718) over events.props.

All scalar work stays in whole-stage codegen; subqueries decorrelate in
Catalyst to joins (EXISTS → semi join, scalar agg → broadcast of a
1-row subplan) — verified in tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table


def json_extract_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSONB/object handling (TDD :718): extract a typed field from the
    events JSON payload and aggregate on it. get_json_object is
    JVM-side; for hot paths a from_json with explicit schema (done in
    the CDC envelope) is the faster form — both are exercised."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(F.col("event_id"), k.alias("k"))
        .filter(F.col("k").isNotNull() & (F.col("k") >= 50))
        .groupBy((F.col("k") % 10).alias("k_mod"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("k_mod")
    )


def date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X5: CURRENT_DATE-style interval arithmetic applied to order dates:
    shipping deadline = orderdate + 30 days, bucketed by year/month,
    plus datediff to a fixed anchor."""
    orders = load_table(spark, sf_dir, "orders")
    od = F.to_date("o_orderdate")
    return (
        orders.select(
            "o_orderkey",
            F.date_add(od, 30).alias("deadline"),
            F.year(od).alias("yr"),
            F.month(od).alias("mo"),
            F.datediff(F.lit("1998-12-31").cast("date"), od).alias("days_to_eoy"),
        )
        .filter(F.col("yr") == 1995)
        .orderBy("o_orderkey")
        .limit(100)
    )


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: '||' concatenation + casing/substring/length over customer
    names (the reference's "Cards: " || COUNT(*) summary shape)."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.concat(F.lit("Customer: "), F.upper(F.col("c_name"))).alias("label"),
            F.substring(F.col("c_name"), 1, 8).alias("prefix"),
            F.length(F.col("c_name")).cast("long").alias("name_len"),
        )
        .orderBy("c_custkey")
        .limit(50)
    )


def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS (TPC-H Q4 shape): priority counts of orders
    having at least one high-quantity lineitem. Catalyst decorrelates to
    a left-semi join on orderkey — co-partitionable at scale."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders_v
        WHERE EXISTS (
            SELECT 1 FROM lineitem_v
            WHERE l_orderkey = o_orderkey AND l_quantity >= 49
        )
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """
    )


def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join: customers holding at least one
    urgent order."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer_v
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders_v WHERE o_orderpriority = '1-URGENT'
        )
        """
    )


def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery: orders priced above the global average. The
    1-row aggregate broadcasts; the outer scan filters against it."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders_v
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders_v)
        """
    )


def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lineitems below 50%
    of their part's average quantity. Catalyst decorrelates to an
    aggregate on partkey joined back — one extra shuffle, never
    per-row subquery execution."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    return spark.sql(
        """
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem_v l1
        WHERE l_quantity < 0.5 * (
            SELECT AVG(l_quantity) FROM lineitem_v l2
            WHERE l2.l_partkey = l1.l_partkey
        )
        """
    )


def unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: wide per-order metrics to (order, metric, value)
    long form — the inverse of pivot, narrow op, no shuffle."""
    orders = load_table(spark, sf_dir, "orders")
    wide = orders.select(
        "o_orderkey",
        F.round(F.col("o_totalprice"), 2).alias("totalprice"),
        F.year(F.col("o_orderdate")).cast("double").alias("order_year"),
    ).orderBy("o_orderkey").limit(100)
    return wide.unpivot(
        "o_orderkey", ["totalprice", "order_year"], "metric", "value"
    )


def q01b_like_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE 'prefix%' filter — pushes to the scan as StringStartsWith
    (asserted in test_plans)."""
    return (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey", "p_name", "p_brand")
    )


def null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-valued logic + null functions: NULLIF manufactures nulls,
    COALESCE/GREATEST/LEAST and null-safe counting aggregate over them —
    parity here pins Spark's and ANSI's null semantics together."""
    ev = load_table(spark, sf_dir, "events")
    v = F.nullif(F.col("event_type"), F.lit("error"))  # error → NULL
    return ev.groupBy((F.col("user_id") % 5).alias("grp")).agg(
        F.count(v).alias("non_null_cnt"),  # count skips nulls
        F.count(F.lit(1)).alias("total_cnt"),
        F.sum(F.when(v.isNull(), 1).otherwise(0)).cast("long").alias("null_cnt"),
        F.coalesce(F.max(v), F.lit("none")).alias("max_or_default"),
    ).orderBy("grp")


def string_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization battery: regexp_replace, translate, lpad, repeat,
    reverse — the cleanup functions a text-ingest pipeline leans on."""
    cust = load_table(spark, sf_dir, "customer")
    return (
        cust.select(
            "c_custkey",
            F.regexp_replace(F.col("c_name"), r"[0-9]+", "#").alias("masked"),
            F.translate(F.col("c_mktsegment"), "AEIOU", "aeiou").alias("translated"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
            F.reverse(F.col("c_mktsegment")).alias("reversed"),
        )
        .orderBy("c_custkey")
        .limit(50)
    )


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 4 grouping combinations of (status, priority) in one
    aggregation pass (SURVEY §2.7 grouping sets)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CASE-driven value bucketing (the status_enum-style discrimination
    the reference's dashboard filters on, DASHBOARD_GUIDE.md:122-135)."""
    orders = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50_000, "small")
        .when(F.col("o_totalprice") < 200_000, "medium")
        .otherwise("large")
    )
    return (
        orders.groupBy(bucket.alias("price_bucket"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
        )
        .orderBy("price_bucket")
    )


QUERIES = {
    "json_extract_props": json_extract_props,
    "date_arithmetic": date_arithmetic,
    "string_funcs": string_funcs,
    "subquery_exists": subquery_exists,
    "subquery_in": subquery_in,
    "subquery_scalar": subquery_scalar,
    "subquery_correlated_scalar": subquery_correlated_scalar,
    "unpivot_metrics": unpivot_metrics,
    "q01b_like_prefix": q01b_like_prefix,
    "null_semantics": null_semantics,
    "string_normalize": string_normalize,
    "cube_status_priority": cube_status_priority,
    "case_bucketing": case_bucketing,
}

ORACLE = {
    "json_extract_props": """
        SELECT k % 10 AS k_mod, count(*) AS cnt FROM (
            SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
            FROM events
        ) WHERE k IS NOT NULL AND k >= 50
        GROUP BY 1 ORDER BY 1
    """,
    "date_arithmetic": """
        SELECT o_orderkey,
               CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS deadline,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               CAST(month(o_orderdate) AS INTEGER) AS mo,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER) AS days_to_eoy
        FROM orders
        WHERE year(o_orderdate) = 1995
        ORDER BY o_orderkey LIMIT 100
    """,
    "string_funcs": """
        SELECT c_custkey,
               'Customer: ' || upper(c_name) AS label,
               substr(c_name, 1, 8) AS prefix,
               CAST(length(c_name) AS BIGINT) AS name_len
        FROM customer ORDER BY c_custkey LIMIT 50
    """,
    "subquery_exists": """
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity >= 49
        )
        GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    "subquery_in": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
        )
    """,
    "subquery_scalar": """
        SELECT o_orderkey, ROUND(o_totalprice, 2) AS o_totalprice
        FROM orders
        WHERE o_totalprice > 1.5 * (SELECT AVG(o_totalprice) FROM orders)
    """,
    "subquery_correlated_scalar": """
        SELECT l_orderkey, l_partkey, l_quantity
        FROM lineitem l1
        WHERE l_quantity < 0.5 * (
            SELECT AVG(l_quantity) FROM lineitem l2
            WHERE l2.l_partkey = l1.l_partkey
        )
    """,
    "unpivot_metrics": """
        SELECT o_orderkey, metric, value FROM (
            SELECT o_orderkey,
                   ROUND(o_totalprice, 2) AS totalprice,
                   CAST(year(o_orderdate) AS DOUBLE) AS order_year
            FROM orders ORDER BY o_orderkey LIMIT 100
        ) UNPIVOT (value FOR metric IN (totalprice, order_year))
    """,
    "q01b_like_prefix": """
        SELECT p_partkey, p_name, p_brand
        FROM part WHERE p_name LIKE 'small%'
    """,
    "null_semantics": """
        SELECT user_id % 5 AS grp,
               count(NULLIF(event_type, 'error')) AS non_null_cnt,
               count(*) AS total_cnt,
               CAST(SUM(CASE WHEN NULLIF(event_type, 'error') IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS null_cnt,
               COALESCE(MAX(NULLIF(event_type, 'error')), 'none') AS max_or_default
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "string_normalize": """
        SELECT c_custkey,
               regexp_replace(c_name, '[0-9]+', '#', 'g') AS masked,
               translate(c_mktsegment, 'AEIOU', 'aeiou') AS translated,
               lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
               reverse(c_mktsegment) AS reversed
        FROM customer ORDER BY c_custkey LIMIT 50
    """,
    "cube_status_priority": """
        SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    "case_bucketing": """
        SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                    WHEN o_totalprice < 200000 THEN 'medium'
                    ELSE 'large' END AS price_bucket,
               count(*) AS cnt,
               ROUND(AVG(o_totalprice), 2) AS avg_price
        FROM orders GROUP BY 1 ORDER BY 1
    """,
}
