"""Relational batch 4: TPC-H Q9/Q11/Q19/Q21 analogs adapted to the
driver testdata's columns (no partsupp table, no commit/receipt dates —
the profit, importance-threshold, bracket-disjunction, and
sole-late-supplier semantics are preserved on the columns that exist).
Spark-native decision-support shapes beyond the reference's embedded
SQL surface (SURVEY §2.7): multi-way star joins with derived measures,
HAVING against a global scalar aggregate (1-row broadcast), OR-of-
conjunction bracket predicates evaluated in a single scan, and
per-group "exactly one distinct offender" detection. Every entry is
oracle-checked.

Reference basis: the reference ships decision-support dashboards over
the mirrored tables (DASHBOARD_GUIDE.md:30-135); these are the
standard TPC-H shapes a user of that surface would run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

LATE_DAYS = 80  # ship-lag threshold standing in for commit<receipt
COST_FACTOR = 0.6  # stand-in supply cost: 60% of part retail price
IMPORTANCE_MULTIPLE = 1.5  # Q11 threshold: multiple of the MEAN part value
# (TPC-H's fixed global fraction shrinks per part as the part count grows
# — vacuous at sf0.1; a mean-relative threshold is scale-free)


def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analog (product-type profit measure): profit per
    supplier nation per ship year for STANDARD-type parts, where
    profit = extended price net of discount minus a retail-price-based
    supply cost (no partsupp in the fixture). The part filter prunes
    before the join; part and supplier/nation dims broadcast, so the
    only shuffle is the final (nation, year) aggregation — 25×7 keys,
    partial-aggregated map-side. At 100 TB the fact scan dominates and
    the plan stays a single pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    std_parts = part.filter(F.col("p_type") == "STANDARD").select(
        "p_partkey", "p_retailprice"
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(COST_FACTOR) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(F.broadcast(std_parts), li["l_partkey"] == std_parts["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nation), sup["s_nationkey"] == nation["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


def important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analog (important stock identification, partsupp-free):
    parts whose total ordered net value exceeds IMPORTANCE_MULTIPLE x
    the mean per-part value (scale-free — a fixed global fraction goes
    vacuous as the part count grows). The HAVING-against-a-scalar-
    subquery decorrelates
    into a second aggregation over the SAME per-part partials (Spark
    reuses the shuffle via the cached intermediate at runtime; at scale
    the per-part aggregate is one shuffle and the global total is a
    1-row broadcast crossJoin — no second fact scan)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    total = per_part.agg(
        (F.sum("value") / F.count(F.lit(1)) * F.lit(IMPORTANCE_MULTIPLE)).alias(
            "threshold"
        )
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", F.round("value", 2).alias("part_value"))
        .orderBy(F.col("part_value").desc(), "l_partkey")
    )


# Q19 brackets: (brand, max size, quantity band) — OR of conjunctions
BRACKETS = [
    ("Brand#1", 15, 1, 11),
    ("Brand#2", 25, 10, 20),
    ("Brand#3", 40, 20, 30),
]


def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, OR-of-conjunction brackets): one
    broadcast-joined scan where the three brand/size/quantity brackets
    are a single disjunctive predicate — Catalyst keeps it one pass,
    no union of three scans. Returns the global revenue plus the
    matched line count so the oracle value-checks both the filter and
    the measure."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        li["l_partkey"] == part["p_partkey"],
    )
    cond = None
    for brand, max_size, qlo, qhi in BRACKETS:
        c = (
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, max_size))
            & (F.col("l_quantity").between(qlo, qhi))
        )
        cond = c if cond is None else (cond | c)
    return j.filter(cond).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("matched_lines"),
    )


def waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analog (suppliers who kept orders waiting): suppliers
    that were the SOLE late shipper on a multi-supplier order (late =
    shipped more than LATE_DAYS after the order date, standing in for
    receipt>commit). The exists/not-exists pair collapses into
    per-order aggregates; distinctness comes from a cascaded
    (orderkey, suppkey) pre-aggregation rather than countDistinct —
    two 2-key aggregations with map-side partials instead of the
    Expand (3× row multiplication) a double countDistinct plans
    (measured 2.85 s → ~1.4 s warm at sf0.1). The supplier dim joins
    broadcast; top 10 by wait count with a deterministic name
    tie-break."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    j = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li["l_orderkey"] == orders["o_orderkey"],
    ).select(
        "l_orderkey",
        "l_suppkey",
        (
            F.col("l_shipdate") > F.date_add(F.col("o_orderdate"), LATE_DAYS)
        ).alias("late"),
    )
    per_supp = j.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.col("late").cast("int")).alias("any_late")
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.sum("any_late").alias("n_late_supp"),
        F.max(F.when(F.col("any_late") == 1, F.col("l_suppkey"))).alias(
            "late_supp"
        ),
    )
    blamed = per_order.filter(
        (F.col("n_supp") > 1) & (F.col("n_late_supp") == 1)
    )
    return (
        blamed.groupBy("late_supp")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(sup), F.col("late_supp") == sup["s_suppkey"])
        .select("s_name", "numwait")
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


QUERIES = {
    "profit_by_nation_year": profit_by_nation_year,
    "important_part_value": important_part_value,
    "bracket_revenue": bracket_revenue,
    "waiting_suppliers": waiting_suppliers,
}

_BRACKET_SQL = " OR ".join(
    f"(p_brand = '{brand}' AND p_size BETWEEN 1 AND {max_size} "
    f"AND l_quantity BETWEEN {qlo} AND {qhi})"
    for brand, max_size, qlo, qhi in BRACKETS
)

ORACLE = {
    "profit_by_nation_year": f"""
        SELECT n_name AS nation,
               EXTRACT(year FROM l_shipdate) AS o_year,
               ROUND(SUM(l_extendedprice * (1 - l_discount)
                         - {COST_FACTOR} * p_retailprice * l_quantity), 2)
                   AS sum_profit
        FROM lineitem
        JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name, EXTRACT(year FROM l_shipdate)
        ORDER BY nation, o_year DESC
    """,
    "important_part_value": f"""
        WITH per_part AS (
            SELECT l_partkey,
                   SUM(l_extendedprice * (1 - l_discount)) AS value
            FROM lineitem GROUP BY l_partkey
        )
        SELECT l_partkey, ROUND(value, 2) AS part_value
        FROM per_part
        WHERE value > (SELECT SUM(value) / COUNT(*) * {IMPORTANCE_MULTIPLE}
                       FROM per_part)
        ORDER BY part_value DESC, l_partkey
    """,
    "bracket_revenue": f"""
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS matched_lines
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE {_BRACKET_SQL}
    """,
    "waiting_suppliers": f"""
        WITH flagged AS (
            SELECT l_orderkey, l_suppkey,
                   l_shipdate > o_orderdate + INTERVAL {LATE_DAYS} DAY AS late
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ), per_order AS (
            SELECT l_orderkey,
                   COUNT(DISTINCT l_suppkey) AS n_supp,
                   COUNT(DISTINCT CASE WHEN late THEN l_suppkey END)
                       AS n_late_supp,
                   MAX(CASE WHEN late THEN l_suppkey END) AS late_supp
            FROM flagged GROUP BY l_orderkey
        )
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM per_order JOIN supplier ON late_supp = s_suppkey
        WHERE n_supp > 1 AND n_late_supp = 1
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 10
    """,
}
