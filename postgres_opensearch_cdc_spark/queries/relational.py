"""Relational operators beyond the reference's surface (SURVEY §2.7):
joins, window functions, set operations, rollup, distinct aggregation,
percentiles. The reference has none of these (its only join is the
one-off PK diagnostic X1, TDD :174-187); they are first-class here
because the engine surface is DataFrame/SQL and Catalyst provides them
natively.

Scale notes are attached per query: which side broadcasts, where the
shuffles are, and why each plan survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 (TDD :174-187): LEFT JOIN ... IS NULL as a left-anti join —
    customers with no URGENT-priority orders. (The fixture gives every
    customer at least one order, so the unfiltered form of X1 is
    vacuously empty at every sf; anti-joining against the filtered
    order set keeps the operator AND a non-empty answer.) Anti joins
    broadcast the key set when small; at scale this is a shuffled hash
    anti-join with only the key column moving, never the payload."""
    cust = load_table(spark, sf_dir, "customer")
    urgent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return cust.join(
        urgent, cust.c_custkey == urgent.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def join_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical wide-agg scan.
    Pure map-side partial agg → tiny shuffle (4 groups); identical plan at
    any scale. Decimal-free: testdata uses doubles, rounded for oracle
    stability."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(
                F.sum(
                    F.col("l_extendedprice")
                    * (1 - F.col("l_discount"))
                    * (1 + F.col("l_tax"))
                ),
                2,
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def join_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join: customer ⋈ orders ⋈ lineitem with
    selective filters on both sides. customer (selective segment) is far
    below the broadcast threshold at sf0.1 — Catalyst broadcasts it, so
    the only real shuffle is the final groupBy on orderkey. At 100 TB the
    orders⋈lineitem join co-partitions on orderkey (bucketing-friendly)."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    return (
        F.broadcast(cust)
        .join(orders, cust.c_custkey == orders.o_custkey)
        .join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(10)
    )


def join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped 6-way star join: region→nation broadcast down the
    dimension chain, lineitem⋈orders co-partitioned on orderkey,
    supplier⋈customer nation-equality. Dims (region/nation/supplier/
    customer-at-scale) broadcast; the single large shuffle is
    orders⋈lineitem. Classic star-schema plan that holds at 100 TB."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running balance (the reference's running_balance_derived column,
    create-sample-data.sh:31-36, is exactly this shape): cumulative sum
    of purchase values per user ordered by time. One shuffle on user_id;
    unbounded-preceding running frames stream in sorted order without
    materializing the partition."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


def window_rank_in_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window: top-3 orders by price within each priority class.
    rank() + filter compiles to a single window pass; at scale, a
    pre-aggregated top-N per partition (AQE) avoids full sorts."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
    )


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: per-user inter-event value delta — the change-vs-previous
    shape CDC diffing needs. Same single-shuffle window plan."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.round(
            F.col("value") - F.lag("value", 1).over(w), 2
        ).alias("value_delta"),
    )


def set_ops_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL as a query operator with real bag semantics: the
    multiset of customer nation keys minus the multiset of supplier
    nation keys — each nation survives with multiplicity
    (#customers − #suppliers). (The distinct-set form "nations with
    customers but no suppliers" is vacuously empty in the fixture —
    every nation has both; the bag difference is non-empty at every sf
    because customers outnumber suppliers.) Set ops hash-aggregate on
    the projected key column only."""
    cust_nations = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp_nations = load_table(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust_nations.exceptAll(supp_nations)


def rollup_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS / ROLLUP: order counts + revenue at (status, priority),
    (status), and grand-total levels in one pass. Spark expands grouping
    sets before the shuffle — still one aggregation."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
    )


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: exact distinct users per event type (the
    exact counterpart of approx_count_distinct, which is benchmarked but
    not oracle-comparable across engines)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("distinct_users"))
        .orderBy("event_type")
    )


def percentiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median/p90) of event value per type. Spark's
    percentile() and DuckDB's quantile_cont share linear interpolation.
    At 100 TB the approx_percentile variant (t-digest) replaces this —
    exposed in functions.sketches."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.9)"), 4).alias("p90"),
        )
        .orderBy("event_type")
    )


def join_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns per customer (3-way join,
    selective flag filter, top-20). Same broadcast-dim + single fact
    shuffle plan as Q3."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def join_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share — conditional aggregation
    over a fact⋈dim join, one output row. part broadcasts."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_share_pct")
        )
    )


def join_disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-conjunction predicates across a join —
    exercises disjunct pushdown/split. Catalyst extracts the common
    p_partkey join key and pushes brand/size/quantity disjuncts."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 30))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 20) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#25") & (F.col("p_size") <= 30) & (F.col("l_quantity") >= 10))
    )
    return joined.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("cnt"),
    )


def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance per event type and
    Pearson correlation / sample covariance between quantity and price
    on lineitem. All partial-aggregable (single-pass moment sketches)."""
    ev = load_table(spark, sf_dir, "events")
    li = load_table(spark, sf_dir, "lineitem")
    per_type = (
        ev.groupBy("event_type")
        .agg(
            F.round(F.stddev("value"), 4).alias("sd"),
            F.round(F.var_samp("value"), 4).alias("var"),
        )
        .orderBy("event_type")
    )
    pair = li.agg(
        F.lit("lineitem_qty_price").alias("event_type"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("sd"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("var"),
    )
    return per_type.unionByName(pair)


def approx_sketches(
    spark: SparkSession, sf_dir: str, check_bounds: bool = False
) -> DataFrame:
    """Sketch aggregates — the 100 TB form of distinct_agg/percentiles:
    HyperLogLog++ distinct counts and t-digest-style quantiles in one
    partial-aggregable pass. This (default) form is what you run at
    scale: sketches only, no exact aggregates anywhere in the plan.

    check_bounds=True switches to the accuracy-harness form: sketch
    internals are engine-specific, so instead of raw approximations
    (uncheckable across engines) it emits the exact values plus boolean
    within-epsilon verdicts — HLL count within 3x rsd of exact, approx
    percentile inside the exact [p-0.01, p+0.01] quantile envelope
    (percentile_approx rank error is <= 1/accuracy = 1e-4, far inside
    it). tests/test_sketch_bounds.py asserts every verdict TRUE, so a
    sketch drifting out of bounds fails CI; the production entry never
    pays for the exact twins (exact distinct + exact percentile are the
    dominant cost at any scale)."""
    ev = load_table(spark, sf_dir, "events")
    if not check_bounds:
        return (
            ev.groupBy("event_type")
            .agg(
                F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
                F.round(
                    F.element_at(F.percentile_approx("value", [0.5, 0.9], 10_000), 1), 4
                ).alias("p50"),
                F.round(
                    F.element_at(F.percentile_approx("value", [0.5, 0.9], 10_000), 2), 4
                ).alias("p90"),
            )
            .orderBy("event_type")
        )
    sketch = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
        F.percentile_approx("value", [0.5, 0.9], 10_000).alias("_p"),
        F.percentile("value", [0.49, 0.51, 0.89, 0.91]).alias("_pe"),
    )
    within = F.abs(F.col("approx_users") - F.col("exact_users")) <= F.greatest(
        F.round(F.col("exact_users") * 0.06), F.lit(1)
    )
    return (
        sketch.select(
            "event_type",
            "exact_users",
            within.alias("users_ok"),
            F.element_at("_p", 1).between(
                F.element_at("_pe", 1), F.element_at("_pe", 2)
            ).alias("p50_ok"),
            F.element_at("_p", 2).between(
                F.element_at("_pe", 3), F.element_at("_pe", 4)
            ).alias("p90_ok"),
        )
        .orderBy("event_type")
    )


QUERIES = {
    "join_left_anti": join_left_anti,
    "join_pricing_summary": join_pricing_summary,
    "join_shipping_priority": join_shipping_priority,
    "join_local_supplier_volume": join_local_supplier_volume,
    "join_returned_items": join_returned_items,
    "join_promo_share": join_promo_share,
    "join_disjunctive_filter": join_disjunctive_filter,
    "window_running_sum": window_running_sum,
    "window_rank_in_group": window_rank_in_group,
    "window_lag_delta": window_lag_delta,
    "set_ops_nations": set_ops_nations,
    "rollup_status_priority": rollup_status_priority,
    "distinct_agg": distinct_agg,
    "percentiles_value": percentiles_value,
    "stats_agg": stats_agg,
    # correctness surface runs the bounds-harness form (exact twins +
    # within-epsilon verdicts, value-checked by the oracle below);
    # bench.py measures the production sketch-only form instead — at
    # scale you never pay for the exact aggregates
    "approx_sketches": lambda spark, sf_dir: approx_sketches(
        spark, sf_dir, check_bounds=True
    ),
}

ORACLE = {
    "join_left_anti": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderpriority = '1-URGENT')
    """,
    "join_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 2) AS sum_qty,
               ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
               ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
               ROUND(AVG(l_quantity), 4) AS avg_qty,
               ROUND(AVG(l_discount), 4) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "join_shipping_priority": """
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM customer, orders, lineitem
        WHERE c_mktsegment = 'BUILDING'
          AND c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
          AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
    "join_local_supplier_volume": """
        SELECT n_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, customer, supplier, nation, region
        WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name ORDER BY revenue DESC, n_name
    """,
    "join_returned_items": """
        SELECT c_custkey, c_name,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem, orders, customer
        WHERE l_returnflag = 'R' AND l_orderkey = o_orderkey
          AND o_custkey = c_custkey
        GROUP BY c_custkey, c_name
        ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
    "join_promo_share": """
        SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                     THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END)
               / SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
    """,
    "join_disjunctive_filter": """
        SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               count(*) AS cnt
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#11' AND p_size <= 10 AND l_quantity >= 30)
           OR (p_brand = 'Brand#22' AND p_size <= 20 AND l_quantity >= 20)
           OR (p_brand = 'Brand#25' AND p_size <= 30 AND l_quantity >= 10)
    """,
    "window_running_sum": """
        SELECT user_id, event_id,
               ROUND(SUM(value) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS running_value
        FROM events WHERE event_type = 'purchase'
    """,
    "window_rank_in_group": """
        SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
            SELECT o_orderpriority, o_orderkey, o_totalprice,
                   CAST(row_number() OVER (
                       PARTITION BY o_orderpriority
                       ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk
            FROM orders
        ) WHERE rnk <= 3
    """,
    "window_lag_delta": """
        SELECT user_id, event_id,
               ROUND(value - lag(value, 1) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), 2) AS value_delta
        FROM events
    """,
    "set_ops_nations": """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "rollup_status_priority": """
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS cnt,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    "distinct_agg": """
        SELECT event_type, count(DISTINCT user_id) AS distinct_users
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "stats_agg": """
        SELECT event_type, ROUND(stddev_samp(value), 4) AS sd,
               ROUND(var_samp(value), 4) AS var
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'lineitem_qty_price' AS event_type,
               ROUND(corr(l_quantity, l_extendedprice), 6) AS sd,
               ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS var
        FROM lineitem
    """,
    "percentiles_value": """
        SELECT event_type,
               ROUND(quantile_cont(value, 0.5), 4) AS p50,
               ROUND(quantile_cont(value, 0.9), 4) AS p90
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    # Bounds oracle: the Spark side emits exact values + within-epsilon
    # verdict booleans for its sketches; the oracle asserts the verdicts
    # hold. An HLL/percentile_approx regression breaks the value hash.
    "approx_sketches": """
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS users_ok,
               TRUE AS p50_ok,
               TRUE AS p90_ok
        FROM events GROUP BY event_type ORDER BY event_type
    """,
}
