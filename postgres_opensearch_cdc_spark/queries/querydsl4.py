"""Query-DSL batch 8: the parent/child join-field model and the last
filter-context node types — ``has_child`` (score_mode=sum,
min_children), ``has_parent``, ``terms`` lookup (terms fetched from
another document), ``geo_polygon``, and the ``global`` aggregation
bucket (reference surface: OpenSearch join-field docs; TDD
:1624-1653).

Spark-first shapes: parent/child queries are semi-join aggregations
(the child side pre-aggregates to one row per parent before joining);
the terms lookup materializes the lookup doc's term list as a
broadcast; geo_polygon is pure sign-test arithmetic in the scan stage.
All value-checked against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

HC_MIN_CHILDREN = 2  # has_child min_children
HP_PRIORITY = "1-URGENT"  # has_parent parent filter
LOOKUP_TOP_USERS = 5  # terms-lookup watchlist size
# convex polygon (lon, lat) — counter-clockwise triangle
POLYGON = [(-60.0, -30.0), (60.0, -30.0), (0.0, 60.0)]


def has_child_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``has_child`` with ``score_mode: sum`` and ``min_children``:
    parent orders having at least HC_MIN_CHILDREN returned lineitems;
    the parent's score is the number of matching children. The child
    side collapses to (parent_id, count) BEFORE the join — the
    denormalized-count shape that replaces the engine's join-field
    global ordinals at 100 TB; the top-k is TakeOrderedAndProject."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    child_scores = (
        li.filter(F.col("l_returnflag") == "R")
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("score"))
        .filter(F.col("score") >= HC_MIN_CHILDREN)
    )
    return (
        orders.join(child_scores, orders["o_orderkey"] == child_scores["l_orderkey"])
        .select("o_orderkey", "o_orderpriority", "score")
        .orderBy(F.col("score").desc(), "o_orderkey")
        .limit(15)
    )


def has_parent_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``has_parent``: child lineitems whose parent order matches the
    priority filter, aggregated per return flag. The parent side
    prunes to keys-only before a broadcast-friendly semi-join — child
    rows never shuffle with payloads attached."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    parents = orders.filter(F.col("o_orderpriority") == HP_PRIORITY).select(
        "o_orderkey"
    )
    return (
        li.join(parents, li["l_orderkey"] == parents["o_orderkey"], "left_semi")
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("child_count"),
            F.round(F.sum("l_extendedprice"), 2).alias("child_revenue"),
        )
        .orderBy("l_returnflag")
    )


def terms_lookup_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``terms`` lookup: the filter's term list lives in another
    document — here the watchlist is the top-{LOOKUP_TOP_USERS} users
    by purchase count (deterministic tie-break), and events are
    filtered to those users and counted per type. The lookup list is
    tiny by construction, so it broadcasts; at 100 TB this is the
    watchlist-join pattern (never an IN-list collected to the
    driver)."""
    ev = load_table(spark, sf_dir, "events")
    watchlist = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_purch"))
        .orderBy(F.col("n_purch").desc(), "user_id")
        .limit(LOOKUP_TOP_USERS)
        .select("user_id")
    )
    return (
        ev.join(F.broadcast(watchlist), "user_id", "left_semi")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("event_type")
    )


def _poly_contains(lon, lat) -> F.Column:
    """Point-in-convex-polygon via consistent edge cross-product signs —
    exact arithmetic on the synthetic coordinates, portable across
    engines (no trig, no epsilon)."""
    cond = None
    n = len(POLYGON)
    for i in range(n):
        x1, y1 = POLYGON[i]
        x2, y2 = POLYGON[(i + 1) % n]
        cross = (F.lit(x2 - x1)) * (lat - F.lit(y1)) - (F.lit(y2 - y1)) * (
            lon - F.lit(x1)
        )
        c = cross >= 0  # CCW polygon: inside = left of every edge
        cond = c if cond is None else (cond & c)
    return cond


def geo_polygon_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_polygon``: points inside a convex polygon, counted per
    event type. Same deterministic coordinate derivation as the other
    geo entries (the fixtures carry no geo columns); the containment
    test is three sign checks in the scan projection — pure codegen,
    prunable at 100 TB by a bounding-box pre-filter on partition
    stats."""
    ev = load_table(spark, sf_dir, "events")
    lat = (F.col("user_id") * 1201 % 18000) / F.lit(100.0) - F.lit(90.0)
    lon = (F.col("event_id") * 13 % 36000) / F.lit(100.0) - F.lit(180.0)
    return (
        ev.select("event_type", lat.alias("lat"), lon.alias("lon"))
        .filter(_poly_contains(F.col("lon"), F.col("lat")))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("event_type")
    )


def global_agg_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``global`` aggregation: metrics over the full index alongside the
    query-scoped bucket (here: click events) — the "vs all documents"
    comparison panel. ONE conditional-aggregate pass; no second scan,
    no union."""
    ev = load_table(spark, sf_dir, "events")
    is_q = F.col("event_type") == "click"
    return ev.agg(
        F.sum(is_q.cast("long")).alias("query_count"),
        F.round(F.avg(F.when(is_q, F.col("value"))), 4).alias("query_avg_value"),
        F.count(F.lit(1)).alias("global_count"),
        F.round(F.avg("value"), 4).alias("global_avg_value"),
    )


def transform_entity_centric(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transforms-API analog: the continuous pivot that maintains an
    entity-centric index from the event stream — one feature row per
    user (event counts by type, activity span, value stats). ONE
    partial-aggregated shuffle on the entity key; in production this
    runs incrementally per micro-batch against the same groupBy plan
    (the streaming mirror's foreachBatch applies the delta)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "click").cast("long")).alias("n_click"),
            F.sum((F.col("event_type") == "view").cast("long")).alias("n_view"),
            F.sum((F.col("event_type") == "purchase").cast("long")).alias(
                "n_purchase"
            ),
            F.countDistinct(F.to_date("ts")).alias("active_days"),
            F.max("ts").alias("last_seen"),
            # exact integer-cents average, floor-truncated to 4 decimals:
            # the fixture values carry 2 decimals, so the cent sum is an
            # exact long and the truncation floors the SAME IEEE double
            # in both engines (ROUND(avg(double)) tie-flipped 3 users'
            # 4th decimal at sf0.1)
            (
                F.floor(
                    F.sum(F.round(F.col("value") * 100).cast("long"))
                    * 100.0
                    / F.count(F.lit(1))
                )
                / 10000.0
            ).alias("avg_value"),
        )
        .orderBy("user_id")
    )


QUERIES = {
    "has_child_query": has_child_query,
    "has_parent_query": has_parent_query,
    "terms_lookup_filter": terms_lookup_filter,
    "geo_polygon_query": geo_polygon_query,
    "global_agg_compare": global_agg_compare,
    "transform_entity_centric": transform_entity_centric,
}

_POLY_SQL = " AND ".join(
    f"(({x2 - x1}) * (lat - ({y1})) - ({y2 - y1}) * (lon - ({x1}))) >= 0"
    for (x1, y1), (x2, y2) in zip(POLYGON, POLYGON[1:] + POLYGON[:1])
)

ORACLE = {
    "has_child_query": f"""
        WITH child_scores AS (
            SELECT l_orderkey, COUNT(*) AS score
            FROM lineitem WHERE l_returnflag = 'R'
            GROUP BY l_orderkey
            HAVING COUNT(*) >= {HC_MIN_CHILDREN}
        )
        SELECT o_orderkey, o_orderpriority, score
        FROM orders JOIN child_scores ON o_orderkey = l_orderkey
        ORDER BY score DESC, o_orderkey LIMIT 15
    """,
    "has_parent_query": f"""
        SELECT l_returnflag, COUNT(*) AS child_count,
               ROUND(SUM(l_extendedprice), 2) AS child_revenue
        FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_orderpriority = '{HP_PRIORITY}'
        )
        GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    "terms_lookup_filter": f"""
        WITH watchlist AS (
            SELECT user_id FROM events
            WHERE event_type = 'purchase'
            GROUP BY user_id
            ORDER BY COUNT(*) DESC, user_id
            LIMIT {LOOKUP_TOP_USERS}
        )
        SELECT event_type, COUNT(*) AS doc_count
        FROM events
        WHERE user_id IN (SELECT user_id FROM watchlist)
        GROUP BY event_type ORDER BY event_type
    """,
    "geo_polygon_query": f"""
        SELECT event_type, COUNT(*) AS doc_count
        FROM (
            SELECT event_type,
                   (user_id * 1201 % 18000) / 100.0 - 90.0 AS lat,
                   (event_id * 13 % 36000) / 100.0 - 180.0 AS lon
            FROM events
        )
        WHERE {_POLY_SQL}
        GROUP BY event_type ORDER BY event_type
    """,
    "transform_entity_centric": """
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_click,
               CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_view,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_purchase,
               COUNT(DISTINCT CAST(ts AS DATE)) AS active_days,
               MAX(ts) AS last_seen,
               FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 100.0
                     / COUNT(*)) / 10000.0 AS avg_value
        FROM events
        GROUP BY user_id ORDER BY user_id
    """,
    "global_agg_compare": """
        SELECT CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS query_count,
               ROUND(AVG(CASE WHEN event_type = 'click' THEN value END), 4)
                   AS query_avg_value,
               COUNT(*) AS global_count,
               ROUND(AVG(value), 4) AS global_avg_value
        FROM events
    """,
}
