"""OpenSearch aggregation-DSL parity, batch 3: bucket families beyond
terms/date_histogram (already in dashboard.py/querydsl.py).

Covers range / date_range / multi_terms / sampler / adjacency_matrix /
cardinality / scripted_metric / geo_distance — the remaining aggregation
shapes a Dashboards user can express (OpenSearch agg reference; the
reference repo's own dashboards stop at terms + date-histogram,
DASHBOARD_GUIDE.md:30-61, so these are declared extensions in the same
DSL family).

Scale notes: every entry is a single partial+final aggregation over a
scan with the bucketing expression computed map-side (codegen); none
shuffles more than (bucket-key, partial-agg) rows. The sampler uses a
deterministic md5 gate so both engines (and any re-run at any
parallelism) select the identical subset — OpenSearch's shard_size
randomness replaced by reproducible hash sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

_EARTH_KM = 6371.0


def _isodow(col: str):
    # ISO day-of-week 1=Monday..7=Sunday, portable: Spark weekday() is
    # 0=Monday; DuckDB isodow() is 1=Monday.
    return (F.weekday(F.col(col)) + F.lit(1)).cast("long")


def range_agg_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `range` aggregation on events.value with buckets
    (-inf,25), [25,100), [100,inf): per-bucket doc_count + avg metric.
    Bucket labels follow the DSL's "*-25"/"25-100"/"100-*" key format
    (which also sorts in bucket order)."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("value") < 25, "*-25")
        .when(F.col("value") < 100, "25-100")
        .otherwise("100-*")
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("bucket")
    )


def date_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `date_range` aggregation: buckets relative to an
    anchor date (before / anchor-week / after), with count + sum."""
    ev = load_table(spark, sf_dir, "events")
    bucket = (
        F.when(F.col("ts") < F.lit("2024-01-15").cast("timestamp"), "1_before")
        .when(F.col("ts") < F.lit("2024-01-22").cast("timestamp"), "2_anchor_week")
        .otherwise("3_after")
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("bucket")
    )


def multi_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `multi_terms` aggregation: top 10 (event_type,
    iso-weekday) composites by doc count, count-desc with key tiebreak
    (the DSL's deterministic ordering)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type", _isodow("ts").alias("isodow"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), "event_type", "isodow")
        .limit(10)
    )


def sampler_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `sampler` aggregation with a deterministic gate: a
    ~10% md5-hash sample of events, then a terms agg on the sample.
    Hash sampling replaces OpenSearch's best-docs heuristic so the
    sample — and therefore the buckets — is reproducible everywhere."""
    ev = load_table(spark, sf_dir, "events")
    gate = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 10
        == 0
    )
    return (
        ev.filter(gate)
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), "event_type")
    )


def adjacency_matrix_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `adjacency_matrix` aggregation: named filters
    A=errors, B=high-value (>=50), C=weekend; doc counts for each
    filter and each pairwise intersection, empty buckets omitted.
    One aggregate computes all six counters map-side; stack() unpivots
    the single row into DSL-shaped (key, doc_count) buckets."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type") == "error"
    b = F.col("value") >= 50
    c = _isodow("ts") >= 6
    cnt = lambda p: F.sum(p.cast("long"))  # noqa: E731
    one = ev.agg(
        cnt(a).alias("a"),
        cnt(b).alias("b"),
        cnt(c).alias("c"),
        cnt(a & b).alias("ab"),
        cnt(a & c).alias("ac"),
        cnt(b & c).alias("bc"),
    )
    return (
        one.selectExpr(
            "stack(6, 'A', a, 'B', b, 'C', c, 'A&B', ab, 'A&C', ac, 'B&C', bc)"
            " as (bucket, doc_count)"
        )
        .filter(F.col("doc_count") > 0)
        .orderBy("bucket")
    )


def cardinality_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `cardinality` sub-aggregation under terms buckets:
    distinct users per event type. Exact count-distinct (value-checkable;
    the HLL approximate form with an epsilon verdict is approx_sketches).
    Distinct-agg rewrites to a two-stage expand+agg — one shuffle."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("event_type")
    )


def scripted_metric_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `scripted_metric` aggregation: per-type weighted
    average of value with weight = props JSON field k — the custom
    map/combine/reduce script expressed as a plain ratio-of-sums
    aggregate (associative partials, no script engine)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("value") * k) / F.sum(k), 4).alias("weighted_avg"),
            F.round(F.sum(k), 1).alias("total_weight"),
        )
        .orderBy("event_type")
    )


def geo_distance_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `geo_distance` filter + distance buckets over synthetic
    deterministic coordinates (lat/lon derived arithmetically from ids via coprime strides —
    the fixture tables carry no geo columns; derivation is exact integer
    math so both engines see identical points). Haversine distance from
    the origin, filtered to <= 5000 km, bucketed per 1000 km ring with
    counts — the geo ring aggregation a Dashboards map panel issues."""
    ev = load_table(spark, sf_dir, "events")
    lat = (F.col("user_id") * 1201 % 18000) / F.lit(100.0) - F.lit(90.0)
    lon = (F.col("event_id") * 13 % 36000) / F.lit(100.0) - F.lit(180.0)
    dlat = F.radians(lat)  # from origin (0,0): delta lat = lat
    dlon = F.radians(lon)
    h = (
        F.sin(dlat / 2) * F.sin(dlat / 2)
        + F.cos(F.radians(lat)) * F.cos(F.lit(0.0)) * F.sin(dlon / 2) * F.sin(dlon / 2)
    )
    dist_km = F.round(2 * F.lit(_EARTH_KM) * F.asin(F.sqrt(h)), 3)
    with_d = ev.select("event_type", dist_km.alias("dist_km"))
    return (
        with_d.filter(F.col("dist_km") <= 5000.0)
        .groupBy((F.floor(F.col("dist_km") / 1000) * 1000).alias("ring_km"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("ring_km")
    )


RARE_TERMS_MAX_DOCS = 30


def rare_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rare_terms``: the long-tail complement of ``terms`` — buckets
    whose doc_count is AT MOST max_doc_count, over the (user_id,
    event_type) composite term. A terms agg sorted ascending truncates
    arbitrarily; rare_terms returns the complete tail. One partial-
    aggregable groupBy; the post-aggregation doc_count filter rides the
    aggregate (Catalyst keeps it out of the scan but before any sort),
    so at 100 TB only tail buckets reach the final exchange."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .filter(F.col("doc_count") <= RARE_TERMS_MAX_DOCS)
        .orderBy("user_id", "event_type")
    )


QUERIES = {
    "range_agg_value": range_agg_value,
    "date_range_agg": date_range_agg,
    "multi_terms_agg": multi_terms_agg,
    "sampler_terms_agg": sampler_terms_agg,
    "adjacency_matrix_agg": adjacency_matrix_agg,
    "cardinality_by_type": cardinality_by_type,
    "scripted_metric_weighted": scripted_metric_weighted,
    "geo_distance_filter": geo_distance_filter,
    "rare_terms_agg": rare_terms_agg,
}

_ISODOW = "isodow(ts)"

ORACLE = {
    "rare_terms_agg": f"""
        SELECT user_id, event_type, COUNT(*) AS doc_count
        FROM events GROUP BY user_id, event_type
        HAVING COUNT(*) <= {RARE_TERMS_MAX_DOCS}
        ORDER BY user_id, event_type
    """,
    "range_agg_value": """
        SELECT CASE WHEN value < 25 THEN '*-25'
                    WHEN value < 100 THEN '25-100'
                    ELSE '100-*' END AS bucket,
               COUNT(*) AS doc_count,
               ROUND(AVG(value), 4) AS avg_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "date_range_agg": """
        SELECT CASE WHEN ts < TIMESTAMP '2024-01-15' THEN '1_before'
                    WHEN ts < TIMESTAMP '2024-01-22' THEN '2_anchor_week'
                    ELSE '3_after' END AS bucket,
               COUNT(*) AS doc_count,
               ROUND(SUM(value), 4) AS sum_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "multi_terms_agg": f"""
        SELECT event_type, {_ISODOW} AS isodow, COUNT(*) AS doc_count
        FROM events GROUP BY 1, 2
        ORDER BY doc_count DESC, event_type, isodow LIMIT 10
    """,
    "sampler_terms_agg": """
        SELECT event_type, COUNT(*) AS doc_count
        FROM events
        WHERE ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
        GROUP BY 1 ORDER BY doc_count DESC, event_type
    """,
    "adjacency_matrix_agg": f"""
        WITH flags AS (
            SELECT (event_type = 'error') AS a,
                   (value >= 50) AS b,
                   ({_ISODOW} >= 6) AS c
            FROM events
        ),
        one AS (
            SELECT SUM(CAST(a AS BIGINT)) AS a, SUM(CAST(b AS BIGINT)) AS b,
                   SUM(CAST(c AS BIGINT)) AS c,
                   SUM(CAST(a AND b AS BIGINT)) AS ab,
                   SUM(CAST(a AND c AS BIGINT)) AS ac,
                   SUM(CAST(b AND c AS BIGINT)) AS bc
            FROM flags
        )
        SELECT bucket, doc_count FROM (
            SELECT 'A' AS bucket, a AS doc_count FROM one
            UNION ALL SELECT 'B', b FROM one
            UNION ALL SELECT 'C', c FROM one
            UNION ALL SELECT 'A&B', ab FROM one
            UNION ALL SELECT 'A&C', ac FROM one
            UNION ALL SELECT 'B&C', bc FROM one
        ) WHERE doc_count > 0 ORDER BY bucket
    """,
    "cardinality_by_type": """
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "scripted_metric_weighted": """
        WITH w AS (
            SELECT event_type, value,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
            FROM events
        )
        SELECT event_type,
               ROUND(SUM(value * k) / SUM(k), 4) AS weighted_avg,
               ROUND(SUM(k), 1) AS total_weight
        FROM w GROUP BY 1 ORDER BY 1
    """,
    "geo_distance_filter": """
        WITH pts AS (
            SELECT event_type,
                   (user_id * 1201 % 18000) / 100.0 - 90.0 AS lat,
                   (event_id * 13 % 36000) / 100.0 - 180.0 AS lon
            FROM events
        ),
        d AS (
            SELECT event_type,
                   ROUND(2 * 6371.0 * asin(sqrt(
                       sin(radians(lat)/2) * sin(radians(lat)/2)
                       + cos(radians(lat)) * cos(0.0)
                         * sin(radians(lon)/2) * sin(radians(lon)/2))), 3) AS dist_km
            FROM pts
        )
        SELECT (FLOOR(dist_km / 1000) * 1000)::BIGINT AS ring_km,
               COUNT(*) AS doc_count
        FROM d WHERE dist_km <= 5000.0
        GROUP BY 1 ORDER BY 1
    """,
}
