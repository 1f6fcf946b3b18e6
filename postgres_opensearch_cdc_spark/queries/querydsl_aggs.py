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


def geo_bounding_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``geo_bounding_box`` filter: documents inside a lat/lon box,
    counted per event_type — the map-viewport query. Same deterministic
    coordinate derivation as geo_distance_filter (exact integer math, so
    both engines see identical points); the box predicate is pure
    comparison in the scan stage, then one low-cardinality agg."""
    ev = load_table(spark, sf_dir, "events")
    lat = (F.col("user_id") * 1201 % 18000) / F.lit(100.0) - F.lit(90.0)
    lon = (F.col("event_id") * 13 % 36000) / F.lit(100.0) - F.lit(180.0)
    return (
        ev.select("event_type", lat.alias("lat"), lon.alias("lon"))
        .filter(
            (F.col("lat") >= -45.0)
            & (F.col("lat") <= 45.0)
            & (F.col("lon") >= -90.0)
            & (F.col("lon") <= 90.0)
        )
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("event_type")
    )


def top_metrics_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top_metrics``: per bucket, the metric carried by the row that
    sorts first (here: latest (ts, event_id) per event_type) — the
    "current value per series" panel. max_by over a (ts, event_id)
    struct is partial-aggregable: each map task keeps one candidate per
    bucket, so the shuffle carries #buckets rows, where the window-
    function formulation would sort whole partitions."""
    ev = load_table(spark, sf_dir, "events")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy("event_type")
        .agg(
            F.max_by(F.round("value", 2), key).alias("latest_value"),
            F.max_by("event_id", key).alias("latest_event_id"),
        )
        .orderBy("event_type")
    )


def serial_diff_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``serial_diff`` pipeline aggregation (lag=1): day-over-day delta
    of the daily event count. The window is over the ALREADY-AGGREGATED
    daily series (~30 rows), so the single-partition ordering is on a
    post-shuffle relation the size of the date range, not the events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("doc_count"))
    w = Window.orderBy("day")
    return (
        daily.withColumn(
            "diff", F.col("doc_count") - F.lag("doc_count").over(w)
        )
        .orderBy("day")
    )


def moving_fn_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``moving_fn`` (min/max variant): trailing 7-day envelope of the
    daily value sum — the band a dashboard draws around a metric line.
    Daily sums are rounded BEFORE the window so both engines feed
    identical doubles into the order-insensitive min/max frames."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 2).alias("day_value"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            "day_value",
            F.min("day_value").over(w).alias("min_7d"),
            F.max("day_value").over(w).alias("max_7d"),
        )
        .orderBy("day")
    )


STRING_STATS_ROUND = 4


def string_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``string_stats``: per-source length stats + Shannon entropy of
    the character distribution. Lengths aggregate map-side; entropy
    explodes characters once (linear in corpus bytes) into a
    (source, char) count — the inner term sums over ≤ alphabet-size
    rows per source, tiny post-aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    lens = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.min(F.length("text")).alias("min_length"),
        F.max(F.length("text")).alias("max_length"),
        F.round(F.avg(F.length("text")), 2).alias("avg_length"),
    )
    chars = docs.select(
        "source", F.explode(F.split(F.col("text"), "")).alias("ch")
    ).filter(F.col("ch") != "")
    dist = chars.groupBy("source", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    tot = dist.groupBy("source").agg(F.sum("cnt").alias("total"))
    ent = (
        dist.join(tot, "source")
        .withColumn("p", F.col("cnt") / F.col("total"))
        .groupBy("source")
        .agg(F.round(-F.sum(F.col("p") * F.log("p")), STRING_STATS_ROUND).alias("entropy"))
    )
    return lens.join(ent, "source").orderBy("source")


def boxplot_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``boxplot`` aggregation: five-number summary (min, q1, median,
    q3, max) of value per event_type. Exact linear-interpolated
    percentiles — both engines use the same interpolation, so the
    values check exactly at 4dp. Per-group sort cost is bounded by
    bucket size; at 100 TB swap `percentile` for `percentile_approx`
    (the approx_sketches pattern) and keep the plan."""
    ev = load_table(spark, sf_dir, "events")
    p = F.percentile("value", F.lit([0.25, 0.5, 0.75]))
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.element_at(p, 1), 4).alias("q1"),
            F.round(F.element_at(p, 2), 4).alias("median"),
            F.round(F.element_at(p, 3), 4).alias("q3"),
            F.round(F.max("value"), 4).alias("v_max"),
        )
        .orderBy("event_type")
    )


def mad_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``median_absolute_deviation``: median(|x - median(x)|) per
    event_type — the robust dispersion metric. Two aggregation phases
    (per-group median, then median of absolute deviations after a
    broadcast join of the 5-row median table); DuckDB's built-in mad()
    is the oracle."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(
                F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)), 4
            ).alias("mad")
        )
        .orderBy("event_type")
    )


AUTO_HISTO_TARGET = 10  # target bucket count for auto_date_histogram


def auto_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``auto_date_histogram``: the engine picks the day interval so the
    date range lands in ~AUTO_HISTO_TARGET buckets — deterministic
    integer math from the global (min, max) day, carried on a 1-row
    broadcast (never a driver collect). Buckets are left-edge dates."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
    bounds = days.groupBy().agg(
        F.min("day").alias("dmin"), F.max("day").alias("dmax")
    )
    with_b = days.crossJoin(F.broadcast(bounds))
    iv = F.greatest(
        F.lit(1).cast("long"),
        F.ceil((F.datediff("dmax", "dmin") + 1) / F.lit(AUTO_HISTO_TARGET)),
    )
    idx = F.floor(F.datediff(F.col("day"), F.col("dmin")) / iv)
    bucket = F.date_add(F.col("dmin"), (idx * iv).cast("int"))
    return (
        with_b.groupBy(bucket.alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("bucket_start")
    )


def t_test_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``t_test`` aggregation (heteroscedastic / Welch): t-statistic for
    the value metric between two filter populations (purchase vs click
    events) — one pass of conditional aggregates (count / avg /
    var_samp under each predicate), then scalar arithmetic on the
    six partials. Entirely partial-aggregable; the shuffle carries one
    row."""
    ev = load_table(spark, sf_dir, "events")
    a = F.col("event_type") == "purchase"
    b = F.col("event_type") == "click"
    agg = ev.agg(
        F.count(F.when(a, 1)).alias("n1"),
        F.avg(F.when(a, F.col("value"))).alias("m1"),
        F.var_samp(F.when(a, F.col("value"))).alias("v1"),
        F.count(F.when(b, 1)).alias("n2"),
        F.avg(F.when(b, F.col("value"))).alias("m2"),
        F.var_samp(F.when(b, F.col("value"))).alias("v2"),
    )
    t = (F.col("m1") - F.col("m2")) / F.sqrt(
        F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    )
    return agg.select(
        "n1", "n2", F.round(t, 4).alias("t_stat")
    )


def cumulative_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``cumulative_cardinality`` pipeline aggregation: running count of
    distinct users who have ever purchased, per day (the converting-user
    growth curve). Exact formulation that avoids
    any running-distinct state: a user contributes on their FIRST day
    only (one groupBy(user) min), then daily first-sightings cumsum up
    — two low-cardinality shuffles and a ~30-row window, where the
    naive per-day distinct-union would rescan the corpus per bucket."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    first_day = ev.groupBy("user_id").agg(
        F.min(F.date_trunc("day", F.col("ts")).cast("date")).alias("day")
    )
    daily_new = first_day.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily_new.select(
            "day",
            "new_users",
            F.sum("new_users").over(w).alias("cum_users"),
        )
        .orderBy("day")
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
    "geo_bounding_box": geo_bounding_box,
    "top_metrics_agg": top_metrics_agg,
    "serial_diff_daily": serial_diff_daily,
    "moving_fn_minmax": moving_fn_minmax,
    "string_stats_agg": string_stats_agg,
    "boxplot_agg": boxplot_agg,
    "mad_agg": mad_agg,
    "auto_date_histogram": auto_date_histogram,
    "t_test_agg": t_test_agg,
    "cumulative_cardinality": cumulative_cardinality,
}

_ISODOW = "isodow(ts)"

ORACLE = {
    "t_test_agg": """
        WITH s AS (
            SELECT count(*) FILTER (event_type = 'purchase') AS n1,
                   avg(value) FILTER (event_type = 'purchase') AS m1,
                   var_samp(value) FILTER (event_type = 'purchase') AS v1,
                   count(*) FILTER (event_type = 'click') AS n2,
                   avg(value) FILTER (event_type = 'click') AS m2,
                   var_samp(value) FILTER (event_type = 'click') AS v2
            FROM events
        )
        SELECT n1, n2, ROUND((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 4) AS t_stat
        FROM s
    """,
    "cumulative_cardinality": """
        WITH fd AS (
            SELECT user_id, min(date_trunc('day', ts)::DATE) AS day
            FROM events WHERE event_type = 'purchase' GROUP BY user_id
        ),
        dn AS (SELECT day, count(*) AS new_users FROM fd GROUP BY day)
        SELECT day, new_users,
               CAST(SUM(new_users) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_users
        FROM dn ORDER BY day
    """,
    "boxplot_agg": """
        SELECT event_type,
               ROUND(MIN(value), 4) AS v_min,
               ROUND(quantile_cont(value, 0.25), 4) AS q1,
               ROUND(quantile_cont(value, 0.5), 4) AS median,
               ROUND(quantile_cont(value, 0.75), 4) AS q3,
               ROUND(MAX(value), 4) AS v_max
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "mad_agg": """
        SELECT event_type, ROUND(mad(value), 4) AS mad
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "auto_date_histogram": f"""
        WITH d AS (
            SELECT date_trunc('day', ts)::DATE AS day FROM events
        ),
        b AS (SELECT min(day) AS dmin, max(day) AS dmax FROM d),
        p AS (
            SELECT day, dmin,
                   greatest(1, ceil((date_diff('day', dmin, dmax) + 1)
                                    / {AUTO_HISTO_TARGET}.0))::BIGINT AS iv
            FROM d, b
        )
        SELECT dmin + (CAST(floor(date_diff('day', dmin, day) / iv) AS BIGINT)
                       * iv)::INT AS bucket_start,
               COUNT(*) AS doc_count
        FROM p GROUP BY 1 ORDER BY 1
    """,
    "geo_bounding_box": """
        SELECT event_type, COUNT(*) AS doc_count
        FROM (
            SELECT event_type,
                   (user_id * 1201 % 18000) / 100.0 - 90.0 AS lat,
                   (event_id * 13 % 36000) / 100.0 - 180.0 AS lon
            FROM events
        )
        WHERE lat BETWEEN -45.0 AND 45.0 AND lon BETWEEN -90.0 AND 90.0
        GROUP BY event_type ORDER BY event_type
    """,
    "top_metrics_agg": """
        SELECT event_type,
               ROUND(value, 2) AS latest_value,
               event_id AS latest_event_id
        FROM (
            SELECT event_type, value, event_id,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY ts DESC, event_id DESC) AS rn
            FROM events
        )
        WHERE rn = 1 ORDER BY event_type
    """,
    "serial_diff_daily": """
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day, COUNT(*) AS doc_count
            FROM events GROUP BY 1
        )
        SELECT day, doc_count,
               doc_count - lag(doc_count) OVER (ORDER BY day) AS diff
        FROM daily ORDER BY day
    """,
    "moving_fn_minmax": """
        WITH daily AS (
            SELECT date_trunc('day', ts) AS day,
                   ROUND(SUM(value), 2) AS day_value
            FROM events GROUP BY 1
        )
        SELECT day, day_value,
               MIN(day_value) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS min_7d,
               MAX(day_value) OVER (ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS max_7d
        FROM daily ORDER BY day
    """,
    "string_stats_agg": """
        WITH lens AS (
            SELECT source, COUNT(*) AS doc_count,
                   MIN(length(text)) AS min_length,
                   MAX(length(text)) AS max_length,
                   ROUND(AVG(length(text)), 2) AS avg_length
            FROM documents GROUP BY source
        ),
        chars AS (
            SELECT source, unnest(regexp_split_to_array(text, '')) AS ch
            FROM documents
        ),
        dist AS (
            SELECT source, ch, COUNT(*) AS cnt FROM chars
            WHERE ch != '' GROUP BY source, ch
        ),
        tot AS (SELECT source, SUM(cnt) AS total FROM dist GROUP BY source),
        ent AS (
            SELECT d.source,
                   ROUND(-SUM((cnt * 1.0 / total) * ln(cnt * 1.0 / total)), 4)
                       AS entropy
            FROM dist d JOIN tot USING (source) GROUP BY d.source
        )
        SELECT lens.source, doc_count, min_length, max_length, avg_length,
               entropy
        FROM lens JOIN ent ON ent.source = lens.source
        ORDER BY lens.source
    """,
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
            SELECT CAST(SUM(CAST(a AS BIGINT)) AS BIGINT) AS a,
                   CAST(SUM(CAST(b AS BIGINT)) AS BIGINT) AS b,
                   CAST(SUM(CAST(c AS BIGINT)) AS BIGINT) AS c,
                   CAST(SUM(CAST(a AND b AS BIGINT)) AS BIGINT) AS ab,
                   CAST(SUM(CAST(a AND c AS BIGINT)) AS BIGINT) AS ac,
                   CAST(SUM(CAST(b AND c AS BIGINT)) AS BIGINT) AS bc
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
