"""OpenSearch aggregation-DSL parity, batch 4: the pipeline-aggregation
family (derivative / *_bucket / bucket_sort / bucket_selector /
normalize / rate / moving percentiles-of-buckets) plus the remaining
metric aggs (extended_stats, matrix_stats, geo_centroid, geotile-style
grid, diversified_sampler, pinned query). The reference repo's
dashboards stop at terms + date-histogram (DASHBOARD_GUIDE.md:30-61);
these are declared extensions in the same DSL family per SURVEY §2.7.

Scale notes: every pipeline agg here is two-phase — a partial+final
aggregation over the scan (map-side combine, one shuffle on the bucket
key) followed by window/sort logic over the BUCKET SERIES, which is
tiny (days, types, users — thousands of rows at 100 TB, not billions).
The single-partition window warnings on that second phase are
intentional: the heavy data never enters a window. geo cells and
sampler hashes use exact integer arithmetic so every engine and
parallelism level sees identical buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

# deterministic per-doc hash for the diversified sampler (Knuth
# multiplicative; exact in BIGINT for every engine)
_KNUTH = 2654435761
_HASH_MOD = 4294967296


def _daily(ev: DataFrame, event_type: str) -> DataFrame:
    """Daily doc-count series for one event type — the shared date-
    histogram input of the pipeline aggs. Partial-agged map-side; the
    result is one row per day."""
    return (
        ev.filter(F.col("event_type") == event_type)
        .groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def extended_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch `extended_stats`: count/min/max/avg/sum plus
    sum-of-squares and POPULATION variance/stddev per event type (ES
    reports population moments; `stats_agg` already covers the sample
    variants). Single-pass moment sketch, fully partial-aggregable."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.min("value"), 4).alias("v_min"),
            F.round(F.max("value"), 4).alias("v_max"),
            F.round(F.avg("value"), 4).alias("v_avg"),
            F.round(F.sum("value"), 2).alias("v_sum"),
            F.round(F.sum(F.col("value") * F.col("value")), 2).alias("sum_sq"),
            F.round(F.var_pop("value"), 4).alias("var_pop"),
            F.round(F.stddev_pop("value"), 4).alias("std_pop"),
        )
        .orderBy("event_type")
    )


def derivative_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`derivative` pipeline agg: day-over-day change of the daily click
    count (first bucket's derivative is null, as in ES). The window runs
    over the aggregated day series only."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.orderBy("day")
    return (
        _daily(ev, "click")
        .withColumn("deriv", F.col("n") - F.lag("n").over(w))
        .orderBy("day")
    )


def stats_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`stats_bucket` pipeline agg: min/max/avg/sum over the daily
    purchase-count buckets (sibling aggregation on the bucket series,
    one output row). Integer bucket values make avg exact in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    return _daily(ev, "purchase").agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.min("n").alias("min_n"),
        F.max("n").alias("max_n"),
        F.round(F.avg("n"), 4).alias("avg_n"),
        F.sum("n").alias("sum_n"),
    )


def percentiles_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`percentiles_bucket` pipeline agg: exact p50/p90/p99 of the daily
    event counts (all types). Linear interpolation in both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    return daily.agg(
        F.round(F.expr("percentile(n, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(n, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(n, 0.99)"), 4).alias("p99"),
    )


def max_bucket_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`max_bucket` pipeline agg: the day whose purchase count is the
    maximum over the date histogram (earliest day on ties, matching
    ES's first-key reporting). Bucket series only — no full-data
    window."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily(ev, "purchase")
    top = daily.agg(F.max("n").alias("max_n"))
    return (
        daily.join(F.broadcast(top), daily["n"] == top["max_n"])
        .agg(F.min("day").alias("day"), F.max("n").alias("value"))
    )


def bucket_sort_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bucket_sort` pipeline agg with `from`/`size`: terms buckets on
    user_id sorted by doc count desc (user_id asc tie-break), skip the
    top 5, return the next 10 — the paging form a Dashboards table
    issues. Sort+offset runs on the aggregated bucket series."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), F.col("user_id"))
        .offset(5)
        .limit(10)
    )


def bucket_selector_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bucket_selector` pipeline agg: keep only the daily buckets whose
    error share exceeds 20% (`params.errors * 5 > params.total`) — the
    alerting-style HAVING over a date histogram. Pure integer predicate,
    so bucket membership is identical in every engine."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("errors"),
        )
        .filter(F.col("errors") * 5 > F.col("total"))
        .orderBy("day")
    )


def normalize_pct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`normalize` pipeline agg (`percent_of_sum`): each event type's
    doc count as a share of the total. The total is a broadcast scalar
    over the 5-row bucket series."""
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("doc_count"))
    total = per_type.agg(F.sum("doc_count").alias("total"))
    return (
        per_type.join(F.broadcast(total))
        .select(
            "event_type",
            "doc_count",
            F.round(F.col("doc_count") * 100.0 / F.col("total"), 4).alias("pct"),
        )
        .orderBy("event_type")
    )


def rate_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`rate` aggregation: monthly click volume re-expressed as a
    per-day rate (count / days-in-month), the unit-conversion form ES
    computes inside a date_histogram. Integer count over integer days —
    identical doubles everywhere."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("month", F.col("ts")).cast("date").alias("month"))
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .withColumn("days", F.dayofmonth(F.last_day(F.col("month"))).cast("long"))
        .select(
            "month",
            "doc_count",
            F.round(F.col("doc_count") / F.col("days"), 4).alias("per_day_rate"),
        )
        .orderBy("month")
    )


def geo_centroid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo_centroid` aggregation: mean lat/lon per event type over the
    deterministic synthetic coordinates (same integer derivation as
    geo_distance_filter — the fixtures carry no geo columns)."""
    ev = load_table(spark, sf_dir, "events")
    lat = (F.col("user_id") * 1201 % 18000) / F.lit(100.0) - F.lit(90.0)
    lon = (F.col("event_id") * 13 % 36000) / F.lit(100.0) - F.lit(180.0)
    return (
        ev.select("event_type", lat.alias("lat"), lon.alias("lon"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg("lat"), 4).alias("centroid_lat"),
            F.round(F.avg("lon"), 4).alias("centroid_lon"),
        )
        .orderBy("event_type")
    )


def geo_grid_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geotile/geohash-grid style aggregation: 10-degree grid cells with
    per-cell counts, top 20 cells (count desc, cell asc). Cells are
    derived with pure integer arithmetic (never through float lat/lon),
    so bucket edges are exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    cell_y = F.expr("CAST((user_id * 1201 % 18000) DIV 1000 AS LONG)")
    cell_x = F.expr("CAST((event_id * 13 % 36000) DIV 1000 AS LONG)")
    return (
        ev.select(cell_y.alias("cell_y"), cell_x.alias("cell_x"))
        .groupBy("cell_y", "cell_x")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), "cell_y", "cell_x")
        .limit(20)
    )


def matrix_stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`matrix_stats` aggregation: population covariance + Pearson
    correlation between the value field and a second numeric field
    (the deterministic user cohort user_id % 100). Single-pass co-moment
    sketch, fully partial-aggregable."""
    ev = load_table(spark, sf_dir, "events")
    cohort = (F.col("user_id") % 100).cast("double")
    return ev.select(F.col("value"), cohort.alias("cohort")).agg(
        F.count(F.lit(1)).alias("doc_count"),
        F.round(F.covar_pop("value", "cohort"), 4).alias("covariance"),
        F.round(F.corr("value", "cohort"), 6).alias("correlation"),
    )


def diversified_sampler_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`diversified_sampler` aggregation: at most 3 documents per source
    (de-biasing the dominant source), then the metric agg — count and
    mean length per language — over the diversified sample. ES's
    shard-local randomness is replaced by a deterministic Knuth
    multiplicative hash so every engine/parallelism selects the same
    sample; the per-source top-3 is a bounded window over each source
    partition (parallel across sources)."""
    docs = load_table(spark, sf_dir, "documents")
    dhash = (F.col("doc_id") * _KNUTH) % _HASH_MOD
    w = Window.partitionBy("source").orderBy(dhash.asc(), F.col("doc_id").asc())
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
        .orderBy("lang")
    )


_PINNED = [3, 11, 19]


def pinned_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`pinned` query: the listed event ids surface first (in list
    order), the organic remainder ranks by value desc (event_id asc
    tie-break), top 15 overall. The orderBy+limit compiles to
    TakeOrderedAndProject — per-partition top-k, no global sort."""
    ev = load_table(spark, sf_dir, "events")
    pin_pos = F.when(F.col("event_id") == _PINNED[0], 0)
    for i, pid in enumerate(_PINNED[1:], start=1):
        pin_pos = pin_pos.when(F.col("event_id") == pid, i)
    pin_pos = pin_pos.otherwise(F.lit(None).cast("int"))
    return (
        ev.select(
            "event_id",
            "event_type",
            F.round(F.col("value"), 4).alias("score"),
            pin_pos.isNotNull().cast("boolean").alias("pinned"),
            pin_pos.alias("_pin"),
        )
        .orderBy(
            F.col("_pin").asc_nulls_last(),
            F.col("score").desc(),
            F.col("event_id").asc(),
        )
        .limit(15)
        .drop("_pin")
    )


def moving_percentiles_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`moving_percentiles` pipeline agg: exact p50/p90 of the daily
    event count over a trailing 7-day frame. The percentile aggregate
    runs as a window function over the aggregated day series (tens of
    rows) — the raw scan only feeds the date histogram."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return (
        daily.select(
            "day",
            "n",
            F.round(F.expr("percentile(n, 0.5)").over(w), 4).alias("p50_7d"),
            F.round(F.expr("percentile(n, 0.9)").over(w), 4).alias("p90_7d"),
        )
        .orderBy("day")
    )


def frequent_item_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`frequent_item_sets` aggregation (market basket): 2-item sets of
    event types co-occurring in the same user's history, with support =
    number of users exhibiting both. The per-user distinct item list is
    aggregated first (one shuffle on user_id, ≤5 items each), pairs are
    generated from that tiny relation, and the final count is keyed on
    the 25-pair domain — the raw event scan never self-joins."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.select("user_id", "event_type").distinct()
    a = per_user.alias("a")
    b = per_user.alias("b")
    return (
        a.join(b, "user_id")
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .orderBy(F.col("support").desc(), "item_a", "item_b")
        .limit(10)
    )


_EARTH_KM = 6371.0


def geo_line_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`geo_line` aggregation: per-user travel path over the
    deterministic synthetic coordinates, ordered by time — total
    haversine path length and point count for the 10 longest tracks.
    Each segment distance is rounded before summing (the per-row
    round-3 haversine is engine-identical, proven by
    geo_distance_filter), so the path sums agree bit-for-bit. The lag
    window partitions on user_id — high cardinality, fully parallel."""
    ev = load_table(spark, sf_dir, "events")
    lat = F.radians((F.col("user_id") * 1201 % 18000) / F.lit(100.0) - F.lit(90.0))
    lon = F.radians((F.col("event_id") * 13 % 36000) / F.lit(100.0) - F.lit(180.0))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pts = ev.select(
        "user_id", "ts", "event_id", lat.alias("la"), lon.alias("lo")
    ).select(
        "user_id",
        "la",
        "lo",
        F.lag("la").over(w).alias("pla"),
        F.lag("lo").over(w).alias("plo"),
    )
    h = (
        F.sin((F.col("la") - F.col("pla")) / 2) ** 2
        + F.cos(F.col("pla"))
        * F.cos(F.col("la"))
        * F.sin((F.col("lo") - F.col("plo")) / 2) ** 2
    )
    seg = F.round(2 * F.lit(_EARTH_KM) * F.asin(F.sqrt(h)), 3)
    return (
        pts.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum(seg), 2).alias("track_km"),
        )
        .orderBy(F.col("track_km").desc(), "user_id")
        .limit(10)
    )


KS_A, KS_B = "click", "view"


def ks_test_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`bucket_count_ks_test` analog: the exact two-sample
    Kolmogorov-Smirnov D statistic between the value distributions of
    two event types — D = sup|F_a(x) − F_b(x)| over the pooled sample,
    via cumulative counts in a RANGE window (ties collapse correctly:
    every row of equal value sees the same cumulative count). The
    ratios divide exact integers, so both engines compute identical
    doubles. Computed DISTRIBUTED (round 12): ties collapse by a
    per-value pre-aggregate (one (value, a_cnt, b_cnt) row per
    distinct value — exactly the RANGE-frame tie semantics made
    explicit), then exact cumulative counts via the two-phase
    range-partition + offset construction (functions/ranking.py) —
    one range shuffle over the distinct-value table, never a
    single-partition window over the event scan. The oracle keeps
    the canonical range-window formulation."""
    from postgres_opensearch_cdc_spark.functions.ranking import (
        running_totals,
    )

    ev = load_table(spark, sf_dir, "events")
    sample = ev.filter(F.col("event_type").isin(KS_A, KS_B)).select(
        "value",
        (F.col("event_type") == KS_A).cast("long").alias("is_a"),
        (F.col("event_type") == KS_B).cast("long").alias("is_b"),
    )
    by_value = sample.groupBy("value").agg(
        F.sum("is_a").alias("a_cnt"), F.sum("is_b").alias("b_cnt")
    )
    ecdf, totals = running_totals(by_value, ["value"],
                                  ["a_cnt", "b_cnt"])
    n_a, n_b = totals["a_cnt"], totals["b_cnt"]
    return ecdf.agg(
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.round(
            F.max(
                F.abs(
                    F.col("cum_a_cnt") / F.lit(float(n_a))
                    - F.col("cum_b_cnt") / F.lit(float(n_b))
                )
            ),
            6,
        ).alias("d_stat"),
    )


def min_sum_bucket_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`min_bucket` + `sum_bucket` pipeline aggs in one result: the day
    whose purchase count is the minimum over the date histogram
    (earliest day on ties, ES's first-key reporting) plus the sum over
    all buckets. Bucket series only — no full-data window."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily(ev, "purchase")
    bottom = daily.agg(
        F.min("n").alias("min_n"), F.sum("n").alias("sum_value")
    )
    return (
        daily.join(F.broadcast(bottom), daily["n"] == bottom["min_n"])
        .agg(
            F.min("day").alias("min_day"),
            F.max("n").alias("min_value"),
            F.first("sum_value").alias("sum_value"),
        )
    )


QUERIES = {
    "extended_stats_agg": extended_stats_agg,
    "frequent_item_sets_agg": frequent_item_sets_agg,
    "moving_percentiles_agg": moving_percentiles_agg,
    "geo_line_agg": geo_line_agg,
    "ks_test_agg": ks_test_agg,
    "min_sum_bucket_agg": min_sum_bucket_agg,
    "derivative_agg": derivative_agg,
    "stats_bucket_agg": stats_bucket_agg,
    "percentiles_bucket_agg": percentiles_bucket_agg,
    "max_bucket_day": max_bucket_day,
    "bucket_sort_agg": bucket_sort_agg,
    "bucket_selector_agg": bucket_selector_agg,
    "normalize_pct_agg": normalize_pct_agg,
    "rate_agg": rate_agg,
    "geo_centroid_agg": geo_centroid_agg,
    "geo_grid_agg": geo_grid_agg,
    "matrix_stats_agg": matrix_stats_agg,
    "diversified_sampler_agg": diversified_sampler_agg,
    "pinned_query": pinned_query,
}

_DAILY_CLICKS = """
        SELECT date_trunc('day', ts)::DATE AS day, COUNT(*) AS n
        FROM events WHERE event_type = 'click' GROUP BY 1
"""

_DAILY_PURCHASES = """
        SELECT date_trunc('day', ts)::DATE AS day, COUNT(*) AS n
        FROM events WHERE event_type = 'purchase' GROUP BY 1
"""

ORACLE = {
    "geo_line_agg": """
        WITH p1 AS (
            SELECT user_id, ts, event_id,
                   radians((user_id * 1201 % 18000) / 100.0 - 90.0) AS la,
                   radians((event_id * 13 % 36000) / 100.0 - 180.0) AS lo
            FROM events
        ),
        p2 AS (
            SELECT user_id, la, lo,
                   lag(la) OVER w AS pla, lag(lo) OVER w AS plo
            FROM p1
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        segs AS (
            SELECT user_id,
                   ROUND(2 * 6371.0 * asin(sqrt(
                       pow(sin((la - pla) / 2), 2)
                       + cos(pla) * cos(la) * pow(sin((lo - plo) / 2), 2)
                   )), 3) AS seg
            FROM p2
        )
        SELECT user_id, COUNT(*) AS n_points, ROUND(SUM(seg), 2) AS track_km
        FROM segs GROUP BY 1
        ORDER BY track_km DESC, user_id LIMIT 10
    """,
    "moving_percentiles_agg": """
        WITH daily AS (
            SELECT date_trunc('day', ts)::DATE AS day, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT day, n,
               ROUND(quantile_cont(n, 0.5) OVER (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS p50_7d,
               ROUND(quantile_cont(n, 0.9) OVER (ORDER BY day
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS p90_7d
        FROM daily ORDER BY day
    """,
    "frequent_item_sets_agg": """
        WITH per_user AS (
            SELECT DISTINCT user_id, event_type FROM events
        )
        SELECT a.event_type AS item_a, b.event_type AS item_b,
               COUNT(*) AS support
        FROM per_user a JOIN per_user b USING (user_id)
        WHERE a.event_type < b.event_type
        GROUP BY 1, 2
        ORDER BY support DESC, item_a, item_b
        LIMIT 10
    """,
    "extended_stats_agg": """
        SELECT event_type, COUNT(*) AS doc_count,
               ROUND(MIN(value), 4) AS v_min, ROUND(MAX(value), 4) AS v_max,
               ROUND(AVG(value), 4) AS v_avg, ROUND(SUM(value), 2) AS v_sum,
               ROUND(SUM(value * value), 2) AS sum_sq,
               ROUND(var_pop(value), 4) AS var_pop,
               ROUND(stddev_pop(value), 4) AS std_pop
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "derivative_agg": f"""
        WITH daily AS ({_DAILY_CLICKS})
        SELECT day, n, n - LAG(n) OVER (ORDER BY day) AS deriv
        FROM daily ORDER BY day
    """,
    "stats_bucket_agg": f"""
        WITH daily AS ({_DAILY_PURCHASES})
        SELECT COUNT(*) AS n_buckets, MIN(n) AS min_n, MAX(n) AS max_n,
               ROUND(AVG(n), 4) AS avg_n, CAST(SUM(n) AS BIGINT) AS sum_n
        FROM daily
    """,
    "percentiles_bucket_agg": """
        WITH daily AS (
            SELECT date_trunc('day', ts)::DATE AS day, COUNT(*) AS n
            FROM events GROUP BY 1
        )
        SELECT ROUND(quantile_cont(n, 0.5), 4) AS p50,
               ROUND(quantile_cont(n, 0.9), 4) AS p90,
               ROUND(quantile_cont(n, 0.99), 4) AS p99
        FROM daily
    """,
    "max_bucket_day": f"""
        WITH daily AS ({_DAILY_PURCHASES})
        SELECT MIN(day) AS day, MAX(n) AS value
        FROM daily WHERE n = (SELECT MAX(n) FROM daily)
    """,
    "ks_test_agg": f"""
        WITH sample AS (
            SELECT value,
                   CASE WHEN event_type = '{KS_A}' THEN 1 ELSE 0 END AS is_a,
                   CASE WHEN event_type = '{KS_B}' THEN 1 ELSE 0 END AS is_b
            FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
        ), totals AS (
            SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
                   CAST(SUM(is_b) AS BIGINT) AS n_b
            FROM sample
        ), ecdf AS (
            SELECT SUM(is_a) OVER w AS cum_a, SUM(is_b) OVER w AS cum_b
            FROM sample
            WINDOW w AS (ORDER BY value RANGE BETWEEN UNBOUNDED PRECEDING
                                                 AND CURRENT ROW)
        )
        SELECT ANY_VALUE(n_a) AS n_a, ANY_VALUE(n_b) AS n_b,
               ROUND(MAX(ABS(cum_a / CAST(n_a AS DOUBLE)
                             - cum_b / CAST(n_b AS DOUBLE))), 6) AS d_stat
        FROM ecdf, totals
    """,
    "min_sum_bucket_agg": f"""
        WITH daily AS ({_DAILY_PURCHASES})
        SELECT MIN(day) AS min_day, MAX(n) AS min_value,
               (SELECT CAST(SUM(n) AS BIGINT) FROM daily) AS sum_value
        FROM daily WHERE n = (SELECT MIN(n) FROM daily)
    """,
    "bucket_sort_agg": """
        SELECT user_id, COUNT(*) AS doc_count
        FROM events GROUP BY 1
        ORDER BY doc_count DESC, user_id
        LIMIT 10 OFFSET 5
    """,
    "bucket_selector_agg": """
        SELECT date_trunc('day', ts)::DATE AS day, COUNT(*) AS total,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errors
        FROM events GROUP BY 1
        HAVING CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) * 5 > COUNT(*)
        ORDER BY day
    """,
    "normalize_pct_agg": """
        WITH per_type AS (
            SELECT event_type, COUNT(*) AS doc_count FROM events GROUP BY 1
        )
        SELECT event_type, doc_count,
               ROUND(doc_count * 100.0 / (SELECT SUM(doc_count) FROM per_type),
                     4) AS pct
        FROM per_type ORDER BY event_type
    """,
    "rate_agg": """
        WITH m AS (
            SELECT date_trunc('month', ts)::DATE AS month, COUNT(*) AS doc_count
            FROM events WHERE event_type = 'click' GROUP BY 1
        )
        SELECT month, doc_count,
               ROUND(doc_count / date_part('day', last_day(month))::DOUBLE,
                     4) AS per_day_rate
        FROM m ORDER BY month
    """,
    "geo_centroid_agg": """
        SELECT event_type, COUNT(*) AS doc_count,
               ROUND(AVG((user_id * 1201 % 18000) / 100.0 - 90.0), 4)
                   AS centroid_lat,
               ROUND(AVG((event_id * 13 % 36000) / 100.0 - 180.0), 4)
                   AS centroid_lon
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "geo_grid_agg": """
        SELECT (user_id * 1201 % 18000) // 1000 AS cell_y,
               (event_id * 13 % 36000) // 1000 AS cell_x,
               COUNT(*) AS doc_count
        FROM events GROUP BY 1, 2
        ORDER BY doc_count DESC, cell_y, cell_x
        LIMIT 20
    """,
    "matrix_stats_agg": """
        SELECT COUNT(*) AS doc_count,
               ROUND(covar_pop(value, (user_id % 100)::DOUBLE), 4)
                   AS covariance,
               ROUND(corr(value, (user_id % 100)::DOUBLE), 6) AS correlation
        FROM events
    """,
    "diversified_sampler_agg": f"""
        WITH ranked AS (
            SELECT lang, n_chars,
                   ROW_NUMBER() OVER (
                       PARTITION BY source
                       ORDER BY (doc_id * {_KNUTH}) % {_HASH_MOD}, doc_id
                   ) AS rn
            FROM documents
        )
        SELECT lang, COUNT(*) AS doc_count,
               ROUND(AVG(n_chars), 4) AS avg_chars
        FROM ranked WHERE rn <= 3
        GROUP BY 1 ORDER BY 1
    """,
    "pinned_query": f"""
        SELECT event_id, event_type, ROUND(value, 4) AS score,
               event_id IN ({", ".join(str(p) for p in _PINNED)}) AS pinned
        FROM events
        ORDER BY (CASE event_id
                      WHEN {_PINNED[0]} THEN 0 WHEN {_PINNED[1]} THEN 1
                      WHEN {_PINNED[2]} THEN 2 END) NULLS LAST,
                 ROUND(value, 4) DESC, event_id
        LIMIT 15
    """,
}
