"""Time-series / hypertable operators over the events stream table.

The reference's only time-series surface is the dashboard date-histogram
(DASHBOARD_GUIDE.md:37-40, Q6) recomputed from scratch at every refresh.
This module adds the operators a time-series store (TimescaleDB-style
hypertable rollups, OpenSearch date-histogram pipelines) layers on top
of that same bucketed shape — gap-filling, OHLC candles, moving
aggregates, anomaly scoring, hierarchical rollups and cohort retention —
each expressed as one declarative Catalyst plan.

Scale notes (100 TB):
- Every entry aggregates to a bounded bucket grid (hours/days × types)
  BEFORE any window function runs, so windows operate on thousands of
  rows regardless of input row count; the only wide shuffle is the
  initial partial+final aggregation on (type, bucket).
- The gap-fill calendar is generated with ``sequence()`` from a
  one-row bounds aggregate (broadcast), never materialized driver-side.
- Cohort retention joins per-user firsts with per-user weekly activity:
  both sides are pre-aggregated to one row per (user, week) so the join
  shuffles the reduced relation, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

_WEEK_SECONDS = 7 * 86400


def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly grid per event type with last-observation-carried-
    forward fill (TimescaleDB ``time_bucket_gapfill`` + ``locf``).

    Uses a deterministic sparse subset (event_id % 101 == 0) so the
    hourly grid actually has gaps at every SF. The calendar is built
    from ``sequence(min, max, 1 hour)`` over a broadcast one-row bounds
    aggregate; LOCF is ``last(value, ignorenulls)`` over the per-type
    ordered window — one shuffle on event_type for the window, sized by
    the grid (types × hours), not the input."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 101 == 0)
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.round(F.sum("value"), 4).alias("obs_sum"))
    bounds = hourly.agg(F.min("bucket").alias("mn"), F.max("bucket").alias("mx"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.sequence(F.col("mn"), F.col("mx"), F.expr("interval 1 hour"))
            ).alias("bucket"),
        )
    )
    joined = grid.join(hourly, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "event_type",
        "bucket",
        "obs_sum",
        F.last("obs_sum", ignorenulls=True).over(w).alias("locf_sum"),
        F.col("obs_sum").isNull().alias("gap_filled"),
    )


def ts_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily OHLC candles per event type: open/close by deterministic
    (ts, event_id) order, high/low/volume/total. The two row_number
    passes share one shuffle+sort on (type, day); the final aggregation
    is map-side partial over the already-partitioned run."""
    ev = load_table(spark, sf_dir, "events")
    sub = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
        "ts",
        "event_id",
    )
    w_asc = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    w_desc = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    marked = sub.select(
        "event_type",
        "day",
        "value",
        F.row_number().over(w_asc).alias("rn_a"),
        F.row_number().over(w_desc).alias("rn_d"),
    )
    return (
        marked.groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.sum("value"), 4).alias("total"),
        )
        .orderBy("event_type", "day")
    )


def ts_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day moving average and running cumulative sum over
    per-type daily totals. Daily totals are rounded BEFORE the window
    (both engines) so the moving aggregate consumes identical inputs."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("day_sum"))
    base = Window.partitionBy("event_type").orderBy("day")
    w7 = base.rowsBetween(-6, Window.currentRow)
    running = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return daily.select(
        "event_type",
        "day",
        "day_sum",
        F.round(F.avg("day_sum").over(w7), 4).alias("avg_7d"),
        F.round(F.sum("day_sum").over(running), 4).alias("cum_sum"),
    )


def ts_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anomalous days: per-type daily totals whose z-score against the
    type's full-series mean/stddev clears |z| >= 1.5. Whole-partition
    window (no ORDER BY → unbounded frame) over the tiny daily grid.
    The filter applies to the ROUNDED z in both engines so boundary
    behavior is identical."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum("value").alias("day_sum"))
    w = Window.partitionBy("event_type")
    scored = daily.select(
        "event_type",
        "day",
        F.round("day_sum", 4).alias("day_sum"),
        F.round(
            (F.col("day_sum") - F.avg("day_sum").over(w))
            / F.stddev_samp("day_sum").over(w),
            3,
        ).alias("zscore"),
    )
    return scored.filter(F.abs(F.col("zscore")) >= 1.5).orderBy("event_type", "day")


def ts_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical continuous-aggregate rollup: hour → day → week, each
    coarser level re-aggregated FROM the finer one (never from raw rows)
    — the hypertable cagg-on-cagg pattern. At scale only the hourly pass
    touches the fact table; day/week aggregate a few thousand rows."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("value").alias("total")
    )
    daily = hourly.groupBy(F.date_trunc("day", F.col("bucket")).alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    )
    weekly = daily.groupBy(F.date_trunc("week", F.col("bucket")).alias("bucket")).agg(
        F.sum("n").alias("n"), F.sum("total").alias("total")
    )
    lv = lambda df, g: df.select(  # noqa: E731
        F.lit(g).alias("granularity"),
        "bucket",
        "n",
        F.round("total", 2).alias("total"),
    )
    return (
        lv(hourly, "hour")
        .unionByName(lv(daily, "day"))
        .unionByName(lv(weekly, "week"))
        .orderBy("granularity", "bucket")
    )


def ts_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, distinct
    active users per (cohort week, week offset). Both join sides are
    pre-reduced to one row per user (firsts) and per (user, week)
    (activity) before the equi-join on user_id."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("week")
    ).distinct()
    return (
        activity.join(firsts, "user_id")
        .select(
            "cohort_week",
            (
                (F.unix_timestamp("week") - F.unix_timestamp("cohort_week"))
                / F.lit(_WEEK_SECONDS)
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def ts_regression_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type linear trend over daily totals: built-in regression
    aggregates (regr_slope/intercept/r2) of day_sum against day index —
    the trend-line a dashboard fits, computed as one associative
    aggregate (no iterative fitting). Day index is integer day offset
    from the epoch so both engines regress on identical x values."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.sum("value").alias("day_sum"))
    x = (F.unix_timestamp("day") / F.lit(86400)).cast("double")
    return (
        daily.groupBy("event_type")
        .agg(
            F.round(F.regr_slope(F.col("day_sum"), x), 3).alias("slope"),
            F.round(F.regr_intercept(F.col("day_sum"), x) / 1e6, 3).alias(
                "intercept_m"
            ),
            F.round(F.regr_r2(F.col("day_sum"), x), 4).alias("r2"),
        )
        .orderBy("event_type")
    )


def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily grid per event type with LINEAR interpolation across
    gaps (TimescaleDB ``time_bucket_gapfill`` + ``interpolate`` — the
    complement of ts_gapfill_locf's step fill). Same deterministic
    sparse subset (event_id % 101) so gaps exist at every SF; the
    bracketing observations come from two ignore-nulls window scans
    (last known behind, first known ahead) over the grid — sized by
    types × days, never the raw input. Edges outside the known range
    stay NULL, per the reference semantics."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") % 101 == 0)
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.round(F.sum("value"), 4).alias("obs"))
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence(F.col("mn"), F.col("mx"))).alias("day"),
        )
    )
    g = grid.join(daily, ["event_type", "day"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ahead = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    known_day = F.when(F.col("obs").isNotNull(), F.col("day"))
    g = g.select(
        "event_type",
        "day",
        "obs",
        F.last("obs", ignorenulls=True).over(back).alias("pv"),
        F.last(known_day, ignorenulls=True).over(back).alias("pd"),
        F.first("obs", ignorenulls=True).over(ahead).alias("nv"),
        F.first(known_day, ignorenulls=True).over(ahead).alias("nd"),
    )
    interp = F.when(F.col("obs").isNotNull(), F.col("obs")).otherwise(
        F.col("pv")
        + (F.col("nv") - F.col("pv"))
        * F.datediff(F.col("day"), F.col("pd"))
        / F.datediff(F.col("nd"), F.col("pd"))
    )
    return g.select(
        "event_type",
        "day",
        "obs",
        F.round(interp, 4).alias("filled"),
    ).orderBy("event_type", "day")


def ts_calendar_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar heatmap rollup: event volume and mean value per
    (ISO day-of-week, hour-of-day) cell — the 7×24 punchcard a
    monitoring dashboard renders. One partial+final aggregation keyed
    on the 168-cell domain."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            (F.weekday(F.col("ts")) + F.lit(1)).cast("long").alias("isodow"),
            F.hour("ts").cast("long").alias("hod"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("isodow", "hod")
    )


EWMA_DECAY, EWMA_SPAN = 0.7, 14  # alpha = 1 - decay = 0.3


def ts_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily event count
    over a trailing 14-day frame: weights decay^(k-1-i) normalized by
    the closed-form geometric sum, so the short head frames are proper
    weighted means. The frame list is collected over the aggregated day
    series only; the weighting is one array transform + fold per row of
    that tiny series."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.orderBy("day").rowsBetween(-(EWMA_SPAN - 1), 0)
    frame = F.collect_list("n").over(w)
    num = F.expr(
        f"aggregate(transform(l, (x, i) -> x * pow({EWMA_DECAY}, size(l) - 1 - i)), "
        "cast(0 as double), (acc, x) -> acc + x)"
    )
    den = (1 - F.pow(F.lit(EWMA_DECAY), F.size(F.col("l")))) / (1 - EWMA_DECAY)
    return (
        daily.select("day", "n", frame.alias("l"))
        .select("day", "n", F.round(num / den, 4).alias("ewma"))
        .orderBy("day")
    )


LTTB_BUCKETS = 30


def ts_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (the TimescaleDB
    ``lttb`` hyperfunction), parallel variant: the click series reduced
    to LTTB_BUCKETS visually-representative points. Each interior
    bucket keeps the point maximizing the triangle area against the
    NEIGHBOR BUCKET AVERAGES (the parallelizable form — classic LTTB
    anchors on the previously SELECTED point, a sequential dependency
    no engine can partition); first and last buckets keep their first/
    last points exactly, as in the reference algorithm. Bucket averages
    are rounded before the area math so the per-row area expression —
    pure IEEE *,+,- over identical operands — is bit-identical in both
    engines and the per-bucket argmax agrees everywhere."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    pts = ev.select(
        # exact integer MICROseconds: unix_timestamp() truncates the
        # sub-second part while DuckDB's epoch()::BIGINT rounds it —
        # micros are exact in both engines
        F.unix_micros("ts").alias("t"),
        F.col("value").alias("v"),
        "event_id",
    )
    # equal-TIME buckets from pure integer arithmetic over broadcast
    # bounds: no global sort, no driver action — the per-point bucket id
    # is a map-side expression, so every later step partitions on it
    bounds = pts.agg(F.min("t").alias("mn"), F.max("t").alias("mx"))
    bucketed = pts.crossJoin(F.broadcast(bounds)).withColumn(
        "bucket",
        F.least(
            # integer DIV, never float division: a double quotient that
            # rounds up across an integer boundary would flip a point's
            # bucket relative to the oracle's integer arithmetic
            F.expr(f"((t - mn) * {LTTB_BUCKETS}) DIV (mx - mn + 1)"),
            F.lit(LTTB_BUCKETS - 1).cast("long"),
        ),
    )
    avgs = bucketed.groupBy("bucket").agg(
        F.round(F.avg("t"), 6).alias("at"), F.round(F.avg("v"), 6).alias("av")
    )
    wb = Window.orderBy("bucket")  # 30-row series
    nb = F.broadcast(
        avgs.select(
            "bucket",
            F.lag("at").over(wb).alias("pt"),
            F.lag("av").over(wb).alias("pv"),
            F.lead("at").over(wb).alias("nt"),
            F.lead("av").over(wb).alias("nv"),
        )
    )
    area = F.abs(
        (F.col("pt") - F.col("nt")) * (F.col("v") - F.col("nv"))
        - (F.col("pt") - F.col("t")) * (F.col("nv") - F.col("pv"))
    )
    joined = bucketed.join(nb, "bucket")
    w_area = Window.partitionBy("bucket").orderBy(
        F.col("area").desc(), "t", "event_id"
    )
    w_first = Window.partitionBy("bucket").orderBy("t", "event_id")
    w_last = Window.partitionBy("bucket").orderBy(
        F.col("t").desc(), F.col("event_id").desc()
    )
    picked = (
        joined.withColumn("area", area)
        .withColumn(
            "rn",
            F.when(F.col("bucket") == 0, F.row_number().over(w_first))
            .when(
                F.col("bucket") == LTTB_BUCKETS - 1,
                F.row_number().over(w_last),
            )
            .otherwise(F.row_number().over(w_area)),
        )
        .filter(F.col("rn") == 1)
    )
    return picked.select(
        "bucket", "t", F.round("v", 4).alias("v")
    ).orderBy("bucket")


def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TimescaleDB ``time_weight('LOCF')``):
    per (event_type, day), each observation weighted by how long it
    held (seconds until the next observation in the day; the day's last
    point carries no weight). Integer-second durations make the weights
    exact; one window pass per (type, day) partition, then a keyed
    aggregation."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy(
        "event_type", F.date_trunc("day", F.col("ts"))
    ).orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))  # exact micros; seconds would truncate
    obs = ev.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        F.col("value").alias("v"),
        (F.lead(t).over(w) - t).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    return (
        obs.groupBy("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_weighted"),
            F.round(F.sum(F.col("v") * F.col("dur")) / F.sum("dur"), 4).alias(
                "twa"
            ),
        )
        .orderBy("event_type", "day")
    )


def ts_state_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State aggregation (TimescaleDB ``state_agg``): treating each
    user's event_type as a state machine, the total seconds spent in
    each state (duration = time until the user's next event; final
    events carry no duration) plus interval counts and the share of
    tracked time. Durations are exact integer seconds, so every engine
    agrees bit-for-bit; the lag/lead pass partitions on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = F.unix_micros(F.col("ts"))  # exact micros; seconds would truncate
    spans = ev.select(
        F.col("event_type").alias("state"),
        (F.lead(t).over(w) - t).alias("dur"),
    ).filter(F.col("dur").isNotNull())
    total = spans.agg(F.sum("dur").alias("total_dur"))
    return (
        spans.groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur").alias("micros_in_state"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "state",
            "n_intervals",
            "micros_in_state",
            F.round(F.col("micros_in_state") * 100.0 / F.col("total_dur"), 4)
            .alias("pct_time"),
        )
        .orderBy("state")
    )


QUERIES = {
    "ts_gapfill_locf": ts_gapfill_locf,
    "ts_interpolate_linear": ts_interpolate_linear,
    "ts_calendar_heatmap": ts_calendar_heatmap,
    "ts_ewma": ts_ewma,
    "ts_downsample_lttb": ts_downsample_lttb,
    "ts_time_weighted_avg": ts_time_weighted_avg,
    "ts_state_agg": ts_state_agg,
    "ts_ohlc_daily": ts_ohlc_daily,
    "ts_moving_avg": ts_moving_avg,
    "ts_zscore_anomaly": ts_zscore_anomaly,
    "ts_hierarchical_rollup": ts_hierarchical_rollup,
    "ts_retention_cohort": ts_retention_cohort,
    "ts_regression_trend": ts_regression_trend,
}

ORACLE = {
    "ts_downsample_lttb": f"""
        WITH pts AS (
            SELECT epoch_us(ts) AS t, value AS v, event_id
            FROM events WHERE event_type = 'click'
        ),
        bounds AS (SELECT MIN(t) AS mn, MAX(t) AS mx FROM pts),
        bucketed AS (
            SELECT p.*, LEAST(((t - mn) * {LTTB_BUCKETS}) // (mx - mn + 1),
                              {LTTB_BUCKETS - 1}) AS bucket
            FROM pts p, bounds
        ),
        avgs AS (
            SELECT bucket, ROUND(AVG(t), 6) AS at, ROUND(AVG(v), 6) AS av
            FROM bucketed GROUP BY bucket
        ),
        nb AS (
            SELECT bucket,
                   lag(at) OVER (ORDER BY bucket) AS pt,
                   lag(av) OVER (ORDER BY bucket) AS pv,
                   lead(at) OVER (ORDER BY bucket) AS nt,
                   lead(av) OVER (ORDER BY bucket) AS nv
            FROM avgs
        ),
        scored AS (
            SELECT b.bucket, b.t, b.v, b.event_id,
                   abs((pt - nt) * (b.v - nv) - (pt - b.t) * (nv - pv)) AS area
            FROM bucketed b JOIN nb USING (bucket)
        ),
        picked AS (
            SELECT bucket, t, v,
                   CASE
                     WHEN bucket = 0 THEN
                       ROW_NUMBER() OVER (PARTITION BY bucket
                                          ORDER BY t, event_id)
                     WHEN bucket = {LTTB_BUCKETS - 1} THEN
                       ROW_NUMBER() OVER (PARTITION BY bucket
                                          ORDER BY t DESC, event_id DESC)
                     ELSE
                       ROW_NUMBER() OVER (PARTITION BY bucket
                                          ORDER BY area DESC, t, event_id)
                   END AS rn
            FROM scored
        )
        SELECT bucket, t, ROUND(v, 4) AS v
        FROM picked WHERE rn = 1 ORDER BY bucket
    """,
    "ts_time_weighted_avg": """
        WITH obs AS (
            SELECT event_type, date_trunc('day', ts)::DATE AS day, value AS v,
                   lead(epoch_us(ts)) OVER w - epoch_us(ts) AS dur
            FROM events
            WINDOW w AS (PARTITION BY event_type, date_trunc('day', ts)
                         ORDER BY ts, event_id)
        )
        SELECT event_type, day, COUNT(*) AS n_weighted,
               ROUND(SUM(v * dur) / SUM(dur), 4) AS twa
        FROM obs WHERE dur IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ts_state_agg": """
        WITH spans AS (
            SELECT event_type AS state,
                   lead(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) - epoch_us(ts) AS dur
            FROM events
        ),
        valid AS (SELECT * FROM spans WHERE dur IS NOT NULL),
        total AS (SELECT SUM(dur) AS total_dur FROM valid)
        SELECT state, COUNT(*) AS n_intervals,
               CAST(SUM(dur) AS BIGINT) AS micros_in_state,
               ROUND(SUM(dur) * 100.0 / (SELECT total_dur FROM total), 4)
                   AS pct_time
        FROM valid GROUP BY state ORDER BY state
    """,
    "ts_interpolate_linear": """
        WITH sparse AS (SELECT * FROM events WHERE event_id % 101 = 0),
        daily AS (
            SELECT event_type, date_trunc('day', ts)::DATE AS day,
                   ROUND(SUM(value), 4) AS obs
            FROM sparse GROUP BY 1, 2
        ),
        bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM daily),
        grid AS (
            SELECT t.event_type, g.day::DATE AS day
            FROM (SELECT DISTINCT event_type FROM daily) t,
                 (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day
                  FROM bounds) g
        ),
        j AS (
            SELECT g.event_type, g.day, d.obs
            FROM grid g LEFT JOIN daily d USING (event_type, day)
        ),
        spanned AS (
            SELECT event_type, day, obs,
                   last_value(obs IGNORE NULLS) OVER back AS pv,
                   last_value(CASE WHEN obs IS NOT NULL THEN day END
                              IGNORE NULLS) OVER back AS pd,
                   first_value(obs IGNORE NULLS) OVER ahead AS nv,
                   first_value(CASE WHEN obs IS NOT NULL THEN day END
                               IGNORE NULLS) OVER ahead AS nd
            FROM j
            WINDOW back AS (PARTITION BY event_type ORDER BY day
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   ahead AS (PARTITION BY event_type ORDER BY day
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
        )
        SELECT event_type, day, obs,
               ROUND(CASE WHEN obs IS NOT NULL THEN obs
                          ELSE pv + (nv - pv)
                               * date_diff('day', pd, day)
                               / date_diff('day', pd, nd) END, 4) AS filled
        FROM spanned ORDER BY event_type, day
    """,
    "ts_calendar_heatmap": """
        SELECT isodow(ts) AS isodow, CAST(hour(ts) AS BIGINT) AS hod,
               COUNT(*) AS n, ROUND(AVG(value), 4) AS avg_value
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ts_ewma": """
        WITH daily AS (
            SELECT date_trunc('day', ts)::DATE AS day, COUNT(*) AS n
            FROM events GROUP BY 1
        ),
        framed AS (
            SELECT day, n,
                   list(n) OVER (ORDER BY day
                       ROWS BETWEEN 13 PRECEDING AND CURRENT ROW) AS l
            FROM daily
        )
        SELECT day, n,
               ROUND(list_sum(list_transform(l,
                         (x, i) -> x * pow(0.7, len(l) - i)))
                     / ((1 - pow(0.7, len(l))) / 0.3), 4) AS ewma
        FROM framed ORDER BY day
    """,
    "ts_gapfill_locf": """
        WITH sparse AS (SELECT * FROM events WHERE event_id % 101 = 0),
        hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS bucket,
                   ROUND(SUM(value), 4) AS obs_sum
            FROM sparse GROUP BY 1, 2
        ),
        bounds AS (SELECT min(bucket) AS mn, max(bucket) AS mx FROM hourly),
        grid AS (
            SELECT event_type,
                   unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS bucket
            FROM (SELECT DISTINCT event_type FROM hourly) CROSS JOIN bounds
        ),
        j AS (
            SELECT g.event_type, g.bucket, h.obs_sum
            FROM grid g LEFT JOIN hourly h USING (event_type, bucket)
        )
        SELECT event_type, bucket, obs_sum,
               last_value(obs_sum IGNORE NULLS) OVER (
                   PARTITION BY event_type ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_sum,
               obs_sum IS NULL AS gap_filled
        FROM j
    """,
    "ts_ohlc_daily": """
        WITH marked AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   value,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('day', ts)
                       ORDER BY ts, event_id) AS rn_a,
                   row_number() OVER (
                       PARTITION BY event_type, date_trunc('day', ts)
                       ORDER BY ts DESC, event_id DESC) AS rn_d
            FROM events
        )
        SELECT event_type, day,
               MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
               COUNT(*) AS volume,
               ROUND(SUM(value), 4) AS total
        FROM marked GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ts_moving_avg": """
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   ROUND(SUM(value), 4) AS day_sum
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day, day_sum,
               ROUND(AVG(day_sum) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS avg_7d,
               ROUND(SUM(day_sum) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS cum_sum
        FROM daily
    """,
    "ts_zscore_anomaly": """
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   SUM(value) AS day_sum
            FROM events GROUP BY 1, 2
        ),
        scored AS (
            SELECT event_type, day,
                   ROUND(day_sum, 4) AS day_sum,
                   ROUND((day_sum - AVG(day_sum) OVER (PARTITION BY event_type))
                         / stddev_samp(day_sum) OVER (PARTITION BY event_type),
                         3) AS zscore
            FROM daily
        )
        SELECT * FROM scored WHERE abs(zscore) >= 1.5 ORDER BY event_type, day
    """,
    "ts_hierarchical_rollup": """
        WITH hourly AS (
            SELECT date_trunc('hour', ts) AS bucket, COUNT(*) AS n,
                   SUM(value) AS total
            FROM events GROUP BY 1
        ),
        daily AS (
            SELECT date_trunc('day', bucket) AS bucket,
                   CAST(SUM(n) AS BIGINT) AS n, SUM(total) AS total
            FROM hourly GROUP BY 1
        ),
        weekly AS (
            SELECT date_trunc('week', bucket) AS bucket,
                   CAST(SUM(n) AS BIGINT) AS n, SUM(total) AS total
            FROM daily GROUP BY 1
        )
        SELECT 'hour' AS granularity, bucket, n, ROUND(total, 2) AS total FROM hourly
        UNION ALL
        SELECT 'day', bucket, n, ROUND(total, 2) FROM daily
        UNION ALL
        SELECT 'week', bucket, n, ROUND(total, 2) FROM weekly
        ORDER BY granularity, bucket
    """,
    "ts_retention_cohort": """
        WITH firsts AS (
            SELECT user_id, CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
            FROM events GROUP BY 1
        ),
        activity AS (
            SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS week
            FROM events
        )
        SELECT cohort_week,
               (CAST(epoch(week) AS BIGINT) - CAST(epoch(cohort_week) AS BIGINT))
                   // (7 * 86400) AS week_offset,
               COUNT(*) AS n_users
        FROM activity JOIN firsts USING (user_id)
        GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ts_regression_trend": """
        WITH daily AS (
            SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   SUM(value) AS day_sum
            FROM events GROUP BY 1, 2
        )
        SELECT event_type,
               ROUND(regr_slope(day_sum, epoch(day) / 86400), 3) AS slope,
               ROUND(regr_intercept(day_sum, epoch(day) / 86400) / 1e6, 3)
                   AS intercept_m,
               ROUND(regr_r2(day_sum, epoch(day) / 86400), 4) AS r2
        FROM daily GROUP BY 1 ORDER BY 1
    """,
}
