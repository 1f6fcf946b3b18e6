"""Time-series batch 2: cross-series statistics — the ES
``bucket_correlation`` pipeline aggregation, seasonal (hour-of-day)
decomposition, lag-k autocorrelation, and rolling cross-correlation.

All four reduce the raw event stream to a tiny date/hour-keyed series
with ONE partial-aggregated shuffle, then run the statistics on that
~30-to-720-row frame — the plans scale with the calendar, not the
event count. Value-checked against DuckDB oracles (corr/regr_slope are
the standard two-pass-free co-moment forms in both engines; outputs
are rounded to 4 decimals)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

CORR_A, CORR_B = "click", "view"
ACF_LAGS = (1, 7)
ROLL_CORR_DAYS = 7


def _safe_corr(a: str, b: str):
    """Pearson correlation as covar/(sd·sd) with try_divide: under ANSI
    mode (Spark 4 default) the built-in corr THROWS DIVIDE_BY_ZERO on a
    zero-variance series, while DuckDB's corr returns NULL — this form
    returns NULL like the oracle. Works as a plain or windowed
    aggregate."""
    return F.try_divide(
        F.covar_samp(a, b), F.stddev_samp(a) * F.stddev_samp(b)
    )


def _daily_counts(ev: DataFrame, *types: str) -> DataFrame:
    aggs = [
        F.sum((F.col("event_type") == t).cast("long")).alias(f"n_{t}")
        for t in types
    ]
    return ev.groupBy(F.to_date("ts").alias("day")).agg(*aggs)


def bucket_correlation_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bucket_correlation`` pipeline agg: Pearson correlation (and
    regression slope) between the daily click and view count series.
    The date histogram is the only event-scale shuffle; the correlation
    runs on the ~30-row series."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev, CORR_A, CORR_B)
    return daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.round(_safe_corr(f"n_{CORR_A}", f"n_{CORR_B}"), 4).alias(
            "correlation"
        ),
        F.round(
            F.try_divide(
                F.covar_samp(f"n_{CORR_A}", f"n_{CORR_B}"),
                F.var_samp(f"n_{CORR_B}"),
            ),
            4,
        ).alias("slope"),
    )


def ts_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, hour-of-day component: mean hourly event
    count per hour-of-day and the seasonal index (hod mean / global
    hourly mean). Two cascaded tiny aggregations after the one
    event-scale (day, hour) rollup; the index denominator rides along
    as a 1-row broadcast."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_hod = hourly.groupBy("hod").agg(F.avg("cnt").alias("mean_cnt"))
    overall = hourly.agg(F.avg("cnt").alias("global_mean"))
    return (
        per_hod.crossJoin(F.broadcast(overall))
        .select(
            "hod",
            F.round("mean_cnt", 4).alias("mean_cnt"),
            F.round(F.col("mean_cnt") / F.col("global_mean"), 4).alias(
                "seasonal_idx"
            ),
        )
        .orderBy("hod")
    )


def ts_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation of the daily event-count series (k = 1 and
    7): corr(x_t, x_{t-k}) over the aligned pairs — the stationarity /
    weekly-seasonality diagnostic. Lags come from one ordered window
    over the ~30-row series; each lag's correlation is a tiny
    aggregate."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "cnt",
        *[F.lag("cnt", k).over(w).alias(f"lag{k}") for k in ACF_LAGS],
    )
    def acf(k: int):
        # mask the marginal stddev of cnt to pairwise-complete rows
        # (the first k rows have NULL lag; covar_samp already does
        # pairwise deletion, the stddevs must match it)
        paired_cnt = F.when(F.col(f"lag{k}").isNotNull(), F.col("cnt"))
        return F.try_divide(
            F.covar_samp("cnt", f"lag{k}"),
            F.stddev_samp(paired_cnt) * F.stddev_samp(f"lag{k}"),
        )

    return lagged.agg(
        *[F.round(acf(k), 4).alias(f"acf{k}") for k in ACF_LAGS]
    )


def ts_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day cross-correlation between the daily click and view
    series: corr as a WINDOW aggregate over a trailing row frame —
    emitted only for fully-populated frames. The moving statistic a
    Dashboards panel overlays on the histogram."""
    ev = load_table(spark, sf_dir, "events")
    daily = _daily_counts(ev, CORR_A, CORR_B)
    w = (
        Window.orderBy("day")
        .rowsBetween(-(ROLL_CORR_DAYS - 1), Window.currentRow)
    )
    wn = Window.orderBy("day")
    return (
        daily.select(
            "day",
            # decompose over the SAME frame: three windowed aggregates,
            # combined null-safely (built-in windowed corr throws on a
            # zero-variance frame under ANSI)
            F.try_divide(
                F.covar_samp(f"n_{CORR_A}", f"n_{CORR_B}").over(w),
                F.stddev_samp(f"n_{CORR_A}").over(w)
                * F.stddev_samp(f"n_{CORR_B}").over(w),
            ).alias("rc"),
            F.row_number().over(wn).alias("rn"),
        )
        .filter(F.col("rn") >= ROLL_CORR_DAYS)
        .select("day", F.round("rc", 4).alias("rolling_corr"))
        .orderBy("day")
    )


ANOM_SIGMA = 2.5


def ts_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-adjusted anomaly detection: hourly counts minus the
    hour-of-day seasonal mean, flagged where the residual exceeds
    ANOM_SIGMA residual standard deviations — the deseasonalized twin
    of the plain z-score detector (ts_zscore_anomaly). Three cascaded
    tiny aggregations over the (day, hod) rollup; the residual sigma is
    a 1-row broadcast. Emits the anomalous cells with their residual
    z-score."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.to_date("ts").alias("day"), F.hour("ts").alias("hod")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    seasonal = hourly.groupBy("hod").agg(F.avg("cnt").alias("hod_mean"))
    resid = hourly.join(F.broadcast(seasonal), "hod").select(
        "day", "hod", "cnt", (F.col("cnt") - F.col("hod_mean")).alias("r")
    )
    sigma = resid.agg(F.stddev_samp("r").alias("sd"))
    return (
        resid.crossJoin(F.broadcast(sigma))
        .filter(F.abs(F.col("r")) > ANOM_SIGMA * F.col("sd"))
        .select(
            "day",
            "hod",
            "cnt",
            F.round(F.col("r") / F.col("sd"), 4).alias("resid_z"),
        )
        .orderBy("day", "hod")
    )


def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: for each
    user's time-ordered stream, count (from_type -> to_type) steps and
    the per-from transition probability — the path-analysis aggregate
    behind journey dashboards. The lead() lookup is one user-keyed
    window (same single-shuffle shape as the EQL sequence); the matrix
    itself is a 25-key aggregate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    per_from = Window.partitionBy("from_type")
    return (
        steps.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_steps"))
        .select(
            "from_type",
            "to_type",
            "n_steps",
            F.round(
                F.col("n_steps") / F.sum("n_steps").over(per_from), 4
            ).alias("p_transition"),
        )
        .orderBy("from_type", "to_type")
    )


QUERIES = {
    "bucket_correlation_agg": bucket_correlation_agg,
    "ts_seasonal_profile": ts_seasonal_profile,
    "ts_autocorr": ts_autocorr,
    "ts_rolling_corr": ts_rolling_corr,
    "ts_seasonal_anomaly": ts_seasonal_anomaly,
    "event_transition_matrix": event_transition_matrix,
}

_DAILY_AB = f"""
    SELECT CAST(ts AS DATE) AS day,
           CAST(SUM(CASE WHEN event_type = '{CORR_A}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN event_type = '{CORR_B}' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_b
    FROM events GROUP BY day
"""

ORACLE = {
    "bucket_correlation_agg": f"""
        WITH daily AS ({_DAILY_AB})
        SELECT COUNT(*) AS n_days,
               ROUND(covar_samp(n_a, n_b)
                     / (stddev_samp(n_a) * stddev_samp(n_b)), 4)
                   AS correlation,
               ROUND(covar_samp(n_a, n_b) / var_samp(n_b), 4) AS slope
        FROM daily
    """,
    "ts_seasonal_profile": """
        WITH hourly AS (
            SELECT CAST(ts AS DATE) AS day,
                   EXTRACT(hour FROM ts) AS hod, COUNT(*) AS cnt
            FROM events GROUP BY day, hod
        ), per_hod AS (
            SELECT hod, AVG(cnt) AS mean_cnt FROM hourly GROUP BY hod
        ), overall AS (
            SELECT AVG(cnt) AS global_mean FROM hourly
        )
        SELECT CAST(hod AS INTEGER) AS hod,
               ROUND(mean_cnt, 4) AS mean_cnt,
               ROUND(mean_cnt / global_mean, 4) AS seasonal_idx
        FROM per_hod, overall ORDER BY hod
    """,
    "ts_autocorr": f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events GROUP BY day
        ), lagged AS (
            SELECT cnt,
                   {", ".join(
                       f"LAG(cnt, {k}) OVER (ORDER BY day) AS lag{k}"
                       for k in ACF_LAGS
                   )}
            FROM daily
        )
        SELECT {", ".join(
            f"ROUND(covar_samp(cnt, lag{k}) / "
            f"(stddev_samp(CASE WHEN lag{k} IS NOT NULL THEN cnt END)"
            f" * stddev_samp(lag{k})), 4) AS acf{k}"
            for k in ACF_LAGS
        )}
        FROM lagged
    """,
    "ts_seasonal_anomaly": f"""
        WITH hourly AS (
            SELECT CAST(ts AS DATE) AS day,
                   EXTRACT(hour FROM ts) AS hod, COUNT(*) AS cnt
            FROM events GROUP BY day, hod
        ), seasonal AS (
            SELECT hod, AVG(cnt) AS hod_mean FROM hourly GROUP BY hod
        ), resid AS (
            SELECT day, h.hod, cnt, cnt - hod_mean AS r
            FROM hourly h JOIN seasonal s ON h.hod = s.hod
        ), sigma AS (
            SELECT stddev_samp(r) AS sd FROM resid
        )
        SELECT day, CAST(hod AS INTEGER) AS hod, cnt,
               ROUND(r / sd, 4) AS resid_z
        FROM resid, sigma
        WHERE ABS(r) > {ANOM_SIGMA} * sd
        ORDER BY day, hod
    """,
    "event_transition_matrix": """
        WITH steps AS (
            SELECT event_type AS from_type,
                   LEAD(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS to_type
            FROM events
        ), matrix AS (
            SELECT from_type, to_type, COUNT(*) AS n_steps
            FROM steps WHERE to_type IS NOT NULL
            GROUP BY from_type, to_type
        )
        SELECT from_type, to_type, n_steps,
               ROUND(n_steps / CAST(SUM(n_steps) OVER (
                   PARTITION BY from_type) AS DOUBLE), 4) AS p_transition
        FROM matrix
        ORDER BY from_type, to_type
    """,
    "ts_rolling_corr": f"""
        WITH daily AS ({_DAILY_AB}), rolled AS (
            SELECT day,
                   covar_samp(n_a, n_b) OVER w
                       / (stddev_samp(n_a) OVER w
                          * stddev_samp(n_b) OVER w) AS rc,
                   row_number() OVER (ORDER BY day) AS rn
            FROM daily
            WINDOW w AS (ORDER BY day
                         ROWS BETWEEN {ROLL_CORR_DAYS - 1} PRECEDING
                                  AND CURRENT ROW)
        )
        SELECT day, ROUND(rc, 4) AS rolling_corr
        FROM rolled WHERE rn >= {ROLL_CORR_DAYS} ORDER BY day
    """,
}
