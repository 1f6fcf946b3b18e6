"""Event-sequence analytics: EQL-style ``sequence by ... with maxspan``
(plus the ``until`` terminator), funnel step conversion, and CUSUM
change-point detection — the event-correlation surface an OpenSearch/
Elastic user drives with EQL and the ML change_point aggregation over
the same mirrored event stream the reference maintains
(DASHBOARD_GUIDE.md event dashboards; TDD :1624-1653).

Spark-first shapes: the per-user "earliest future B" lookup is a
running MIN over a time-DESCENDING window — one shuffle on user_id, no
self-join, no explode; the funnel is three cascaded pre-aggregated
joins; CUSUM is a cumulative window over the tiny daily-count domain.
All entries are value-checked against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

SEQ_FIRST, SEQ_SECOND, SEQ_UNTIL = "signup", "purchase", "error"
SEQ_MAXSPAN_S = 24 * 3600  # maxspan=24h


def _future_min(event_type: str):
    """Earliest ts of `event_type` at-or-after the current row within
    the user's timeline: MIN over a ts-DESC window (later rows precede)
    — the positional lookup EQL's state machine keeps, as one window
    aggregate."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.min(
        F.when(F.col("event_type") == event_type, F.col("ts"))
    ).over(w)


def eql_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL ``sequence by user_id [signup] [purchase] with maxspan=24h``:
    per user, how many signup events were followed by a purchase within
    the span, and the tightest lag. One user-keyed shuffle; the future
    lookup is a window running-min, so no self-join materializes the
    O(pairs) blow-up an equi-join formulation would."""
    ev = load_table(spark, sf_dir, "events")
    enriched = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "ts",
        _future_min(SEQ_SECOND).alias("next_b"),
    )
    lag_s = F.col("next_b").cast("long") - F.col("ts").cast("long")
    matches = enriched.filter(
        (F.col("event_type") == SEQ_FIRST)
        & F.col("next_b").isNotNull()
        & (lag_s <= SEQ_MAXSPAN_S)
    )
    return (
        matches.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sequences"),
            F.min(lag_s).alias("min_lag_s"),
        )
        .orderBy("user_id")
    )


def eql_sequence_until(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EQL ``sequence`` with ``until [error]``: the signup→purchase
    match is discarded if an error event intervenes before the
    purchase. Both future lookups (earliest purchase, earliest error)
    ride the SAME window pass; per user emits completed vs blocked
    sequence counts."""
    ev = load_table(spark, sf_dir, "events")
    enriched = ev.select(
        "user_id",
        "event_type",
        "ts",
        _future_min(SEQ_SECOND).alias("next_b"),
        _future_min(SEQ_UNTIL).alias("next_u"),
    )
    lag_s = F.col("next_b").cast("long") - F.col("ts").cast("long")
    in_span = (
        (F.col("event_type") == SEQ_FIRST)
        & F.col("next_b").isNotNull()
        & (lag_s <= SEQ_MAXSPAN_S)
    )
    blocked = F.col("next_u").isNotNull() & (F.col("next_u") < F.col("next_b"))
    return (
        enriched.filter(in_span)
        .groupBy("user_id")
        .agg(
            F.sum((~blocked).cast("long")).alias("n_completed"),
            F.sum(blocked.cast("long")).alias("n_blocked"),
        )
        .orderBy("user_id")
    )


FUNNEL = ("view", "click", "purchase")


def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion view→click→purchase: users reaching each step
    in order (each step strictly after the user's FIRST event of the
    previous step). Three cascaded aggregations, each pre-aggregated to
    one row per user before the next join — the shuffles move only
    (user, ts) pairs, never raw events twice."""
    ev = load_table(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == FUNNEL[1])
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == FUNNEL[2])
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        t1.join(t2, "user_id", "left")
        .join(t3, "user_id", "left")
        .agg(
            F.count("t1").alias("step1_users"),
            F.count("t2").alias("step2_users"),
            F.count("t3").alias("step3_users"),
            F.round(F.count("t2") / F.count("t1"), 4).alias("conv_1_2"),
            F.round(F.count("t3") / F.count("t1"), 4).alias("conv_1_3"),
        )
    )


def change_point_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``change_point`` aggregation (CUSUM form): the day where the
    cumulative deviation of daily event counts from the global mean
    peaks in magnitude — the classic mean-shift detector. Daily counts
    are one partial-aggregated shuffle to a ~30-row domain; everything
    after (mean broadcast, cumulative window, argmax, before/after
    means) runs on that tiny frame, so the plan scales with days, not
    events."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mean = daily.agg(F.avg("cnt").alias("m"))
    wd = Window.orderBy("day")
    cusum = (
        daily.crossJoin(F.broadcast(mean))
        .select("day", "cnt", F.sum(F.col("cnt") - F.col("m")).over(wd).alias("s"))
    )
    cp = (
        cusum.orderBy(F.abs(F.col("s")).desc(), "day")
        .limit(1)
        .select(F.col("day").alias("change_day"), F.col("s").alias("peak"))
    )
    return (
        daily.crossJoin(F.broadcast(cp))
        .agg(
            F.first("change_day").alias("change_day"),
            F.round(F.first("peak"), 4).alias("cusum_peak"),
            F.round(
                F.avg(F.when(F.col("day") <= F.col("change_day"), F.col("cnt"))), 4
            ).alias("mean_before"),
            F.round(
                F.avg(F.when(F.col("day") > F.col("change_day"), F.col("cnt"))), 4
            ).alias("mean_after"),
        )
    )


QUERIES = {
    "eql_sequence": eql_sequence,
    "eql_sequence_until": eql_sequence_until,
    "funnel_steps": funnel_steps,
    "change_point_cusum": change_point_cusum,
}

_FUTURE_MIN_SQL = (
    "MIN(CASE WHEN event_type = '{t}' THEN ts END) OVER "
    "(PARTITION BY user_id ORDER BY ts DESC, event_id DESC "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
)

ORACLE = {
    "eql_sequence": f"""
        WITH enriched AS (
            SELECT user_id, event_type, ts,
                   {_FUTURE_MIN_SQL.format(t=SEQ_SECOND)} AS next_b
            FROM events
        )
        SELECT user_id, COUNT(*) AS n_sequences,
               CAST(MIN(date_diff('second', ts, next_b)) AS BIGINT)
                   AS min_lag_s
        FROM enriched
        WHERE event_type = '{SEQ_FIRST}' AND next_b IS NOT NULL
          AND date_diff('second', ts, next_b) <= {SEQ_MAXSPAN_S}
        GROUP BY user_id ORDER BY user_id
    """,
    "eql_sequence_until": f"""
        WITH enriched AS (
            SELECT user_id, event_type, ts,
                   {_FUTURE_MIN_SQL.format(t=SEQ_SECOND)} AS next_b,
                   {_FUTURE_MIN_SQL.format(t=SEQ_UNTIL)} AS next_u
            FROM events
        )
        SELECT user_id,
               CAST(SUM(CASE WHEN next_u IS NOT NULL AND next_u < next_b
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_completed,
               CAST(SUM(CASE WHEN next_u IS NOT NULL AND next_u < next_b
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
        FROM enriched
        WHERE event_type = '{SEQ_FIRST}' AND next_b IS NOT NULL
          AND date_diff('second', ts, next_b) <= {SEQ_MAXSPAN_S}
        GROUP BY user_id ORDER BY user_id
    """,
    "funnel_steps": f"""
        WITH t1 AS (
            SELECT user_id, MIN(ts) AS t1 FROM events
            WHERE event_type = '{FUNNEL[0]}' GROUP BY user_id
        ), t2 AS (
            SELECT e.user_id, MIN(e.ts) AS t2
            FROM events e JOIN t1 ON e.user_id = t1.user_id
            WHERE e.event_type = '{FUNNEL[1]}' AND e.ts > t1.t1
            GROUP BY e.user_id
        ), t3 AS (
            SELECT e.user_id, MIN(e.ts) AS t3
            FROM events e JOIN t2 ON e.user_id = t2.user_id
            WHERE e.event_type = '{FUNNEL[2]}' AND e.ts > t2.t2
            GROUP BY e.user_id
        )
        SELECT COUNT(t1.t1) AS step1_users,
               COUNT(t2.t2) AS step2_users,
               COUNT(t3.t3) AS step3_users,
               ROUND(COUNT(t2.t2) / CAST(COUNT(t1.t1) AS DOUBLE), 4)
                   AS conv_1_2,
               ROUND(COUNT(t3.t3) / CAST(COUNT(t1.t1) AS DOUBLE), 4)
                   AS conv_1_3
        FROM t1
        LEFT JOIN t2 ON t1.user_id = t2.user_id
        LEFT JOIN t3 ON t1.user_id = t3.user_id
    """,
    "change_point_cusum": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
            FROM events GROUP BY day
        ), stats AS (
            SELECT AVG(cnt) AS m FROM daily
        ), cusum AS (
            SELECT day, cnt, SUM(cnt - m) OVER (ORDER BY day) AS s
            FROM daily, stats
        ), cp AS (
            SELECT day AS change_day, s AS peak
            FROM cusum ORDER BY ABS(s) DESC, day LIMIT 1
        )
        SELECT ANY_VALUE(change_day) AS change_day,
               ROUND(ANY_VALUE(peak), 4) AS cusum_peak,
               ROUND(AVG(CASE WHEN day <= change_day THEN cnt END), 4)
                   AS mean_before,
               ROUND(AVG(CASE WHEN day > change_day THEN cnt END), 4)
                   AS mean_after
        FROM daily, cp
    """,
}
