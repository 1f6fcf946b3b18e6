"""PPL pipelines as oracle-checked surface entries: the OpenSearch
Dashboards piped query language (the reference stack's second query
API besides the DSL), each compiled by postgres_opensearch_cdc_spark.
ppl into ONE Catalyst plan and value-checked against handwritten
DuckDB SQL — the compiler's output is verified, not just its parser.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postgres_opensearch_cdc_spark.ppl import ppl

PPL_WHERE_STATS = (
    "source=events | where value > 400 and event_type = 'click' "
    "| stats count() as cnt, sum(value) as sum_value by user_id "
    "| eval sum_r = round(sum_value, 2) "
    "| fields user_id, cnt, sum_r "
    "| sort -cnt, +user_id | head 10"
)
PPL_TOP_SOURCES = "source=documents | top 5 source"
PPL_RARE_LANGS = "source=documents | rare 3 lang"
PPL_EVAL_FIELDS = (
    "source=orders | eval bucket = floor(o_totalprice / 1000) "
    "| stats count() as n, max(o_totalprice) as max_price by bucket "
    "| sort +bucket"
)
PPL_DEDUP_RENAME = (
    "source=events | fields event_type | dedup event_type "
    "| rename event_type as type | sort +type"
)
PPL_PARSE_STATS = (
    "source=events | parse props '\"k\": (?<kval>[0-9]+)' "
    "| stats count() as n by kval | sort -n, +kval | head 10"
)
PPL_SPAN_HISTOGRAM = (
    "source=events | where event_type = 'error' "
    "| stats count() as n, dc(user_id) as users by span(ts, 1d) as day "
    "| sort +day"
)
PPL_EVENTSTATS_SHARE = (
    "source=events | eventstats count() as type_total by event_type "
    "| stats count() as user_n, max(type_total) as type_total "
    "by event_type, user_id "
    "| eval share_bp = floor(user_n * 10000 / type_total) "
    "| fields event_type, user_id, user_n, share_bp "
    "| sort -share_bp, +event_type, +user_id | head 20"
)
PPL_TRENDLINE_DAILY = (
    "source=events | where event_type in ('click', 'view') "
    "| stats count() as n by span(ts, 1d) as day "
    "| sort +day | trendline sma(7, n) as n_sma7 "
    "| fillnull with 0.0 in n_sma7 "
    "| sort +day | head 40"
)
PPL_JOIN_SEGMENT = (
    "source=orders | rename o_custkey as c_custkey "
    "| join on c_custkey customer "
    "| stats count() as n_orders, sum(o_totalprice) as rev by c_mktsegment "
    "| eval revenue = round(rev, 2) "
    "| fields c_mktsegment, n_orders, revenue | sort +c_mktsegment"
)
PPL_LOOKUP_NATION = (
    "source=customer | lookup nation n_nationkey as c_nationkey "
    "| stats count() as n_cust, sum(c_acctbal) as bal by n_name "
    "| eval bal_r = round(bal, 2) "
    "| fields n_name, n_cust, bal_r | sort +n_name"
)
PPL_IN_LIKE = (
    "source=part | where p_size in (5, 10, 15) and like(p_type, '%ROMO%') "
    "and not p_brand = 'Brand#5' "
    "| stats count() as n by p_brand | sort -n, +p_brand | head 10"
)
PPL_GROK_STATS = (
    "source=events | grok props '\"k\": %{INT:kv}' "
    "| where event_type = 'click' "
    "| stats count() as n by kv | sort -n, +kv | head 5"
)
PPL_PATTERNS_TEMPLATE = (
    "source=events | patterns props as tpl "
    "| stats count() as n by tpl | sort -n, +tpl"
)
PPL_SPAN_15M = (
    "source=events | where event_type = 'purchase' "
    "| stats count() as n, sum(value) as v by span(ts, 15m) as bucket "
    "| eval v_r = round(v, 2) "
    "| fields bucket, n, v_r | sort +bucket | head 50"
)
PPL_EVAL_STRINGS = (
    "source=customer | eval seg = substring(c_mktsegment, 1, 3) "
    "| eval band = if(c_acctbal > 5000, 'high', 'low') "
    "| stats count() as n by seg, band | sort +seg, +band"
)


def ppl_where_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where → stats-by → eval → fields → sort → head: the canonical
    dashboard pipeline. Filter pushes to the scan, stats is a
    partial+final aggregate, sort+head is TakeOrderedAndProject."""
    return ppl(spark, sf_dir, PPL_WHERE_STATS)


def ppl_top_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top N field`` — most frequent values with deterministic
    tie-break."""
    return ppl(spark, sf_dir, PPL_TOP_SOURCES)


def ppl_rare_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rare N field`` — least frequent values."""
    return ppl(spark, sf_dir, PPL_RARE_LANGS)


def ppl_eval_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eval (arithmetic + floor) feeding a stats-by on the derived
    column — the computed-bucket histogram shape."""
    return ppl(spark, sf_dir, PPL_EVAL_FIELDS)


def ppl_dedup_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fields → dedup → rename — the distinct-values utility
    pipeline."""
    return ppl(spark, sf_dir, PPL_DEDUP_RENAME)


def ppl_parse_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse`` (regex named-group extraction from the raw JSON
    payload) feeding a stats-by — the log-field-extraction pipeline
    PPL is most used for. regexp_extract runs in the scan
    projection."""
    return ppl(spark, sf_dir, PPL_PARSE_STATS)


def ppl_span_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``stats ... by span(ts, 1d)`` — PPL's time-bucketed histogram
    (count + distinct users per day of error events)."""
    return ppl(spark, sf_dir, PPL_SPAN_HISTOGRAM)


def ppl_eventstats_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``eventstats`` (window aggregate appended without collapsing
    rows) feeding a grouped share-of-total: the top-20 users by share
    of their event type's volume (rank-based, so the entry is
    non-vacuous at every SF — a fixed share threshold goes empty as
    the user count grows). The window count and the group-by are two
    shuffles on the same key (event_type) — Catalyst reuses the
    partitioning."""
    return ppl(spark, sf_dir, PPL_EVENTSTATS_SHARE)


def ppl_trendline_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``trendline sma(7, n)`` over the daily event series + ``fillnull``
    — PPL's moving-average smoothing. The window is over the small
    post-aggregate series (days), so the single-partition window is
    bounded regardless of input scale."""
    return ppl(spark, sf_dir, PPL_TRENDLINE_DAILY)


def ppl_join_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``join`` — revenue by market segment via the orders⋈customer
    equi-join (rename aligns the key names first, as PPL users do)."""
    return ppl(spark, sf_dir, PPL_JOIN_SEGMENT)


def ppl_lookup_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``lookup`` — broadcast enrichment of customers with their
    nation row, then stats by the looked-up name. The lookup table is
    a dimension: broadcast hash join, no shuffle of the fact side."""
    return ppl(spark, sf_dir, PPL_LOOKUP_NATION)


def ppl_in_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """where-clause extensions: ``in (...)``, ``like(f, pat)`` and
    ``not`` — all compiled into scan-pushable predicates."""
    return ppl(spark, sf_dir, PPL_IN_LIKE)


def ppl_grok_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``grok`` — %{SYNTAX:name} pattern extraction (the named-pattern
    layer over parse), feeding a stats-by. The expanded regex runs as
    regexp_extract in the scan projection."""
    return ppl(spark, sf_dir, PPL_GROK_STATS)


def ppl_patterns_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``patterns`` — mask letters/digits to reveal each message's
    punctuation template, then count templates: the log-template
    discovery command."""
    return ppl(spark, sf_dir, PPL_PATTERNS_TEMPLATE)


def ppl_span_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span(ts, 15m)`` — N-unit sub-hour time bucketing via
    epoch-floored arithmetic (engine-portable, scan-stage)."""
    return ppl(spark, sf_dir, PPL_SPAN_15M)


def ppl_eval_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """eval's string/conditional built-ins (substring, if) deriving
    grouping keys — compiled into the scan projection like every other
    eval."""
    return ppl(spark, sf_dir, PPL_EVAL_STRINGS)

PPL_DISPERSION_STATS = (
    "source=events | stats avg(value) as avg_v, stddev(value) as sd_v, "
    "var(value) as var_v, percentile(value, 90) as p90_v by event_type "
    "| eval avg_r = round(avg_v, 4) | eval sd_r = round(sd_v, 4) "
    "| eval var_r = round(var_v, 4) | eval p90_r = round(p90_v, 4) "
    "| fields event_type, avg_r, sd_r, var_r, p90_r | sort +event_type"
)


def ppl_dispersion_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stats with the dispersion aggregates (stddev/var sample forms,
    exact linear-interpolation percentile) — all partial+final
    aggregates in one pass; eval-rounding after stats pins engine
    parity at 4 decimals."""
    return ppl(spark, sf_dir, PPL_DISPERSION_STATS)


PPL_FIELDSUMMARY = (
    "source=events | fieldsummary includefields=value, user_id, event_type "
    "| sort +field"
)


def ppl_fieldsummary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `fieldsummary` data-profiling command: per-field count /
    distinct / min / max / nulls in ONE aggregation pass (every
    per-field aggregate is partial+final over the scan), unpivoted by
    a constant-width stack. min/max surface as strings so mixed-type
    fields share one column."""
    return ppl(spark, sf_dir, PPL_FIELDSUMMARY)


PPL_EXPAND_TOKENS = (
    "source=documents | where doc_id < 25 "
    "| eval tok = split(text, ' ') | expand tok "
    "| stats count() as cnt by tok | sort -cnt, +tok | head 20"
)


def ppl_expand_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `expand` multivalue command: eval splits text into an array,
    expand fans out one row per element (a scan-stage generator — no
    shuffle), then a token frequency stats/sort/head. The doc_id
    pre-filter pushes to the parquet scan so the fan-out touches only
    the selected partition of the corpus."""
    return ppl(spark, sf_dir, PPL_EXPAND_TOKENS)


PPL_AD_ZSCORE = (
    "source=events | where isnotnull(value) "
    "| ad value threshold=2.5 by event_type "
    "| where anomaly = 1 | fields event_id, event_type, score "
    "| sort +event_id"
)


def ppl_ad_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `ad` command (deterministic z-score analog of the hosted
    RCF detector): per-event_type mean/stddev_pop windows, |z| above
    the threshold flags the row. Composes with the rest of the
    pipeline (filter on the appended anomaly column, projection,
    sort)."""
    return ppl(spark, sf_dir, PPL_AD_ZSCORE)



QUERIES = {
    "ppl_ad_zscore": ppl_ad_zscore,
    "ppl_dispersion_stats": ppl_dispersion_stats,
    "ppl_fieldsummary": ppl_fieldsummary,
    "ppl_expand_tokens": ppl_expand_tokens,
    "ppl_where_stats": ppl_where_stats,
    "ppl_top_sources": ppl_top_sources,
    "ppl_rare_langs": ppl_rare_langs,
    "ppl_eval_fields": ppl_eval_fields,
    "ppl_dedup_rename": ppl_dedup_rename,
    "ppl_parse_stats": ppl_parse_stats,
    "ppl_span_histogram": ppl_span_histogram,
    "ppl_eventstats_share": ppl_eventstats_share,
    "ppl_trendline_daily": ppl_trendline_daily,
    "ppl_join_segment": ppl_join_segment,
    "ppl_lookup_nation": ppl_lookup_nation,
    "ppl_in_like": ppl_in_like,
    "ppl_grok_stats": ppl_grok_stats,
    "ppl_patterns_template": ppl_patterns_template,
    "ppl_eval_strings": ppl_eval_strings,
    "ppl_span_15m": ppl_span_15m,
}

ORACLE = {
    "ppl_fieldsummary": """
        SELECT * FROM (
            SELECT 'event_type' AS field,
                   COUNT(event_type) AS "count",
                   COUNT(DISTINCT event_type) AS distinct_count,
                   CAST(MIN(event_type) AS VARCHAR) AS "min",
                   CAST(MAX(event_type) AS VARCHAR) AS "max",
                   CAST(SUM(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS nulls
            FROM events
            UNION ALL
            SELECT 'user_id', COUNT(user_id), COUNT(DISTINCT user_id),
                   CAST(MIN(user_id) AS VARCHAR),
                   CAST(MAX(user_id) AS VARCHAR),
                   CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM events
            UNION ALL
            SELECT 'value', COUNT(value), COUNT(DISTINCT value),
                   CAST(MIN(value) AS VARCHAR),
                   CAST(MAX(value) AS VARCHAR),
                   CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM events
        ) ORDER BY field
    """,
    "ppl_expand_tokens": """
        SELECT tok, COUNT(*) AS cnt FROM (
            SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents WHERE doc_id < 25
        )
        GROUP BY tok ORDER BY cnt DESC, tok LIMIT 20
    """,
    "ppl_ad_zscore": """
        WITH s AS (
            SELECT event_id, event_type, value,
                   AVG(value) OVER (PARTITION BY event_type) AS mu,
                   STDDEV_POP(value) OVER (PARTITION BY event_type) AS sd
            FROM events WHERE value IS NOT NULL
        ), z AS (
            SELECT event_id, event_type,
                   ROUND(CASE WHEN sd > 0 THEN (value - mu) / sd
                              ELSE 0.0 END, 4) AS score
            FROM s
        )
        SELECT event_id, event_type, score FROM z
        WHERE ABS(score) > 2.5 ORDER BY event_id
    """,
    "ppl_dispersion_stats": """
        SELECT event_type,
               ROUND(AVG(value), 4) AS avg_r,
               ROUND(STDDEV_SAMP(value), 4) AS sd_r,
               ROUND(VAR_SAMP(value), 4) AS var_r,
               ROUND(QUANTILE_CONT(value, 0.90), 4) AS p90_r
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
    "ppl_where_stats": """
        SELECT user_id, COUNT(*) AS cnt,
               ROUND(SUM(value), 2) AS sum_r
        FROM events
        WHERE value > 400 AND event_type = 'click'
        GROUP BY user_id
        ORDER BY cnt DESC, user_id LIMIT 10
    """,
    "ppl_top_sources": """
        SELECT source, COUNT(*) AS count FROM documents
        GROUP BY source ORDER BY count DESC, source LIMIT 5
    """,
    "ppl_rare_langs": """
        SELECT lang, COUNT(*) AS count FROM documents
        GROUP BY lang ORDER BY count ASC, lang LIMIT 3
    """,
    "ppl_eval_fields": """
        SELECT CAST(FLOOR(o_totalprice / 1000) AS BIGINT) AS bucket,
               COUNT(*) AS n, MAX(o_totalprice) AS max_price
        FROM orders GROUP BY bucket ORDER BY bucket
    """,
    "ppl_dedup_rename": """
        SELECT DISTINCT event_type AS type FROM events ORDER BY type
    """,
    "ppl_parse_stats": """
        SELECT regexp_extract(props, '"k": ([0-9]+)', 1) AS kval,
               COUNT(*) AS n
        FROM events
        GROUP BY kval ORDER BY n DESC, kval LIMIT 10
    """,
    "ppl_span_histogram": """
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               COUNT(*) AS n, COUNT(DISTINCT user_id) AS users
        FROM events WHERE event_type = 'error'
        GROUP BY day ORDER BY day
    """,
    "ppl_eventstats_share": """
        WITH e AS (
            SELECT event_type, user_id,
                   COUNT(*) OVER (PARTITION BY event_type) AS type_total
            FROM events
        ), g AS (
            SELECT event_type, user_id, COUNT(*) AS user_n,
                   MAX(type_total) AS type_total
            FROM e GROUP BY 1, 2
        )
        SELECT event_type, user_id, user_n,
               CAST(FLOOR(user_n * 10000 / type_total) AS BIGINT) AS share_bp
        FROM g
        ORDER BY share_bp DESC, event_type, user_id LIMIT 20
    """,
    "ppl_trendline_daily": """
        WITH d AS (
            SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
                   COUNT(*) AS n
            FROM events WHERE event_type IN ('click', 'view')
            GROUP BY 1
        )
        SELECT day, n,
               COALESCE(CASE WHEN COUNT(*) OVER w >= 7
                             THEN AVG(n) OVER w END, 0.0) AS n_sma7
        FROM d
        WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
        ORDER BY day LIMIT 40
    """,
    "ppl_join_segment": """
        SELECT c_mktsegment, COUNT(*) AS n_orders,
               ROUND(SUM(o_totalprice), 2) AS revenue
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY 1 ORDER BY 1
    """,
    "ppl_lookup_nation": """
        SELECT n_name, COUNT(*) AS n_cust,
               ROUND(SUM(c_acctbal), 2) AS bal_r
        FROM customer LEFT JOIN nation ON c_nationkey = n_nationkey
        GROUP BY 1 ORDER BY 1
    """,
    "ppl_in_like": """
        SELECT p_brand, COUNT(*) AS n FROM part
        WHERE p_size IN (5, 10, 15) AND p_type LIKE '%ROMO%'
          AND NOT p_brand = 'Brand#5'
        GROUP BY 1 ORDER BY n DESC, p_brand LIMIT 10
    """,
    "ppl_grok_stats": r"""
        SELECT regexp_extract(props, '"k": ([+-]?\d+)', 1) AS kv,
               COUNT(*) AS n
        FROM events WHERE event_type = 'click'
        GROUP BY 1 ORDER BY n DESC, kv LIMIT 5
    """,
    "ppl_patterns_template": """
        SELECT regexp_replace(props, '[a-zA-Z0-9]', '', 'g') AS tpl,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY n DESC, tpl
    """,
    "ppl_eval_strings": """
        SELECT substring(c_mktsegment, 1, 3) AS seg,
               CASE WHEN c_acctbal > 5000 THEN 'high' ELSE 'low' END AS band,
               COUNT(*) AS n
        FROM customer GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "ppl_span_15m": """
        SELECT CAST(to_timestamp((CAST(FLOOR(epoch(ts)) AS BIGINT) // 900)
                    * 900) AS TIMESTAMP) AS bucket,
               COUNT(*) AS n, ROUND(SUM(value), 2) AS v_r
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1 ORDER BY 1 LIMIT 50
    """,
}
