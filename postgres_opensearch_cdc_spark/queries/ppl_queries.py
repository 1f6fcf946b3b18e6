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


QUERIES = {
    "ppl_where_stats": ppl_where_stats,
    "ppl_top_sources": ppl_top_sources,
    "ppl_rare_langs": ppl_rare_langs,
    "ppl_eval_fields": ppl_eval_fields,
    "ppl_dedup_rename": ppl_dedup_rename,
    "ppl_parse_stats": ppl_parse_stats,
    "ppl_span_histogram": ppl_span_histogram,
}

ORACLE = {
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
}
