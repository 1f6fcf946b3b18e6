"""Oracle-checkable CDC surface: the mirror-maintenance semantics of the
reference (W1/W2/ST1/ST2/T9, SURVEY §2.2-2.3) run over the driver's
``events`` table reinterpreted as a changelog (FIXTURES.md §3: "treat
event_type as op-code analog").

The changelog mapping (cdc.envelope.events_as_changelog): key = user_id,
sequence = (ts, event_id), signup → create, error → delete, other →
update. The mirror is then "latest surviving row per user" — exactly the
reference's keyed last-write-wins index (consumer.py:64-68), and exactly
expressible in ANSI SQL for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.cdc.apply import compact_changelog, op_stats
from postgres_opensearch_cdc_spark.cdc.envelope import events_as_changelog
from postgres_opensearch_cdc_spark.registry import load_table


def cdc_mirror_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full apply path: changelog → last-write-wins compaction →
    delete suppression (W1+W2+ST2). One key-partitioned shuffle."""
    log = events_as_changelog(load_table(spark, sf_dir, "events"))
    mirror = compact_changelog(
        log, key_cols=["key"], seq_cols=["ts", "event_id"], drop_op_col=False
    )
    return mirror.select(
        F.col("key").alias("user_id"),
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.round(F.col("value"), 2).alias("last_value"),
    )


def cdc_mirror_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count parity — the reference's own correctness oracle
    (test.sh:29-38): live-row count of the mirror after full apply."""
    log = events_as_changelog(load_table(spark, sf_dir, "events"))
    mirror = compact_changelog(log, key_cols=["key"], seq_cols=["ts", "event_id"])
    return mirror.agg(F.count(F.lit(1)).alias("cnt"))


def cdc_op_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T9 op-mix counters (consumer.py:48,108-117): events per op code."""
    log = events_as_changelog(load_table(spark, sf_dir, "events"))
    return op_stats(log)


def cdc_deleted_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The delete path in isolation (W2): keys whose final event is a
    delete — rows the mirror must NOT contain. Complements
    cdc_mirror_compact so both branches of T4's op discrimination are
    oracle-checked."""
    log = events_as_changelog(load_table(spark, sf_dir, "events"))
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    latest = log.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1)
    return latest.filter(F.col("op") == "d").select(F.col("key").alias("user_id"))


QUERIES = {
    "cdc_mirror_compact": cdc_mirror_compact,
    "cdc_mirror_count": cdc_mirror_count,
    "cdc_op_stats": cdc_op_stats,
    "cdc_deleted_keys": cdc_deleted_keys,
}

# The op-mapping CASE is inlined in each oracle: signup→c, error→d, else u.
_LOG = """
    SELECT CASE WHEN event_type = 'signup' THEN 'c'
                WHEN event_type = 'error' THEN 'd'
                ELSE 'u' END AS op,
           user_id AS key, event_id, ts, event_type, value, props
    FROM events
"""

ORACLE = {
    "cdc_mirror_compact": f"""
        WITH log AS ({_LOG}),
        latest AS (
            SELECT * FROM log
            QUALIFY row_number() OVER (
                PARTITION BY key ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT key AS user_id, event_id AS last_event_id,
               event_type AS last_event_type, ROUND(value, 2) AS last_value
        FROM latest WHERE op <> 'd'
    """,
    "cdc_mirror_count": f"""
        WITH log AS ({_LOG}),
        latest AS (
            SELECT * FROM log
            QUALIFY row_number() OVER (
                PARTITION BY key ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT count(*) AS cnt FROM latest WHERE op <> 'd'
    """,
    "cdc_op_stats": f"""
        WITH log AS ({_LOG})
        SELECT op, count(*) AS cnt FROM log
        GROUP BY op ORDER BY cnt DESC, op
    """,
    "cdc_deleted_keys": f"""
        WITH log AS ({_LOG}),
        latest AS (
            SELECT * FROM log
            QUALIFY row_number() OVER (
                PARTITION BY key ORDER BY ts DESC, event_id DESC) = 1
        )
        SELECT key AS user_id FROM latest WHERE op = 'd'
    """,
}
