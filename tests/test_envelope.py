"""Envelope parsing, quarantine, op normalization, key/index derivation
(SURVEY §2.2 T1-T8)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F, types as T

from postgres_opensearch_cdc_spark.cdc.envelope import (
    events_as_changelog,
    index_name,
    normalize_dms_op,
    parse_envelopes,
    primary_key,
)

ROW_SCHEMA = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("status", T.StringType())]
)


def raw_frame(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


def test_parse_good_envelopes(spark):
    events = [
        json.dumps(
            {
                "op": "c",
                "after": {"id": 1, "status": "ACTIVE"},
                "before": None,
                "ts_ms": 1000,
                "source": {"schema": "public", "table": "card", "lsn": 7},
                "offset": 1,
            }
        ),
        json.dumps(
            {
                "op": "d",
                "before": {"id": 1, "status": "ACTIVE"},
                "after": None,
                "ts_ms": 2000,
                "source": {"schema": "public", "table": "card", "lsn": 8},
                "offset": 2,
            }
        ),
    ]
    good, bad = parse_envelopes(raw_frame(spark, events), ROW_SCHEMA)
    rows = good.orderBy("offset").collect()
    assert bad.count() == 0
    assert [r["op"] for r in rows] == ["c", "d"]
    assert rows[0]["after"]["status"] == "ACTIVE"
    assert rows[1]["before"]["id"] == 1
    assert rows[1]["after"] is None


def test_corrupt_records_quarantined_not_fatal(spark):
    """T8/ST7: poison messages go to the quarantine branch; the good path
    continues (reference consumer.py:102-103 try/except + DLQ)."""
    events = [
        '{"op": "c", "after": {"id": 1, "status": "A"}, "offset": 1}',
        "{this is not json",
        '{"after": {"id": 2}}',  # parses but missing op → half-formed
    ]
    good, bad = parse_envelopes(raw_frame(spark, events), ROW_SCHEMA)
    assert good.count() == 1
    assert bad.count() == 2
    assert "{this is not json" in {r["raw"] for r in bad.collect()}


def test_dms_op_normalization(spark):
    """T4: DMS operation names map onto Debezium codes (TDD :1601-1622)."""
    df = spark.createDataFrame(
        [("insert",), ("UPDATE",), ("delete",), ("load",), ("weird",)], "op string"
    )
    out = [r[0] for r in df.select(normalize_dms_op(F.col("op"))).collect()]
    assert out == ["c", "u", "d", "r", "weird"]


def test_index_name_derivation(spark):
    """T6 (TDD :417-421): lower(schema_table), dots replaced."""
    df = spark.createDataFrame([("Public", "Card.V2")], "s string, t string")
    out = df.select(index_name(F.col("s"), F.col("t")).alias("ix")).head()["ix"]
    assert out == "public_card_v2"


def test_primary_key_prefers_id_else_hash(spark):
    """T7 (consumer.py:62; TDD :447-456): id when present, else a
    deterministic hash of the full row."""
    with_id = spark.createDataFrame([(7, "x")], "id long, v string")
    assert with_id.select(primary_key(with_id.columns).alias("k")).head()["k"] == "7"
    no_id = spark.createDataFrame([("x", "y")], "a string, b string")
    k1 = no_id.select(primary_key(no_id.columns).alias("k")).head()["k"]
    k2 = no_id.select(primary_key(no_id.columns).alias("k")).head()["k"]
    assert k1 == k2 and k1 is not None


def test_events_changelog_mapping(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table

    log = events_as_changelog(load_table(spark, sf_dir, "events"))
    ops = {r["op"] for r in log.select("op").distinct().collect()}
    assert ops == {"c", "u", "d"}
