"""Dynamic-schema parity: evolve-union, *_at coercion, decimal compat,
keyword+text dual representation."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import types as T

from postgres_opensearch_cdc_spark.cdc.schema_evolution import (
    apply_reference_type_compat,
    coerce_timestamp_suffixes,
    evolve_union,
    string_dual_representation,
)


def test_evolve_union_widens_and_nullfills(spark):
    mirror = spark.createDataFrame([(1, "A")], "id long, status string")
    batch = spark.createDataFrame(
        [(2, "B", "premium")], "id long, status string, tier string"
    )
    out = evolve_union(mirror, batch)
    assert set(out.columns) == {"id", "status", "tier"}
    rows = {r["id"]: r["tier"] for r in out.collect()}
    assert rows[1] is None and rows[2] == "premium"


def test_coerce_at_suffix_to_timestamp(spark):
    df = spark.createDataFrame(
        [("2024-01-01 10:00:00", "not-a-date", "plain")],
        "created_at string, updated_at string, name string",
    )
    out = coerce_timestamp_suffixes(df)
    assert isinstance(out.schema["created_at"].dataType, T.TimestampType)
    assert isinstance(out.schema["updated_at"].dataType, T.TimestampType)
    assert isinstance(out.schema["name"].dataType, T.StringType)
    row = out.head()
    assert row["created_at"] is not None
    assert row["updated_at"] is None  # unparseable → null, never fatal


def test_reference_decimal_compat(spark):
    df = spark.createDataFrame(
        [(Decimal("10.25"),)],
        T.StructType([T.StructField("amount", T.DecimalType(12, 2))]),
    )
    out = apply_reference_type_compat(df)
    assert isinstance(out.schema["amount"].dataType, T.DoubleType)
    assert out.head()["amount"] == 10.25


def test_string_dual_representation(spark):
    df = spark.createDataFrame([("Fast Wireless Mouse",)], "description string")
    out = string_dual_representation(df, ["description"])
    row = out.head()
    assert row["description"] == "Fast Wireless Mouse"  # keyword form intact
    assert row["description_tokens"] == ["fast", "wireless", "mouse"]
