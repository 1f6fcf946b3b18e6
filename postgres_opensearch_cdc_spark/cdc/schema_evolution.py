"""Dynamic-schema behaviors of the reference's sink side, Spark-first
(SURVEY §1.2, §7.4.2-3).

The reference's OpenSearch indices use dynamic mappings (TDD :516-570):
new fields appear on write, ``*_at`` fields coerce to dates
(TDD :553-560), NUMERIC loses precision to double (TDD :714, documented
loss). Spark wants schemas up front; the equivalents are:

- evolve: unionByName(allowMissingColumns=True) when a batch carries new
  columns — old rows null-fill, the mirror schema widens (mergeSchema
  semantics without a table format).
- coercion rule: any string column matching ``*_at`` parses to
  timestamp — the dynamic-template date rule.
- reference type compat: an explicit flag that downgrades DecimalType to
  double to bit-match the reference's documented behavior; default OFF
  because Spark can do strictly better (SURVEY §1.3).
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, functions as F, types as T


def evolve_union(mirror: DataFrame, batch: DataFrame) -> DataFrame:
    """Widen the mirror with a batch that may add/miss columns: both
    sides null-fill what the other lacks. The Spark form of
    ``"dynamic": "true"`` mappings (TDD :538-551)."""
    return mirror.unionByName(batch, allowMissingColumns=True)


def coerce_timestamp_suffixes(
    df: DataFrame, patterns: tuple[str, ...] = ("*_at",)
) -> DataFrame:
    """The reference's dynamic template: fields matching ``*_at`` map to
    date type (TDD :553-560). String columns matching the patterns parse
    to timestamps; parse failures become null (PERMISSIVE-style, never
    fatal — try_to_timestamp, since plain to_timestamp throws under
    ANSI mode)."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, T.StringType) and any(
            fnmatch.fnmatch(field.name, p) for p in patterns
        ):
            out = out.withColumn(field.name, F.try_to_timestamp(F.col(field.name)))
    return out


def apply_reference_type_compat(df: DataFrame) -> DataFrame:
    """Compat flag (SURVEY §7.4.2): coerce every DecimalType column to
    double, reproducing the reference's NUMERIC → double mapping and its
    documented precision loss (TDD :714 "Precision may be lost"). Use
    only when bit-matching the reference; the engine default keeps
    DecimalType."""
    out = df
    for field in df.schema.fields:
        if isinstance(field.dataType, T.DecimalType):
            out = out.withColumn(field.name, F.col(field.name).cast("double"))
    return out


def string_dual_representation(df: DataFrame, cols: list[str]) -> DataFrame:
    """The keyword+text dual mapping (TDD :538-551): keep the raw string
    (keyword ≙ exact match/agg) and add a tokenized lowercase form
    (text ≙ analyzed full-text), named ``<col>_tokens``."""
    out = df
    for c in cols:
        out = out.withColumn(
            f"{c}_tokens", F.split(F.lower(F.col(c)), r"\s+")
        )
    return out
