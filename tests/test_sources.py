"""Source helpers (SURVEY §2.1)."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.sources.changelog import select_tables


def test_select_tables_include_exclude():
    """S6: DMS selection rules (TDD :247-270): include public.%, exclude
    audit tables."""
    catalog = ["public.card", "public.audit_log", "public.orders", "internal.tmp"]
    out = select_tables(catalog, include=["public.%"], exclude=["%.audit_%"])
    assert out == ["public.card", "public.orders"]


def test_select_tables_no_rules_passthrough():
    catalog = ["a", "b"]
    assert select_tables(catalog) == ["a", "b"]
