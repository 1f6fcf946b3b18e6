"""Tripwire for testdata regeneration drift: several queries filter on
date LITERALS (so the predicates push down to the parquet scan), which
silently return empty/NULL results if the driver regenerates the
fixtures with a different date domain — exactly how forecast_revenue
shipped vacuous for five rounds (it filtered lineitem to 2024 while the
TPC-H tables carry 1995-2001 dates). These tests pin the domains the
literals assume; if a regeneration moves them, this file goes red
loudly instead of the entries going green-but-empty."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.registry import load_table


def test_lineitem_shipdate_covers_literal_years(spark, sf_dir):
    # forecast_revenue filters 1995; top_supplier_revenue 1996-Q2;
    # join_pricing_summary <= 1998-09-02; join_shipping_priority 1995-03-15
    lo, hi = load_table(spark, sf_dir, "lineitem").agg(
        F.min("l_shipdate"), F.max("l_shipdate")
    ).first()
    assert lo.date() <= dt.date(1995, 6, 1), f"lineitem min shipdate {lo}"
    assert hi.date() >= dt.date(1996, 7, 1), f"lineitem max shipdate {hi}"


def test_orders_orderdate_covers_literal_years(spark, sf_dir):
    # join_shipping_priority filters o_orderdate < 1995-03-15
    lo, hi = load_table(spark, sf_dir, "orders").agg(
        F.min("o_orderdate"), F.max("o_orderdate")
    ).first()
    assert lo.date() <= dt.date(1995, 3, 15) <= hi.date()


def test_events_ts_covers_literal_anchors(spark, sf_dir):
    # q11_time_range / cdc cutoff (2024-01-15), date_range_agg anchor,
    # distance_feature_query anchor (2024-02-01)
    lo, hi = load_table(spark, sf_dir, "events").agg(
        F.min("ts"), F.max("ts")
    ).first()
    assert lo.date() <= dt.date(2024, 1, 15), f"events min ts {lo}"
    assert hi.date() >= dt.date(2024, 1, 20), f"events max ts {hi}"


def test_literal_filter_queries_are_not_vacuous(spark, sf_dir):
    # the end-to-end guard: every literal-filtered aggregate returns
    # real (non-NULL, non-empty) results on the current fixtures
    from postgres_opensearch_cdc_spark.queries.dashboard import q11_time_range
    from postgres_opensearch_cdc_spark.queries.relational3 import (
        forecast_revenue,
        top_supplier_revenue,
    )

    rev = forecast_revenue(spark, sf_dir).first()
    assert rev["revenue"] is not None and rev["revenue"] > 0
    assert top_supplier_revenue(spark, sf_dir).count() >= 1
    assert q11_time_range(spark, sf_dir).count() > 0
