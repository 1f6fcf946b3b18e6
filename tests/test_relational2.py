"""Relational batch-2 (TPC-H analog) plan shapes and invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.relational2 import (
    large_quantity_customers,
    min_cost_supplier,
    nation_market_share,
    volume_shipping,
)
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_q18_preaggregates_before_join(spark, sf_dir):
    plan = explain_plan(large_quantity_customers(spark, sf_dir))
    # the having-filter aggregate must sit BELOW the joins (lineitem is
    # reduced to one row per order first) and top-100 is TakeOrdered
    assert "TakeOrderedAndProject" in plan
    rows = large_quantity_customers(spark, sf_dir).collect()
    assert all(r["sum_qty"] > 250 for r in rows)
    assert len(rows) <= 100


def test_nation_is_broadcast(spark, sf_dir):
    plan = explain_plan(volume_shipping(spark, sf_dir))
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_market_share_single_fact_scan(spark, sf_dir):
    # numerator and denominator come from ONE conditional aggregation —
    # exactly one lineitem scan in the plan
    plan = explain_plan(nation_market_share(spark, sf_dir))
    # one file-index mention per scanned table: lineitem read exactly once
    assert plan.count("lineitem.parquet") == 1
    rows = nation_market_share(spark, sf_dir).collect()
    assert all(r["mkt_share"] is None or 0.0 <= r["mkt_share"] <= 1.0 for r in rows)


def test_min_cost_supplier_prunes_fact_early(spark, sf_dir):
    plan = explain_plan(min_cost_supplier(spark, sf_dir))
    # the semi join against the filtered part dim must be broadcast
    assert "LeftSemi" in plan
    out = min_cost_supplier(spark, sf_dir)
    # one row per qualifying part
    assert out.groupBy("p_partkey").count().filter(F.col("count") > 1).count() == 0
