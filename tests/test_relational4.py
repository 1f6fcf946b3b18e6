"""Relational batch 4 (TPC-H Q9/Q11/Q19/Q21 analogs): plan-shape and
semantic invariants the oracle parity gate can't express — broadcast
strategy on the dimension sides, single-pass disjunctive evaluation,
and the sole-late-supplier exclusivity contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.relational4 import (
    BRACKETS,
    IMPORTANCE_MULTIPLE,
    bracket_revenue,
    important_part_value,
    profit_by_nation_year,
    waiting_suppliers,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_profit_dims_broadcast_and_part_filter_pushes_down(spark, sf_dir):
    plan = explain_plan(profit_by_nation_year(spark, sf_dir))
    assert count_nodes(plan, "BroadcastHashJoin") == 3, "all three dims must broadcast"
    assert "EqualTo(p_type,STANDARD)" in plan, "part filter not pushed to scan"


def test_bracket_revenue_is_one_scan(spark, sf_dir):
    """The OR-of-conjunctions must stay one disjunctive filter over a
    single lineitem scan, not a union of three scans."""
    plan = explain_plan(bracket_revenue(spark, sf_dir))
    assert count_nodes(plan, "Scan parquet") == 2, "expected one lineitem + one part scan"
    assert "Union" not in plan


def test_important_parts_exceed_threshold(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("v")
    )
    stats = per_part.agg(F.sum("v"), F.count(F.lit(1))).collect()[0]
    rows = important_part_value(spark, sf_dir).collect()
    assert rows, "threshold selected nothing — fixture drifted?"
    floor = stats[0] / stats[1] * IMPORTANCE_MULTIPLE
    assert all(r["part_value"] > floor * 0.999 for r in rows)
    values = [r["part_value"] for r in rows]
    assert values == sorted(values, reverse=True)


def test_waiting_suppliers_are_sole_late_offenders(spark, sf_dir):
    """Every blamed supplier must come from an order with >1 supplier
    where it was the only late one — re-derive the per-order flags in
    plain Python from the raw tables and cross-check the counts."""
    from collections import defaultdict

    from postgres_opensearch_cdc_spark.queries.relational4 import LATE_DAYS

    orders = {
        r["o_orderkey"]: r["o_orderdate"]
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    per_order = defaultdict(lambda: (set(), set()))  # (suppliers, late)
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .collect()
    ):
        supps, late = per_order[r["l_orderkey"]]
        supps.add(r["l_suppkey"])
        odate = orders[r["l_orderkey"]]
        if (r["l_shipdate"] - odate).days > LATE_DAYS:
            late.add(r["l_suppkey"])
    blame = defaultdict(int)
    for supps, late in per_order.values():
        if len(supps) > 1 and len(late) == 1:
            blame[next(iter(late))] += 1
    expected = sorted(blame.values(), reverse=True)[:10]

    rows = waiting_suppliers(spark, sf_dir).collect()
    assert 0 < len(rows) <= 10
    counts = [r["numwait"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert counts == expected


def test_bracket_predicate_matches_manual_filter(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li["l_partkey"] == part["p_partkey"])
    manual = 0
    for brand, max_size, qlo, qhi in BRACKETS:
        manual += j.filter(
            (F.col("p_brand") == brand)
            & (F.col("p_size").between(1, max_size))
            & (F.col("l_quantity").between(qlo, qhi))
        ).count()
    got = bracket_revenue(spark, sf_dir).collect()[0]["matched_lines"]
    # brackets are disjoint on quantity/brand only where brands differ;
    # brands are distinct per bracket so the manual sum is exact
    assert got == manual
