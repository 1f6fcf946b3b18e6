"""Semantic invariants of the query surface (full value parity vs the
DuckDB oracle is covered by tools/check_parity.py and the driver gate;
these assert shape/ordering properties cheaply)."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.queries import cdc_queries, dashboard, extensions, relational


def test_q05_descending_topn(spark, sf_dir):
    rows = dashboard.q05_terms_agg(spark, sf_dir).collect()
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len(rows) <= 10


def test_q08_topn_size_and_order(spark, sf_dir):
    rows = dashboard.q08_top_n(spark, sf_dir).collect()
    assert len(rows) == 20
    prices = [r["o_totalprice"] for r in rows]
    assert prices == sorted(prices, reverse=True)


def test_q12_union_null_fills_missing_columns(spark, sf_dir):
    df = dashboard.q12_index_pattern_union(spark, sf_dir)
    supp = df.filter(df.src == "supplier")
    assert supp.count() > 0
    assert supp.filter(supp.mktsegment.isNull()).count() == supp.count()


def test_cdc_mirror_excludes_deleted_keys(spark, sf_dir):
    mirror = {r["user_id"] for r in cdc_queries.cdc_mirror_compact(spark, sf_dir).collect()}
    deleted = {r["user_id"] for r in cdc_queries.cdc_deleted_keys(spark, sf_dir).collect()}
    assert mirror.isdisjoint(deleted)
    assert len(mirror) > 0 and len(deleted) > 0


def test_rollup_has_grand_total(spark, sf_dir):
    rows = relational.rollup_status_priority(spark, sf_dir).collect()
    grand = [r for r in rows if r["o_orderstatus"] is None and r["o_orderpriority"] is None]
    assert len(grand) == 1
    # grand total equals sum of per-status subtotals
    status_totals = [
        r["cnt"] for r in rows if r["o_orderstatus"] is not None and r["o_orderpriority"] is None
    ]
    assert sum(status_totals) == grand[0]["cnt"]


def test_window_running_sum_monotone_nonneg_values(spark, sf_dir):
    rows = relational.window_running_sum(spark, sf_dir).collect()
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["running_value"])
    for vals in by_user.values():
        assert vals == sorted(vals)  # positive purchase values → monotone


def test_dedup_exact_partitions_docs(spark, sf_dir):
    df = extensions.dedup_exact(spark, sf_dir)
    from postgres_opensearch_cdc_spark.registry import load_table

    total_docs = load_table(spark, sf_dir, "documents").count()
    agg = df.groupBy().sum("dupe_count").head()[0]
    assert agg == total_docs


def test_fuzzy_join_includes_exact_and_near_matches(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.windows_pivot import fuzzy_name_join

    rows = fuzzy_name_join(spark, sf_dir).collect()
    dists = {r["edit_dist"] for r in rows}
    assert dists <= {0, 1} and 0 in dists and 1 in dists


def test_percent_rank_bounds_and_ties(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.windows_pivot import (
        window_percent_rank,
    )

    rows = window_percent_rank(spark, sf_dir).collect()
    assert rows and all(0.0 <= r["price_pct_rank"] <= 1.0 for r in rows)
