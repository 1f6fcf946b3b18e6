"""Aggregation-DSL batch-4 (pipeline aggs + extended metrics)
invariants and plan shapes. Value correctness is oracle-checked by
tools/check_parity.py; these tests pin the semantic invariants and the
scale-relevant physical plans."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.queries.querydsl_aggs2 import (
    bucket_selector_agg,
    bucket_sort_agg,
    derivative_agg,
    diversified_sampler_agg,
    extended_stats_agg,
    frequent_item_sets_agg,
    geo_grid_agg,
    max_bucket_day,
    normalize_pct_agg,
    pinned_query,
    stats_bucket_agg,
)
from postgres_opensearch_cdc_spark.queries.relational3 import (
    customer_order_counts,
    top_supplier_revenue,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_derivative_telescopes_to_range(spark, sf_dir):
    rows = derivative_agg(spark, sf_dir).collect()
    assert rows[0]["deriv"] is None  # ES: first bucket has no derivative
    # derivatives telescope: first count + sum of derivs = last count
    assert rows[0]["n"] + sum(r["deriv"] for r in rows[1:]) == rows[-1]["n"]


def test_stats_bucket_consistent_with_series(spark, sf_dir):
    r = stats_bucket_agg(spark, sf_dir).first()
    assert r["min_n"] <= r["avg_n"] <= r["max_n"]
    assert r["sum_n"] == load_table(spark, sf_dir, "events").filter(
        "event_type = 'purchase'"
    ).count()


def test_max_bucket_is_series_max(spark, sf_dir):
    top = max_bucket_day(spark, sf_dir).first()
    stats = stats_bucket_agg(spark, sf_dir).first()
    assert top["value"] == stats["max_n"]


def test_bucket_sort_is_page_two(spark, sf_dir):
    page = bucket_sort_agg(spark, sf_dir).collect()
    assert len(page) == 10
    counts = [r["doc_count"] for r in page]
    assert counts == sorted(counts, reverse=True)


def test_bucket_selector_keeps_only_matching(spark, sf_dir):
    for r in bucket_selector_agg(spark, sf_dir).collect():
        assert r["errors"] * 5 > r["total"]


def test_normalize_sums_to_100(spark, sf_dir):
    rows = normalize_pct_agg(spark, sf_dir).collect()
    assert abs(sum(r["pct"] for r in rows) - 100.0) < 0.01


def test_diversified_sampler_caps_per_source(spark, sf_dir):
    n_sources = (
        load_table(spark, sf_dir, "documents").select("source").distinct().count()
    )
    sampled = sum(
        r["doc_count"] for r in diversified_sampler_agg(spark, sf_dir).collect()
    )
    assert 0 < sampled <= 3 * n_sources


def test_pinned_ids_lead_results(spark, sf_dir):
    rows = pinned_query(spark, sf_dir).collect()
    assert len(rows) == 15
    pinned = [r["event_id"] for r in rows if r["pinned"]]
    assert pinned  # the small pinned ids exist at every sf
    # every pinned row outranks every organic row in the result set
    first_organic = next(i for i, r in enumerate(rows) if not r["pinned"])
    assert all(r["pinned"] for r in rows[:first_organic])


def test_q13_covers_all_customers(spark, sf_dir):
    rows = customer_order_counts(spark, sf_dir).collect()
    assert sum(r["custdist"] for r in rows) == load_table(
        spark, sf_dir, "customer"
    ).count()


def test_single_shuffle_metric_aggs(spark, sf_dir):
    # extended_stats / geo_grid: one partial+final agg pair, at most the
    # agg exchange plus the top-k sort exchange — no join shuffles
    assert explain_plan(extended_stats_agg(spark, sf_dir)).count("Exchange (") <= 2
    assert explain_plan(geo_grid_agg(spark, sf_dir)).count("Exchange (") <= 2


def test_pinned_query_uses_topk(spark, sf_dir):
    # orderBy+limit must compile to per-partition heaps, not global sort
    assert "TakeOrderedAndProject" in explain_plan(pinned_query(spark, sf_dir))


def test_frequent_item_sets_support_bounded(spark, sf_dir):
    rows = frequent_item_sets_agg(spark, sf_dir).collect()
    assert rows
    n_users = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    for r in rows:
        assert r["item_a"] < r["item_b"]  # canonical pair ordering
        assert 0 < r["support"] <= n_users
    # the pair self-join must run on the per-user distinct item list,
    # never the raw event scan: the join's build (first) child in the
    # formatted tree must be the distinct HashAggregate, not a scan
    lines = explain_plan(frequent_item_sets_agg(spark, sf_dir)).splitlines()
    join_idx = next(i for i, l in enumerate(lines) if "Join" in l)
    assert "HashAggregate" in lines[join_idx + 1]


def test_geo_line_tracks_are_positive_and_ranked(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.querydsl_aggs2 import geo_line_agg

    rows = geo_line_agg(spark, sf_dir).collect()
    assert rows
    kms = [r["track_km"] for r in rows]
    assert all(k is not None and k > 0 for k in kms)
    assert kms == sorted(kms, reverse=True)
    assert all(r["n_points"] >= 2 for r in rows)  # a track needs segments


def test_top_supplier_is_argmax(spark, sf_dir):
    rows = top_supplier_revenue(spark, sf_dir).collect()
    assert rows  # 1995-era quarter exists in the fixture's shipdates
    assert len({r["total_revenue"] for r in rows}) == 1  # all tied at max


def test_ks_test_is_bounded_and_positive(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.querydsl_aggs2 import ks_test_agg

    r = ks_test_agg(spark, sf_dir).collect()[0]
    assert r["n_a"] > 0 and r["n_b"] > 0
    assert 0 <= r["d_stat"] <= 1


def test_min_sum_bucket_consistent_with_max_bucket(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.querydsl_aggs2 import (
        max_bucket_day,
        min_sum_bucket_agg,
    )

    lo = min_sum_bucket_agg(spark, sf_dir).collect()[0]
    hi = max_bucket_day(spark, sf_dir).collect()[0]
    assert lo["min_value"] <= hi["value"]
    assert lo["sum_value"] >= hi["value"]
