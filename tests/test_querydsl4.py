"""Query-DSL batch 8: invariants beyond the oracle gate — the
parent/child semi-join shapes, broadcast lookup, polygon containment
inside the bounding box, and the global-vs-query bucket arithmetic."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.queries.querydsl4 import (
    HC_MIN_CHILDREN,
    POLYGON,
    geo_polygon_query,
    global_agg_compare,
    has_child_query,
    has_parent_query,
    terms_lookup_filter,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_has_child_scores_meet_min_children(spark, sf_dir):
    rows = has_child_query(spark, sf_dir).collect()
    assert rows and all(r["score"] >= HC_MIN_CHILDREN for r in rows)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_has_parent_is_a_semi_join(spark, sf_dir):
    plan = explain_plan(has_parent_query(spark, sf_dir))
    assert "LeftSemi" in plan, "parent filter must compile to a semi-join"


def test_terms_lookup_broadcasts_the_watchlist(spark, sf_dir):
    plan = explain_plan(terms_lookup_filter(spark, sf_dir))
    assert count_nodes(plan, "BroadcastExchange") >= 1
    rows = terms_lookup_filter(spark, sf_dir).collect()
    total_events = load_table(spark, sf_dir, "events").count()
    assert 0 < sum(r["doc_count"] for r in rows) < total_events


def test_polygon_subset_of_bounding_box(spark, sf_dir):
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events")
    lats = [p[1] for p in POLYGON]
    lons = [p[0] for p in POLYGON]
    lat = (F.col("user_id") * 1201 % 18000) / F.lit(100.0) - F.lit(90.0)
    lon = (F.col("event_id") * 13 % 36000) / F.lit(100.0) - F.lit(180.0)
    in_box = (
        ev.select(lat.alias("lat"), lon.alias("lon"))
        .filter(
            (F.col("lat") >= min(lats))
            & (F.col("lat") <= max(lats))
            & (F.col("lon") >= min(lons))
            & (F.col("lon") <= max(lons))
        )
        .count()
    )
    in_poly = sum(
        r["doc_count"] for r in geo_polygon_query(spark, sf_dir).collect()
    )
    assert 0 < in_poly < in_box


def test_global_bucket_contains_the_query_bucket(spark, sf_dir):
    r = global_agg_compare(spark, sf_dir).collect()[0]
    assert 0 < r["query_count"] < r["global_count"]
    assert r["query_avg_value"] is not None and r["global_avg_value"] is not None


def test_transform_entity_centric_accounts_for_all_events(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.querydsl4 import (
        transform_entity_centric,
    )

    rows = transform_entity_centric(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r["n_events"] for r in rows) == total
    for r in rows:
        assert r["n_click"] + r["n_view"] + r["n_purchase"] <= r["n_events"]
        assert 1 <= r["active_days"]
