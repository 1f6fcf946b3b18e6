"""Aggregation-DSL batch-3 invariants + plan shapes."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.querydsl_aggs import (
    adjacency_matrix_agg,
    geo_distance_filter,
    multi_terms_agg,
    range_agg_value,
    sampler_terms_agg,
)
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_range_buckets_partition_the_table(spark, sf_dir):
    out = range_agg_value(spark, sf_dir).collect()
    from postgres_opensearch_cdc_spark.registry import load_table

    assert sum(r["doc_count"] for r in out) == load_table(
        spark, sf_dir, "events"
    ).count()


def test_adjacency_intersections_bounded(spark, sf_dir):
    got = {r["bucket"]: r["doc_count"] for r in adjacency_matrix_agg(spark, sf_dir).collect()}
    for pair, members in (("A&B", "AB"), ("A&C", "AC"), ("B&C", "BC")):
        if pair in got:
            assert got[pair] <= min(got[members[0]], got[members[1]])


def test_sampler_is_strict_subset(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table

    sampled = sampler_terms_agg(spark, sf_dir).agg(F.sum("doc_count")).first()[0]
    total = load_table(spark, sf_dir, "events").count()
    assert 0 < sampled < total
    # deterministic: re-running yields the identical sample
    again = sampler_terms_agg(spark, sf_dir).agg(F.sum("doc_count")).first()[0]
    assert sampled == again


def test_multi_terms_ordering(spark, sf_dir):
    rows = multi_terms_agg(spark, sf_dir).collect()
    counts = [r["doc_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert len(rows) <= 10


def test_geo_rings_within_filter(spark):
    # sf0.01: the sf0.001 slice has too few ids to land points in-range
    rows = geo_distance_filter(spark, "/root/testdata/sf0.01").collect()
    assert rows, "synthetic coordinates must populate at least one ring"
    assert all(0 <= r["ring_km"] < 5000 for r in rows)


def test_aggs_are_single_pass_partial_final(spark, sf_dir):
    # one scan, partial+final hash aggregate, no join/window in the plan
    # formatted plans print each node twice (tree + detail): 2 == one scan
    plan = explain_plan(range_agg_value(spark, sf_dir))
    assert plan.count("Scan parquet") == 2
    assert "HashAggregate" in plan
    assert "Join" not in plan and "Window" not in plan
    plan2 = explain_plan(adjacency_matrix_agg(spark, sf_dir))
    assert plan2.count("Scan parquet") == 2
