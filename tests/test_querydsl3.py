"""Query-DSL batch 7: plan-shape and semantic invariants beyond the
oracle parity gate — id pushdown reaching the scan, top-k compiling to
TakeOrderedAndProject instead of a global sort, equi-depth bucket
balance, and the exists/missing partition property."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.queries.querydsl3 import (
    VWH_BUCKETS,
    exists_missing_agg,
    ids_query,
    rank_feature_query,
    significant_text,
    variable_width_histogram,
)
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_ids_filter_reaches_the_scan(spark, sf_dir):
    plan = explain_plan(ids_query(spark, sf_dir))
    assert "In(doc_id" in plan, "id list not pushed to parquet"


def test_rank_feature_is_top_k_not_global_sort(spark, sf_dir):
    plan = explain_plan(rank_feature_query(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert count_nodes(plan, "Sort") == 0, "top-k must not global-sort"


def test_exists_plus_missing_partitions_the_segment(spark, sf_dir):
    for r in exists_missing_agg(spark, sf_dir).collect():
        assert r["field_exists"] + r["field_missing"] == r["n_customers"]
        assert r["field_missing"] > 0, "cutoff selects everyone — fixture drift?"


def test_variable_width_buckets_are_balanced_and_ordered(spark, sf_dir):
    rows = variable_width_histogram(spark, sf_dir).collect()
    assert len(rows) == VWH_BUCKETS
    counts = [r["doc_count"] for r in rows]
    assert max(counts) - min(counts) <= 1, "equi-depth buckets must balance"
    for a, b in zip(rows, rows[1:]):
        assert a["hi"] <= b["lo"] or abs(a["hi"] - b["lo"]) < 1e-9


def test_significant_text_is_single_explode_single_agg(spark, sf_dir):
    plan = explain_plan(significant_text(spark, sf_dir))
    assert count_nodes(plan, "Generate") == 1, "token explode must happen once"
    rows = significant_text(spark, sf_dir).collect()
    assert rows and all(r["score"] > 0 for r in rows)
