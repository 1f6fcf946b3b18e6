"""Round-5 entries: plan-shape and semantic invariants that the oracle
parity gate can't express (pushdown reaching the scan, aggregation
strategy choices, metric bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.extensions import multimodal_manifest
from postgres_opensearch_cdc_spark.queries.querydsl import (
    boosting_query,
    terms_set_match,
    wildcard_query,
)
from postgres_opensearch_cdc_spark.queries.querydsl_aggs import (
    geo_bounding_box,
    serial_diff_daily,
    string_stats_agg,
    top_metrics_agg,
)
from postgres_opensearch_cdc_spark.queries.training_pipeline import quality_unigram_lm
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_wildcard_prefix_reaches_the_scan(spark, sf_dir):
    plan = explain_plan(wildcard_query(spark, sf_dir))
    assert "StringStartsWith(source,src1)" in plan, "prefix not pushed to parquet"


def test_top_metrics_uses_partial_agg_not_window(spark, sf_dir):
    plan = explain_plan(top_metrics_agg(spark, sf_dir))
    assert "max_by" in plan
    assert "Window" not in plan, "top_metrics must not sort whole partitions"


def test_terms_set_minimum_should_match(spark, sf_dir):
    rows = terms_set_match(spark, sf_dir).collect()
    assert rows and all(r["n_matched"] >= 3 for r in rows)


def test_boosting_demotes_but_never_excludes(spark, sf_dir):
    """A doc matching the negative term keeps a positive (halved) score."""
    scored = {r["doc_id"]: r["score"] for r in boosting_query(spark, sf_dir).collect()}
    assert scored and all(s > 0 for s in scored.values())


def test_geo_box_is_a_subset_of_the_corpus(spark, sf_dir):
    total = load_table(spark, sf_dir, "events").count()
    boxed = sum(r["doc_count"] for r in geo_bounding_box(spark, sf_dir).collect())
    assert 0 < boxed < total


def test_serial_diff_telescopes(spark, sf_dir):
    rows = serial_diff_daily(spark, sf_dir).collect()
    assert rows[0]["diff"] is None
    total_diff = sum(r["diff"] for r in rows[1:])
    assert total_diff == rows[-1]["doc_count"] - rows[0]["doc_count"]


def test_string_stats_entropy_bounds(spark, sf_dir):
    import math

    for r in string_stats_agg(spark, sf_dir).collect():
        assert r["min_length"] <= r["avg_length"] <= r["max_length"]
        # char alphabet is lowercase ascii + space: entropy < ln(27+)
        assert 0 < r["entropy"] < math.log(64)


def test_unigram_lm_mean_between_extremes(spark, sf_dir):
    for r in quality_unigram_lm(spark, sf_dir).collect():
        assert r["min_nlp"] <= r["mean_nlp"] <= r["max_nlp"]
        assert r["min_nlp"] > 0  # every token has p < 1


def test_multimodal_manifest_covers_all_docs(spark, sf_dir):
    rows = multimodal_manifest(spark, sf_dir).collect()
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r["n_media"] for r in rows) == n_docs
    video = next(r for r in rows if r["kind"] == "video")
    assert video["n_frames"] >= video["n_media"]  # >=1 frame per video
    for r in rows:
        assert 0.0 <= r["min_f0"] <= r["max_f0"] <= 1.0
