"""Accuracy gate for the sketch aggregates: the check_bounds form of
approx_sketches computes exact twins alongside the sketches and asserts
every within-epsilon verdict — the harness the production (sketch-only)
entry relies on for its error-bound claims."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.queries.relational import approx_sketches


def test_sketches_within_bounds(spark, sf_dir):
    rows = approx_sketches(spark, sf_dir, check_bounds=True).collect()
    assert rows, "expected one row per event_type"
    for r in rows:
        assert r["users_ok"], (r["event_type"], r["exact_users"])
        assert r["p50_ok"], r["event_type"]
        assert r["p90_ok"], r["event_type"]


def test_production_form_has_no_exact_aggregates(spark, sf_dir):
    """The default entry must not pay for exact distinct/percentile —
    the whole point of sketches at 100 TB."""
    df = approx_sketches(spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "approx_count_distinct" in plan
    assert "count(distinct" not in plan.lower()
    # exact percentile shows up as percentile(...); the approx form as
    # percentile_approx(...)
    import re

    assert not re.search(r"(?<!_)percentile\(", plan), "exact percentile in plan"
