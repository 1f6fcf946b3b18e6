"""Event-sequence analytics: invariants beyond the oracle gate —
the no-self-join plan shape of the EQL sequence, until-counts
consistency, funnel monotonicity, and change-point sanity."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.queries.sequences import (
    change_point_cusum,
    eql_sequence,
    eql_sequence_until,
    funnel_steps,
)
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_eql_sequence_has_no_self_join(spark, sf_dir):
    """The future-B lookup must be a window running-min, not a pairwise
    self-join: one events scan, zero joins."""
    plan = explain_plan(eql_sequence(spark, sf_dir))
    assert count_nodes(plan, "Scan parquet") == 1
    assert "Join" not in plan
    assert count_nodes(plan, "Window") == 1


def test_until_partitions_the_sequence_matches(spark, sf_dir):
    """completed + blocked per user == the unconditional sequence count
    (until only reclassifies, never adds or drops matches)."""
    base = {
        r["user_id"]: r["n_sequences"]
        for r in eql_sequence(spark, sf_dir).collect()
    }
    until = eql_sequence_until(spark, sf_dir).collect()
    assert {r["user_id"] for r in until} == set(base)
    for r in until:
        assert r["n_completed"] + r["n_blocked"] == base[r["user_id"]]


def test_funnel_is_monotone(spark, sf_dir):
    r = funnel_steps(spark, sf_dir).collect()[0]
    assert r["step1_users"] >= r["step2_users"] >= r["step3_users"] > 0
    assert 0 < r["conv_1_2"] <= 1 and 0 < r["conv_1_3"] <= 1


def test_change_point_separates_the_means(spark, sf_dir):
    r = change_point_cusum(spark, sf_dir).collect()[0]
    assert r["change_day"] is not None
    assert r["mean_before"] is not None and r["mean_after"] is not None
    # peak magnitude must equal n_before * (mean_before - global mean)
    # in sign-free form: just require it's nonzero for a real corpus
    assert abs(r["cusum_peak"]) > 0
