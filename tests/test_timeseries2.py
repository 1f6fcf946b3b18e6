"""Time-series batch 2: invariants beyond the oracle gate — bounded
correlations, seasonal index normalization, and the rolling frame's
warm-up trim."""

from __future__ import annotations

from postgres_opensearch_cdc_spark.queries.timeseries2 import (
    ROLL_CORR_DAYS,
    bucket_correlation_agg,
    ts_autocorr,
    ts_rolling_corr,
    ts_seasonal_profile,
)


def test_correlation_is_bounded(spark, sf_dir):
    r = bucket_correlation_agg(spark, sf_dir).collect()[0]
    assert r["n_days"] > 5
    assert -1.0 <= r["correlation"] <= 1.0
    assert r["slope"] is not None


def test_seasonal_index_averages_to_one(spark, sf_dir):
    rows = ts_seasonal_profile(spark, sf_dir).collect()
    assert [r["hod"] for r in rows] == list(range(24))
    # hod means are an unweighted partition of the global hourly mean
    # only when every hod has the same number of (day, hod) cells —
    # with a full month of data this holds to within rounding
    mean_idx = sum(r["seasonal_idx"] for r in rows) / 24
    assert abs(mean_idx - 1.0) < 0.05


def test_autocorr_bounded(spark, sf_dir):
    r = ts_autocorr(spark, sf_dir).collect()[0]
    for k in (1, 7):
        v = r[f"acf{k}"]
        assert v is None or -1.0 <= v <= 1.0


def test_rolling_corr_trims_warmup(spark, sf_dir):
    rows = ts_rolling_corr(spark, sf_dir).collect()
    assert rows, "no fully-populated frames — fixture too short?"
    assert all(-1.0 <= r["rolling_corr"] <= 1.0 for r in rows)
    # number of emitted frames = n_days - (window - 1)
    n_days = bucket_correlation_agg(spark, sf_dir).collect()[0]["n_days"]
    assert len(rows) == n_days - (ROLL_CORR_DAYS - 1)


def test_seasonal_anomaly_flags_are_extreme(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.timeseries2 import (
        ANOM_SIGMA,
        ts_seasonal_anomaly,
    )

    rows = ts_seasonal_anomaly(spark, sf_dir).collect()
    assert rows, "no anomalies at 2.5 sigma — fixture drift?"
    assert all(abs(r["resid_z"]) > ANOM_SIGMA for r in rows)


def test_transition_matrix_rows_are_distributions(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.timeseries2 import (
        event_transition_matrix,
    )

    rows = event_transition_matrix(spark, sf_dir).collect()
    by_from = {}
    for r in rows:
        by_from.setdefault(r["from_type"], []).append(r["p_transition"])
    assert len(by_from) == 5
    for f, ps in by_from.items():
        assert abs(sum(ps) - 1.0) < 0.01, f"row {f} does not sum to 1"
