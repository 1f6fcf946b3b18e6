"""Time-series module invariants (parity is covered by the oracle gate;
these assert the semantic properties parity alone can't express)."""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from postgres_opensearch_cdc_spark.queries.timeseries import (
    EWMA_DECAY,
    ts_calendar_heatmap,
    ts_ewma,
    ts_gapfill_locf,
    ts_hierarchical_rollup,
    ts_interpolate_linear,
    ts_moving_avg,
    ts_ohlc_daily,
    ts_retention_cohort,
)


def test_gapfill_grid_is_dense_and_locf_holds(spark, sf_dir):
    out = ts_gapfill_locf(spark, sf_dir).cache()
    per_type = out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("bucket").alias("mn"),
        F.max("bucket").alias("mx"),
    )
    for r in per_type.collect():
        hours = int((r["mx"] - r["mn"]).total_seconds() // 3600) + 1
        assert r["n"] == hours, "grid must be dense per type"
    # once a type has an observation, locf_sum is never null afterwards;
    # filled rows carry the previous observation forward
    w = out.filter(F.col("gap_filled") & F.col("locf_sum").isNotNull())
    assert w.count() > 0, "sparse subset must actually produce gaps"
    assert out.filter(~F.col("gap_filled") & (F.col("locf_sum") != F.col("obs_sum"))).count() == 0
    out.unpersist()


def test_ohlc_bounds(spark, sf_dir):
    out = ts_ohlc_daily(spark, sf_dir)
    bad = out.filter(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
    )
    assert bad.count() == 0


def test_moving_avg_first_row_equals_day_sum(spark, sf_dir):
    out = ts_moving_avg(spark, sf_dir)
    firsts = out.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("event_type").orderBy("day")),
    ).filter(F.col("rn") == 1)
    assert firsts.filter(F.col("avg_7d") != F.col("day_sum")).count() == 0
    assert firsts.filter(F.col("cum_sum") != F.col("day_sum")).count() == 0


def test_hierarchical_rollup_levels_agree(spark, sf_dir):
    out = ts_hierarchical_rollup(spark, sf_dir).cache()
    total = {
        r["granularity"]: (r["n"], float(r["t"]))
        for r in out.groupBy("granularity")
        .agg(F.sum("n").alias("n"), F.round(F.sum("total"), 1).alias("t"))
        .collect()
    }
    assert total["hour"][0] == total["day"][0] == total["week"][0]
    assert abs(total["hour"][1] - total["week"][1]) < 0.5
    out.unpersist()


def test_interpolation_bounded_by_bracket(spark, sf_dir):
    out = ts_interpolate_linear(spark, sf_dir).cache()
    # interpolated points exist and sit strictly between their brackets'
    # extremes: every filled gap value is within [min, max] of the
    # type's observed values
    gaps = out.filter(F.col("obs").isNull() & F.col("filled").isNotNull())
    assert gaps.count() > 0, "sparse subset must leave gaps to fill"
    stats = (
        out.filter(F.col("obs").isNotNull())
        .groupBy("event_type")
        .agg(F.min("obs").alias("lo"), F.max("obs").alias("hi"))
    )
    bad = gaps.join(stats, "event_type").filter(
        (F.col("filled") < F.col("lo")) | (F.col("filled") > F.col("hi"))
    )
    assert bad.count() == 0
    # observed points pass through unchanged
    assert out.filter(
        F.col("obs").isNotNull() & (F.col("filled") != F.col("obs"))
    ).count() == 0
    out.unpersist()


def test_calendar_heatmap_covers_week(spark, sf_dir):
    rows = ts_calendar_heatmap(spark, sf_dir).collect()
    assert {r["isodow"] for r in rows} == set(range(1, 8))
    assert all(0 <= r["hod"] <= 23 for r in rows)


def test_ewma_smooths_toward_series(spark, sf_dir):
    rows = ts_ewma(spark, sf_dir).collect()
    # first frame has one point: ewma == n exactly
    assert abs(rows[0]["ewma"] - rows[0]["n"]) < 1e-6
    # ewma stays within the min/max envelope of the series
    lo = min(r["n"] for r in rows)
    hi = max(r["n"] for r in rows)
    assert all(lo - 1e-6 <= r["ewma"] <= hi + 1e-6 for r in rows)
    # heavier weight on the current point than a plain mean: the ewma
    # tracks the latest value more closely than the frame average
    assert 0 < EWMA_DECAY < 1


def test_retention_offsets_start_at_zero(spark, sf_dir):
    out = ts_retention_cohort(spark, sf_dir).cache()
    assert out.filter(F.col("week_offset") < 0).count() == 0
    # every cohort has an offset-0 row (users are active in their first week)
    cohorts = out.select("cohort_week").distinct().count()
    zero = out.filter(F.col("week_offset") == 0).count()
    assert zero == cohorts
    out.unpersist()


def test_lttb_keeps_endpoints_and_bucket_order(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.timeseries import (
        LTTB_BUCKETS,
        ts_downsample_lttb,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    rows = ts_downsample_lttb(spark, sf_dir).collect()
    assert 0 < len(rows) <= LTTB_BUCKETS
    assert len({r["bucket"] for r in rows}) == len(rows)  # one point/bucket
    clicks = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .agg(F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts")))
        .first()
    )
    # the algorithm pins the series endpoints exactly
    assert rows[0]["t"] == clicks[0]
    assert rows[-1]["t"] == clicks[1]


def test_time_weighted_avg_within_value_range(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.timeseries import ts_time_weighted_avg

    rows = ts_time_weighted_avg(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # a weighted mean of values stays inside the global value range
        assert 0.0 <= r["twa"] <= 500.5
        assert r["n_weighted"] >= 1


def test_state_agg_partitions_tracked_time(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.timeseries import ts_state_agg

    rows = ts_state_agg(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["pct_time"] for r in rows) - 100.0) < 0.01
    assert all(r["micros_in_state"] > 0 for r in rows)
