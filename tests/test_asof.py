"""As-of join semantics on hand-built timelines: inclusive boundary,
no-match nulls, per-key isolation, tie-break among same-ts right rows,
forward direction."""

from __future__ import annotations

from datetime import datetime

from postgres_opensearch_cdc_spark.functions.asof import asof_join


def ts(m):
    return datetime(2024, 1, 1, 0, m)


def test_backward_basic_and_nulls(spark):
    left = spark.createDataFrame(
        [(1, ts(5), 100), (1, ts(15), 101), (2, ts(10), 102)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(1, ts(3), 900, 1.0), (1, ts(10), 901, 2.0), (3, ts(1), 902, 3.0)],
        "k long, ts timestamp, rid long, val double",
    )
    out = asof_join(left, right, ["k"], "ts", ["rid", "val"], seq_col="rid")
    rows = {r["lid"]: (r["rid"], r["val"]) for r in out.collect()}
    assert rows[100] == (900, 1.0)  # ts(5) → latest right at ts(3)
    assert rows[101] == (901, 2.0)  # ts(15) → right at ts(10)
    assert rows[102] == (None, None)  # key 2 has no right rows


def test_backward_inclusive_boundary(spark):
    left = spark.createDataFrame([(1, ts(10), 1)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame([(1, ts(10), 7)], "k long, ts timestamp, rid long")
    out = asof_join(left, right, ["k"], "ts", ["rid"]).head()
    assert out["rid"] == 7  # right.ts == left.ts matches (<= semantics)


def test_same_ts_right_ties_latest_seq_wins(spark):
    left = spark.createDataFrame([(1, ts(10), 1)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, ts(5), 7), (1, ts(5), 9)], "k long, ts timestamp, rid long"
    )
    out = asof_join(left, right, ["k"], "ts", ["rid"], seq_col="rid").head()
    assert out["rid"] == 9


def test_forward_direction(spark):
    left = spark.createDataFrame([(1, ts(5), 1)], "k long, ts timestamp, lid long")
    right = spark.createDataFrame(
        [(1, ts(3), 7), (1, ts(8), 8), (1, ts(12), 9)],
        "k long, ts timestamp, rid long",
    )
    out = asof_join(left, right, ["k"], "ts", ["rid"], direction="forward").head()
    assert out["rid"] == 8  # earliest right at ts >= 5


def test_left_row_count_preserved(spark, sf_dir):
    from pyspark.sql import functions as F

    from postgres_opensearch_cdc_spark.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("pid")
    )
    out = asof_join(views, purchases, ["user_id"], "ts", ["pid"], seq_col="pid")
    assert out.count() == views.count()
