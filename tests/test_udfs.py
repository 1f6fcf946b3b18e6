"""Declared UDF surface: pandas scalar, grouped agg, grouped map, UDTF."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.udfs import (
    SessionSplit,
    normalize_vector,
    per_user_trend,
    session_split_udtf,
    weighted_mean,
)


def test_normalize_vector(spark):
    df = spark.createDataFrame([([3.0, 4.0],), (None,)], "v array<double>")
    rows = df.select(normalize_vector(F.col("v")).alias("n")).collect()
    assert [round(x, 6) for x in rows[0]["n"]] == [0.6, 0.8]
    assert rows[1]["n"] is None


def test_weighted_mean_grouped_agg(spark):
    df = spark.createDataFrame(
        [("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 10.0, 1.0)],
        "g string, v double, w double",
    )
    out = {
        r["g"]: r["wm"]
        for r in df.groupBy("g").agg(weighted_mean("v", "w").alias("wm")).collect()
    }
    assert math.isclose(out["a"], (1 * 1 + 3 * 3) / 4)
    assert out["b"] == 10.0


def test_per_user_trend(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "value")
    out = per_user_trend(ev)
    rows = out.collect()
    assert {r["user_id"] for r in rows} == {
        r["user_id"] for r in ev.select("user_id").distinct().collect()
    }
    total = sum(r["n"] for r in rows)
    assert total == ev.count()


def test_session_split_udtf_logic():
    # pure-python check of the UDTF generator
    rows = list(SessionSplit().eval(7, [0, 10, 2000, 2010, 9000], gap=600))
    assert rows == [(7, 0, 0, 10, 2), (7, 1, 2000, 2010, 2), (7, 2, 9000, 9000, 1)]


def test_session_split_udtf_in_query(spark):
    udtf_handle = session_split_udtf(spark)
    spark.udtf.register("session_split", udtf_handle)
    df = spark.sql(
        "SELECT * FROM session_split(7::bigint, array(0,10,2000,2010,9000), 600)"
    )
    rows = [tuple(r) for r in df.collect()]
    assert rows == [(7, 0, 0, 10, 2), (7, 1, 2000, 2010, 2), (7, 2, 9000, 9000, 1)]
