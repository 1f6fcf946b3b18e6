"""Skew-mitigation + bucketing: salted aggregation/join correctness vs
the direct forms, and shuffle-free co-located joins on bucketed tables."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.skew import salted_count, salted_join
from postgres_opensearch_cdc_spark.ops import bootstrap_bucketed_mirror


@pytest.fixture(scope="module")
def skewed(spark):
    # 10_000 rows: 60% on key 1 (hot), rest across 100 keys
    hot = spark.range(6000).select(F.lit(1).alias("k"), F.col("id").alias("v"))
    cold = spark.range(4000).select(
        (F.col("id") % 100 + 2).alias("k"), F.col("id").alias("v")
    )
    return hot.unionAll(cold)


def test_salted_count_matches_direct(spark, skewed):
    direct = {r["k"]: r["cnt"] for r in skewed.groupBy("k").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    salted = {r["k"]: r["cnt"] for r in salted_count(skewed, ["k"], salt_buckets=8, salt_source="v").collect()}
    assert salted == direct


def test_salted_join_matches_direct(spark, skewed):
    dim = spark.createDataFrame(
        [(k, f"name_{k}") for k in range(1, 102)], "k long, name string"
    )
    direct = skewed.join(dim, "k").groupBy("k").count()
    salted = salted_join(skewed, dim, "k", salt_buckets=4, big_salt_source="v").groupBy("k").count()
    assert {tuple(r) for r in direct.collect()} == {tuple(r) for r in salted.collect()}


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts must
    join without shuffling either side — the co-located join the CDC
    mirror relies on at 100 TB."""
    facts = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("amount")
    )
    dims = spark.range(1_000).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    bootstrap_bucketed_mirror(facts, "b_facts", "k", num_buckets=8)
    bootstrap_bucketed_mirror(dims, "b_dims", "k", num_buckets=8)
    try:
        # disable broadcast so the join would otherwise shuffle both sides
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("b_facts").join(spark.table("b_dims"), "k")
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join must not shuffle"
        assert joined.count() == 1_000
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_facts")
        spark.sql("DROP TABLE IF EXISTS b_dims")
