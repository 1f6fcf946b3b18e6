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


def _drop_table_and_location(spark, name):
    """DROP TABLE alone can't clean a warehouse dir orphaned by a crashed
    prior run (the catalog no longer knows the table, so saveAsTable hits
    LOCATION_ALREADY_EXISTS) — remove the physical location too."""
    import shutil
    from urllib.parse import urlparse

    spark.sql(f"DROP TABLE IF EXISTS {name}")
    warehouse = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    shutil.rmtree(f"{warehouse}/{name}", ignore_errors=True)


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
    _drop_table_and_location(spark, "b_facts")
    _drop_table_and_location(spark, "b_dims")
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
        _drop_table_and_location(spark, "b_facts")
        _drop_table_and_location(spark, "b_dims")


def _skewed_changelog(spark, n=20_000, hot_keys=5, cold_keys=1_000):
    """Hot-key changelog: the first half of events hammer `hot_keys`
    keys (≈50% of volume on <1% of the key space)."""
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.pmod(F.xxhash64("id"), F.lit(hot_keys)))
        .otherwise(F.lit(hot_keys) + F.pmod(F.xxhash64("id"), F.lit(cold_keys)))
        .alias("key"),
        F.col("id").alias("offset"),
        F.lit("u").alias("op"),
        (F.col("id") % 97).cast("double").alias("value"),
    )


def test_agg_strategy_collapses_map_side_on_hot_keys(spark):
    """strategy='agg' must place a PARTIAL max_by aggregate BEFORE the
    exchange — the map-side collapse that (a) cuts shuffle volume 3-4x
    on a 50%-hot changelog (measured in tools/bench_skew.py) and
    (b) bounds any key's reducer input at #map-partitions rows, where
    the window strategy hands one reducer the hot key's entire stream."""
    from postgres_opensearch_cdc_spark.cdc.apply import compact_changelog

    log = _skewed_changelog(spark)
    out = compact_changelog(log, ["key"], ["offset"], strategy="agg")
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    # formatted plan lists operators leaf-to-root; the partial aggregate
    # node must sit below the exchange on the hash-partitioned key
    import re

    assert "max_by" in plan
    agg_nodes = [
        m.start() for m in re.finditer(r"HashAggregate|SortAggregate|ObjectHashAggregate", plan)
    ]
    assert len(agg_nodes) >= 2, "expected partial+final aggregate pair"
    assert "hashpartitioning(key" in plan

    # and the two strategies agree on the skewed input
    w = compact_changelog(log, ["key"], ["offset"], strategy="window")
    assert (
        out.select("key", "offset").exceptAll(w.select("key", "offset")).count() == 0
    )
    assert (
        w.select("key", "offset").exceptAll(out.select("key", "offset")).count() == 0
    )


def test_map_side_collapse_reduces_shuffle_rows(spark):
    """Quantitative form of the collapse: the partial-aggregate output
    (what actually enters the shuffle) must be well under the event
    count when hot keys repeat within partitions."""
    log = _skewed_changelog(spark, n=20_000).repartition(8)
    total = log.count()
    partial_rows = (
        log.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "key")
        .agg(F.count(F.lit(1)))
        .count()
    )
    assert partial_rows < total / 2, (partial_rows, total)
