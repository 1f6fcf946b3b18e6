"""Adaptive execution evidence: AQE coalesces shuffle partitions at
runtime (the config session.py turns on) and Catalyst auto-broadcasts
small dimensions without hints."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.registry import load_table


def test_aqe_coalesces_small_shuffles(spark, sf_dir):
    df = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    df.collect()  # runtime plan only exists after execution
    final_plan = df._jdf.queryExecution().executedPlan().toString()
    assert "AQEShuffleRead" in final_plan and "coalesced" in final_plan, (
        "expected AQE to coalesce the 5-group shuffle at runtime"
    )


def test_auto_broadcast_without_hint(spark, sf_dir):
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    joined = cust.join(nation, cust.c_nationkey == nation.n_nationkey)
    joined.collect()
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in final_plan, (
        "25-row nation dim must auto-broadcast without an explicit hint"
    )
