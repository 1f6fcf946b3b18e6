"""Driver contract for the spark-graft builder (PySpark target).

Aggregates the engine's query surface from
postgres_opensearch_cdc_spark.queries.* — each module keeps its Spark
builders and DuckDB oracle SQL adjacent so they stay in lockstep.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from postgres_opensearch_cdc_spark.queries import (
    cdc_queries,
    dashboard,
    extensions,
    graph_dedup,
    patterns,
    querydsl,
    querydsl_aggs,
    relational,
    relational2,
    relational3,
    scalar_sql,
    timeseries,
    training_pipeline,
    windows_pivot,
)

_MODULES = [
    windows_pivot,
    patterns,
    extensions,
    querydsl,
    training_pipeline,
    timeseries,
    querydsl_aggs,
    graph_dedup,
    relational2,
    relational3,
    dashboard,
    cdc_queries,
    relational,
    scalar_sql,
]

# The driver's correctness harness samples the FIRST 50 entries of
# queries().  Rounds 1-4 accumulated green rows for 102 of the 127
# entries; this round-5 window lists, in order:
#   (a) the 25 entries that have never had a driver row (all of
#       timeseries / querydsl_aggs / graph_dedup / relational2 plus
#       mixture_sample + shard_packing),
#   (b) 5 entries whose old rows are stale or red and were just fixed
#       (array_agg_types list-serialization; the events.ts parquet-unit
#       fix behind q11_time_range / cdc_scd2_history / cdc_mirror_diff;
#       the approx_sketches r2-red that r3 fixed but never re-windowed),
#   (c) the 6 entries driver-red in r4 from the same ts-unit bug,
#   (d) 10 re-confirmations of events-time-dependent / perf-touched
#       entries (minhash rework, the regressed cdc_* cluster).
_PRIORITY = [
    # (a) never driver-checked
    "ts_gapfill_locf", "ts_ohlc_daily", "ts_moving_avg",
    "ts_zscore_anomaly", "ts_hierarchical_rollup", "ts_retention_cohort",
    "ts_regression_trend",
    "range_agg_value", "date_range_agg", "multi_terms_agg",
    "sampler_terms_agg", "adjacency_matrix_agg", "cardinality_by_type",
    "scripted_metric_weighted", "geo_distance_filter",
    # minhash runs immediately before the CC pair (which reuses its
    # pipeline) so the heavy LSH codegen is compiled exactly once
    "dedup_minhash_lsh", "dedup_cc_clusters", "dedup_cc_survivors",
    "min_cost_supplier", "volume_shipping", "nation_market_share",
    "large_quantity_customers", "supplier_diversity_by_brand",
    "grouping_sets_status",
    "mixture_sample", "shard_packing",
    # (b) stale/red rows, fixed this round
    "array_agg_types", "approx_sketches", "q11_time_range",
    "cdc_scd2_history", "cdc_mirror_diff",
    # (c) r4 driver-red, fixed by the ts-unit branch
    "sessionize_batch", "range_join_same_user", "composite_agg_page",
    "pipeline_agg_cumsum", "bucket_script_error_rate", "avg_bucket_daily",
    # (e) new round-5 operators (SRP-LSH embedding dedup, query-DSL
    # wildcard/terms_set/boosting/match_bool_prefix, rare_terms)
    "dedup_embedding_srp", "wildcard_query", "terms_set_match",
    "boosting_query", "match_bool_prefix", "rare_terms_agg",
    "quality_unigram_lm", "multimodal_manifest",
    # (d) re-confirmations
    "asof_last_purchase", "window_lag_delta",
    "json_extract_props", "cdc_mirror_compact",
    "cdc_deleted_keys",
]

# Round-6 rotation TODO: the 16 entries added after this window filled
# have sf0.001+sf0.01 local parity but no driver row yet — next round,
# move them into the first 50: geo_bounding_box, top_metrics_agg,
# serial_diff_daily, moving_fn_minmax, string_stats_agg, boxplot_agg,
# mad_agg, auto_date_histogram, t_test_agg, cumulative_cardinality,
# span_near_query, priority_late_orders, forecast_revenue,
# ship_lag_priority, small_quantity_revenue, inactive_high_balance
# (plus re-checks of anything round 5 leaves red).


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the full CDC apply path
    (changelog → last-write-wins compaction → delete suppression), the
    engine's core capability (SURVEY §7.1)."""
    return cdc_queries.cdc_mirror_compact(spark, "/root/testdata/sf0.001")


def _ordered(mapping_attr: str) -> dict:
    merged: dict = {}
    for m in _MODULES:
        merged.update(getattr(m, mapping_attr))
    out = {k: merged[k] for k in _PRIORITY if k in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered("QUERIES")


def oracle_sql() -> dict[str, str]:
    return _ordered("ORACLE")
