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
    dsl_queries,
    extensions,
    graph_dedup,
    patterns,
    ppl_queries,
    querydsl,
    querydsl3,
    querydsl4,
    querydsl_aggs,
    querydsl_aggs2,
    querystring_queries,
    relational,
    relational2,
    relational3,
    relational4,
    scalar_sql,
    sequences,
    timeseries,
    timeseries2,
    training_pipeline,
    training_pipeline2,
    training_pipeline3,
    windows_pivot,
)

_MODULES = [
    windows_pivot,
    patterns,
    ppl_queries,
    dsl_queries,
    querystring_queries,
    extensions,
    querydsl,
    querydsl3,
    querydsl4,
    training_pipeline,
    training_pipeline2,
    training_pipeline3,
    timeseries,
    timeseries2,
    querydsl_aggs,
    querydsl_aggs2,
    sequences,
    graph_dedup,
    relational2,
    relational3,
    relational4,
    dashboard,
    cdc_queries,
    relational,
    scalar_sql,
]

# The driver's correctness harness samples the FIRST 50 entries of
# queries().  Union of r1-r10 driver rows = 306/306 distinct entries
# green — every pre-round-11 entry has at least one passing driver
# row.  This round-11 window = (a) the NEW round-11 entries, which
# have never had a driver row: engine_rollup_metrics (the full
# rollup-job metric set — sum/value_count/avg/min/max with delete-safe
# retraction through the aux count store), engine_rollup_search (the
# _rollup/_search analog: coarser-bucket re-aggregation over the
# stored metrics), engine_rollup_two_dim (multi-dimension rollup —
# derived day bucket × terms dim), dedup_span_trim_stream (the
# streaming trim composition, stream ≡ batch through a real
# checkpointed stream), engine_reindex_script (the _reindex script
# clause: in-flight {column: SQL expr} transforms), and
# bpe_train_merges / bpe_apply_tokens (BPE tokenizer training — the
# merge decisions value-checked by unrolling the iterations in SQL —
# and its per-doc application); then the STALEST driver rows by
# "latest green row" age, oldest first, each block in its original
# driver order: (b) the 18 rows last checked r4, (c) the first 25 of
# the 40 rows last checked r5 (the remaining 15 rotate in round 12)
# — 50 total.
_PRIORITY = [
    # (a) NEW this round (round 11) — never driver-checked
    "engine_rollup_metrics", "engine_rollup_search",
    "engine_rollup_two_dim", "dedup_span_trim_stream",
    "engine_reindex_script", "bpe_train_merges", "bpe_apply_tokens",
    # (b) latest driver row is r4, original r4 order
    "top_hits_per_bucket", "significant_terms", "histogram_value",
    "dis_max_best_fields", "function_score_fvf",
    "percentile_ranks_value", "collapse_by_source", "suggest_prefix",
    "highlight_fragment", "nested_query_same_element",
    "rescore_two_phase", "more_like_this", "filters_named_buckets",
    "percolate_stored_queries", "quality_repetition", "pii_scrub",
    "contamination_ngram", "token_budget",
    # (c) latest driver row is r5, original r5 order (first 30)
    "ts_gapfill_locf", "ts_ohlc_daily", "ts_moving_avg",
    "ts_zscore_anomaly", "ts_retention_cohort", "ts_regression_trend",
    "range_agg_value", "date_range_agg", "multi_terms_agg",
    "sampler_terms_agg", "cardinality_by_type",
    "scripted_metric_weighted", "geo_distance_filter",
    "min_cost_supplier", "volume_shipping", "nation_market_share",
    "large_quantity_customers", "supplier_diversity_by_brand",
    "grouping_sets_status", "mixture_sample", "shard_packing",
    "array_agg_types", "approx_sketches", "sessionize_batch",
    "range_join_same_user",
]

# Round-12 rotation TODO: any entries added after this round-11 window
# froze outrank re-checks; then the 15 remaining r5-era rows in r5
# order (composite_agg_page, pipeline_agg_cumsum,
# bucket_script_error_rate, avg_bucket_daily, dedup_embedding_srp,
# wildcard_query, terms_set_match, boosting_query, match_bool_prefix,
# rare_terms_agg, quality_unigram_lm, multimodal_manifest,
# asof_last_purchase, window_lag_delta, json_extract_props), then the
# oldest r6-era rows.


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
