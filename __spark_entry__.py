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
    hybrid,
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
    training_pipeline4,
    training_pipeline5,
    training_pipeline6,
    training_pipeline7,
    training_pipeline8,
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
    training_pipeline4,
    training_pipeline5,
    training_pipeline6,
    training_pipeline7,
    training_pipeline8,
    hybrid,
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
# queries().  Union of r1-r11 driver rows = 313/313 distinct entries
# green — every pre-round-12 entry has at least one passing driver
# row.  This round-12 window = (a) the NEW round-12 entries, never
# driver-checked: bpe_train_merges_local (production-scale BPE
# training — one distributed word-count pass + driver-side merge
# loop, decision-identical to the Spark loop and answering the SAME
# unrolled-iteration oracle), bpe_apply_tokens_arrow (the mapInPandas
# encoder, row-identical to the expression form's oracle),
# engine_monitor_stream_alerts (monitor evaluation through the real
# checkpointed streaming path), engine_alert_log_counts (_cat-style
# committed alert-log counts with the batch-id exactly-once replay
# exercised in-entry); (b) the three entries whose implementation
# CHANGED this round — the unbounded-global-window rewrites onto the
# distributed rank/prefix-sum construction (functions/ranking.py):
# window_ntile, ks_test_agg, variable_width_histogram — re-certified
# against their unchanged window-builtin oracles; then the STALEST
# driver rows by "latest green row" age, oldest first, each block in
# its original driver order: (c) the 15 remaining r5-era rows,
# (d) the first 28 of the 48 rows last checked r6 — 50 total.
_PRIORITY = [
    # (a) NEW this round (round 12) — never driver-checked
    # (a4) the round-12 batch-6 entries: HLL registers + KMV bottom-k
    # sketches (the mergeable-summary family with sketch_count_min),
    # fixed-point PageRank (unrolled-iteration oracle), unigram-LM
    # Viterbi segmentation (exhaustive recursive-CTE oracle)
    "sketch_hyperloglog", "sketch_kmv_overlap",
    "graph_pagerank", "unigram_viterbi_segment",
    "sketch_hll_rollup_stream",
    "search_hybrid_rrf", "search_hybrid_minmax",
    "graph_label_propagation", "dp_noised_counts", "vocab_zipf_fit",
    "search_eval_metrics", "vocab_heaps_fit",
    "sketch_cms_rollup_stream",
    "graph_triangles", "dedup_prefix_filter_join",
    "search_rank_rbo",
    # (a3) the round-12 batch-5 entries: WordPiece-objective merge
    # training (unrolled-iteration oracle, the BPE pattern), CCNet
    # perplexity tertiles (integer micro-nat scores + distributed
    # rank), winnowing fingerprints (MOSS), perceptual-hash groups
    # over the Arrow multimodal path
    "wordpiece_train_scores", "wordpiece_apply_longest",
    "quality_ccnet_buckets", "quality_kneser_ney",
    "chunk_content_defined", "sketch_count_min",
    "contamination_bloom", "sample_weighted_topk",
    "fingerprint_winnowing", "multimodal_ahash_groups",
    # (a2) the round-12 extension batch: semantic dedup (k-means fit
    # value-checked via unrolled Lloyd iterations + SemDeDup prune),
    # greedy sequence packing (recursive-CTE oracle), Gopher-style
    # quality rules, char entropy
    "kmeans_clusters", "dedup_semantic_keep", "dedup_semantic_stream",
    "pack_sequences_greedy", "quality_gopher_rules", "text_char_entropy",
    "dsir_importance_scores", "contamination_embedding",
    # (a1) the round-12 close-out batch
    "bpe_train_merges_local", "bpe_apply_tokens_arrow",
    "engine_monitor_stream_alerts", "engine_alert_log_counts",
    # (b) rewritten this round (distributed global ordering)
    "window_ntile", "ks_test_agg", "variable_width_histogram",
    # (c) latest driver row is r5, original r5 order (the last 15)
    "composite_agg_page", "pipeline_agg_cumsum",
    "bucket_script_error_rate", "avg_bucket_daily",
    "dedup_embedding_srp", "wildcard_query", "terms_set_match",
    "boosting_query", "match_bool_prefix", "rare_terms_agg",
    "quality_unigram_lm", "multimodal_manifest", "asof_last_purchase",
    "window_lag_delta", "json_extract_props",
    # (d) latest driver row is r6, original r6 order (first 23)
    "span_near_query", "geo_bounding_box", "top_metrics_agg",
    "serial_diff_daily", "moving_fn_minmax", "string_stats_agg",
    "boxplot_agg", "mad_agg", "auto_date_histogram", "t_test_agg",
    "cumulative_cardinality", "priority_late_orders",
    "forecast_revenue", "ship_lag_priority", "small_quantity_revenue",
    "inactive_high_balance", "ts_hierarchical_rollup",
    "adjacency_matrix_agg", "dedup_cc_clusters", "dedup_cc_survivors",
]

# With the 12 batch-6/7 entries (sketch family incl. the streaming
# HLL rollup, PageRank, Viterbi, hybrid search + retrieval eval, LPA,
# DP release, Zipf/Heaps fits) prepended, the 50-row window covers the
# new blocks + (a3)/(a2)/(a1)/(b) + the first 13 rows of (c): the last
# 2 (c) rows (window_lag_delta, json_extract_props — latest green r5)
# and ALL 20 (d)-block rows (span_near_query … dedup_cc_survivors —
# latest green r6) fall outside it and move to the FRONT of the
# round-13 re-check queue.
# Round-13 rotation TODO: any entries added after this round-12 window
# froze outrank re-checks; then window_lag_delta + json_extract_props,
# then the 20 (d)-block rows displaced above,
# then the remaining 28 r6-era rows in r6
# order (extended_stats_agg, derivative_agg, stats_bucket_agg,
# percentiles_bucket_agg, max_bucket_day, bucket_sort_agg,
# bucket_selector_agg, normalize_pct_agg, rate_agg, geo_centroid_agg,
# geo_grid_agg, matrix_stats_agg, diversified_sampler_agg,
# pinned_query, customer_order_counts, set_ops_nations,
# frequent_item_sets_agg, top_supplier_revenue, profit_by_nation_year,
# waiting_suppliers, eql_sequence, funnel_steps, change_point_cusum,
# significant_text, mixture_temperature_sample, chunk_dedup_stats,
# ann_radial_search — variable_width_histogram already re-checked
# r12), then the oldest r7-era rows.


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
