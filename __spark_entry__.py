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
# queries().  Union of r1-r6 driver rows = 178 of 258 entries, all
# green; 80 entries (every round-6 addition listed below plus the
# late-round batches) have never had a driver row — all 80 pass the
# local check_parity.py rerun at sf0.01.  This round-7 window fills
# all 50 slots from that list, in order:
#   (a) the PPL compiler pipelines (16 entries) — a whole query
#       interface with zero driver evidence until now; includes the
#       two whose semantics changed late in round 6
#       (ppl_eventstats_share scale-free threshold, ppl_span_15m),
#   (b) the request-body DSL JSON compiler bodies (14 entries) — the
#       other undriven interface; includes dsl_terms_ordered (late
#       semantics change),
#   (c) the product-quantization ANN pair and the analyzer-chain pair,
#   (d) important_part_value (threshold made scale-free late in r6),
#   (e) the 5 NEW qs_* entries — the Lucene query-string search-bar
#       parser added this round (the last reference interface that had
#       no counterpart), each syntax shape oracle-checked,
#   (f) 10 of the remaining never-checked batch entries (timeseries-2
#       + training-pipeline-3).
# After this window the r1-r7 union covers 233 of the 275 entries
# (the surface grew by 12 more late-round additions, all staged in the
# round-8 list below).
_PRIORITY = [
    # (a) PPL compiler — never driver-checked
    "ppl_where_stats", "ppl_top_sources", "ppl_rare_langs",
    "ppl_eval_fields", "ppl_dedup_rename", "ppl_parse_stats",
    "ppl_span_histogram", "ppl_eventstats_share", "ppl_trendline_daily",
    "ppl_join_segment", "ppl_lookup_nation", "ppl_in_like",
    "ppl_grok_stats", "ppl_patterns_template", "ppl_eval_strings",
    "ppl_span_15m",
    # (b) DSL JSON compiler — never driver-checked
    "dsl_bool_filtered_terms", "dsl_should_hits", "dsl_date_histogram",
    "dsl_value_histogram", "dsl_range_buckets", "dsl_filters_named",
    "dsl_nested_day_type", "dsl_top_hits_by_type", "dsl_composite_after",
    "dsl_knn_query", "dsl_search_after", "dsl_range_metrics",
    "dsl_week_histogram", "dsl_terms_ordered",
    # (c) PQ ANN + analyzer chains
    "ann_pq_adc_topk", "ann_pq_rerank_topk",
    "analyzer_custom_chain", "analyzer_edge_ngram_prefix",
    # (d) late-round-6 semantics change
    "important_part_value",
    # (e) NEW this round: Lucene query-string parser, one entry per
    # syntax shape (term conjunction, spaced comparison, wildcard,
    # grouped/bracket ranges + NOT + _exists_, analyzed free text)
    "qs_term_conjunction", "qs_spaced_comparison", "qs_wildcard_terms",
    "qs_grouped_ranges", "qs_free_text",
    # (f) timeseries-2 / training-pipeline-3 never-checked batch
    "ts_interpolate_linear", "ts_ewma", "ts_downsample_lttb",
    "ts_time_weighted_avg", "ts_state_agg", "ts_calendar_heatmap",
    "bucket_correlation_agg", "ts_seasonal_profile",
    "stratified_split", "source_overlap_matrix",
]

# Round-8 rotation TODO (pre-staged): the 35 remaining never-checked
# entries, then re-confirmations of the oldest r1/r2-era rows.
# Never-checked (all local-green at sf0.01 via check_parity.py):
#   vocab_coverage, ts_autocorr, ts_rolling_corr, ts_seasonal_anomaly,
#   event_transition_matrix, moving_percentiles_agg, geo_line_agg,
#   ks_test_agg, min_sum_bucket_agg, eql_sequence_until,
#   bracket_revenue, window_percent_rank, fuzzy_name_join,
#   embedding_centroids, intervals_query, distance_feature_query,
#   random_score_query, nested_agg_items, ids_query,
#   exists_missing_agg, rank_feature_query, script_score_query,
#   span_first_query, match_phrase_prefix, weighted_avg_agg,
#   categorize_text_agg, has_child_query, has_parent_query,
#   terms_lookup_filter, geo_polygon_query, global_agg_compare,
#   transform_entity_centric, quality_bigram_lm,
#   length_percentile_filter, knn_join_topk, plus the twelve entries for
#   features implemented after the round-7 window froze:
#   dsl_composite_desc (desc source pagination), dsl_nested_ordered
#   (outer order/_key + min_doc_count with a sub-bucket),
#   span_or_query, span_not_query, span_containing_query (span
#   family completion), term_suggester (did-you-mean over the
#   aggregated vocabulary), rank_eval (precision@k / MRR),
#   ppl_dispersion_stats (stddev/var/percentile stats aggregates),
#   dsl_filters_metrics (filters agg with metric sub-aggs),
#   quality_linear_classifier (fasttext-style hashed-feature filter),
#   embedding_outliers (farthest-from-centroid label audit),
#   ppl_ad_zscore (the ad command — z-score analog of hosted RCF)
# Re-checks (3 oldest driver rows, r1/r2-era — 47 never-checked
# entries above + these fill the 50 slots exactly):
#   q08_top_n, q09_limit, q10_count
# After round 8 every entry has a driver row and the oldest rows are
# re-confirmed.


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
