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
# queries().  Union of r1-r7 driver rows = 228 of 277 entries, all
# green.  49 entries have never had a driver row: the 47 staged last
# round (each passed the round-7 verdict's independent sf0.01 parity
# rerun, and the full local check_parity.py sweep this round) plus
# the 2 entries NEW this round (ann_ivf_index_topk — the persisted
# cell-partitioned IVF index; engine_search_mirror — the CdcEngine
# mirror + DSL search composed end-to-end).  This round-8 window
# fills all 50 slots with those 49 + 1 re-check of the oldest
# driver row (q08_top_n, r1-era), in order below.  Resolution of the
# round-7 plan's arithmetic: the verdict asked for 47 + 3 re-checks
# AND a driver row for engine_search_mirror (51 names for 50 slots);
# complete driver coverage of the grown surface outranks re-checks
# that the local parity sweep re-confirms anyway, so q09_limit /
# q10_count re-checks are staged for round 9 (both re-verified
# locally at sf0.01 this round, see COVERAGE.md).
# After this window the driver union is 277/277 — every entry
# driver-verified at least once.
_PRIORITY = [
    # (a) round-7 staged batch — never driver-checked
    "vocab_coverage", "ts_autocorr", "ts_rolling_corr",
    "ts_seasonal_anomaly", "event_transition_matrix",
    "moving_percentiles_agg", "geo_line_agg", "ks_test_agg",
    "min_sum_bucket_agg", "eql_sequence_until", "bracket_revenue",
    "window_percent_rank", "fuzzy_name_join", "embedding_centroids",
    "intervals_query", "distance_feature_query", "random_score_query",
    "nested_agg_items", "ids_query", "exists_missing_agg",
    "rank_feature_query", "script_score_query", "span_first_query",
    "match_phrase_prefix", "weighted_avg_agg", "categorize_text_agg",
    "has_child_query", "has_parent_query", "terms_lookup_filter",
    "geo_polygon_query", "global_agg_compare",
    "transform_entity_centric", "quality_bigram_lm",
    "length_percentile_filter", "knn_join_topk",
    # (b) features implemented after the round-7 window froze —
    # never driver-checked
    "dsl_composite_desc", "dsl_nested_ordered",
    "span_or_query", "span_not_query", "span_containing_query",
    "term_suggester", "rank_eval", "ppl_dispersion_stats",
    "dsl_filters_metrics", "quality_linear_classifier",
    "embedding_outliers", "ppl_ad_zscore",
    # (c) NEW this round (round 8)
    "ann_ivf_index_topk", "engine_search_mirror",
    # (d) re-check of the oldest driver row (r1-era)
    "q08_top_n",
]

# Round-9 rotation TODO (pre-staged). New entries always outrank
# re-checks; the 7 entries added AFTER the round-8 window froze are
# never driver-checked (all local-green at sf0.01):
#   sqs_required_prohibited, sqs_or_phrase, sqs_prefix_keyword (the
#   simple_query_string lenient search-bar interface),
#   span_within_query, constant_score_query,
#   ppl_fieldsummary, ppl_expand_tokens,
#   ann_pq_index_topk (persisted PQ-codes index — ADC over
#   ingest-time codes, same oracle as ann_pq_adc_topk),
#   ann_ivf_append_topk (incremental index maintenance: build half +
#   append half, full-corpus oracle proves append ≡ rebuild)
# Then pure re-confirmation, oldest driver rows first:
#   q09_limit, q10_count (r1-era, locally re-verified in round 8),
#   then the r1/r2-era dashboard + training-pipeline rows
#   (q01_term_filter, q02_match_text, dedup_exact, dedup_minhash_lsh,
#   ann_cosine_topk, text_stats, quality_repetition, pii_scrub,
#   contamination_ngram, token_budget, ...) in original driver order.


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
