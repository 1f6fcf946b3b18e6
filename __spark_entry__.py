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
    training_pipeline9,
    training_pipeline10,
    training_pipeline11,
    training_pipeline12,
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
    training_pipeline9,
    training_pipeline10,
    training_pipeline11,
    training_pipeline12,
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
# queries().  Since round 14 this window is DERIVED, not hand-counted
# (the hand-maintained queue dropped its oldest block twice —
# round-13 verdict #1): blocks (a)/(b) below are this round's
# new/changed entries, and everything after them is the verbatim
# output of
#   python3 tools/staleness.py --emit (50 - _HAND_STAGED) --exclude <a+b names>
# which unions every CORRECTNESS_r*.json and stages entries by their
# LATEST fully-green driver round, oldest first, ties in current
# driver order.  Re-running that command against the committed
# artifacts must reproduce blocks (c..e) exactly —
# tests/test_staleness_window.py asserts this on every run, so the
# queue can never silently drop a block again.
# _HAND_STAGED = how many leading window rows are this round's
# hand-chosen new/changed block; everything after them through row 50
# must be the staleness tool's output.
_HAND_STAGED = 11
_PRIORITY = [
    # (a) NEW this round (round 14) — never driver-checked
    "sketch_hll_production",      # p=14 through the oracle gate
    "dedup_edit_distance",        # levenshtein re-score of LSH pairs
    "dedup_containment_join",     # asymmetric prefix filter, exact
    "embedding_gram_matrix",      # Arrow-partial X^T X
    "embedding_pca_power",        # unrolled power iteration oracle
    "text_novelty_ngram",         # corpus-df novelty / boilerplate
    "cooc_pmi_topk",              # doc-level co-occurrence PMI
    "embedding_gram_stream",      # additive Gram store, stream≡batch
    "feature_mi_label",           # MI feature selection
    "dedup_lsh_recall_audit",     # measured LSH recall vs exact truth
    # (b) implementation changed this round — re-certify
    "dedup_prefix_filter_join",   # array-intersect verify rewrite
    # (c) latest green row is r5 — the block the r13 hand-count lost
    "asof_last_purchase", "multimodal_manifest", "quality_unigram_lm",
    "rare_terms_agg",
    # (d) latest green row is r6
    "significant_text", "mixture_temperature_sample",
    "chunk_dedup_stats", "ann_radial_search", "frequent_item_sets_agg",
    "eql_sequence", "funnel_steps", "change_point_cusum",
    "top_supplier_revenue", "profit_by_nation_year",
    "waiting_suppliers", "set_ops_nations",
    # (e) oldest r7-era rows, current driver order (first 23)
    "ppl_where_stats", "ppl_top_sources", "ppl_rare_langs",
    "ppl_eval_fields", "ppl_dedup_rename", "ppl_parse_stats",
    "ppl_span_histogram", "ppl_eventstats_share",
    "ppl_trendline_daily", "ppl_join_segment", "ppl_lookup_nation",
    "ppl_in_like", "ppl_grok_stats", "ppl_patterns_template",
    "ppl_eval_strings", "ppl_span_15m", "dsl_bool_filtered_terms",
    "dsl_should_hits", "dsl_date_histogram", "dsl_value_histogram",
    "dsl_range_buckets", "dsl_filters_named", "dsl_nested_day_type",
]

# Window accounting: (a)=10, (b)=1, (c)=4, (d)=12, (e)=23 — exactly 50.
# The round-15 queue continues from tools/staleness.py output after
# these 50 land in CORRECTNESS_r14 (next up: the remaining r7-era
# rows, dsl_top_hits_by_type onward).


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
