"""Training-pipeline batch 2: invariants beyond the oracle gate —
band/filter accounting, temperature-rate monotonicity, chunk-count
consistency, and the radial search's single-scan plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline2 import (
    RADIAL_MIN_COS,
    ann_radial_search,
    chunk_dedup_stats,
    length_percentile_filter,
    mixture_temperature_sample,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import count_nodes, explain_plan


def test_length_band_accounts_for_every_doc(spark, sf_dir):
    rows = length_percentile_filter(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "documents").count()
    assert sum(r["kept"] + r["too_short"] + r["too_long"] for r in rows) == total
    # the 5-95 band keeps the bulk of the corpus
    assert sum(r["kept"] for r in rows) >= 0.85 * total
    lo, hi = rows[0]["p_lo"], rows[0]["p_hi"]
    assert lo < hi and all(r["p_lo"] == lo and r["p_hi"] == hi for r in rows)


def test_temperature_upweights_small_languages(spark, sf_dir):
    rows = mixture_temperature_sample(spark, sf_dir).collect()
    by_n = sorted(rows, key=lambda r: r["n_docs"])
    rates = [r["target_rate"] for r in by_n]
    # smaller corpus share -> keep rate never lower than a bigger one's
    assert all(a >= b - 1e-9 for a, b in zip(rates, rates[1:]))
    # the smallest language keeps everything, larger ones are subsampled
    assert rates[0] == 1.0 and rates[-1] < 1.0
    for r in rows:
        assert 0 <= r["kept_docs"] <= r["n_docs"]


def test_chunk_stats_are_consistent(spark, sf_dir):
    r = chunk_dedup_stats(spark, sf_dir).collect()[0]
    assert r["total_chunks"] == r["distinct_chunks"] + r["dup_occurrences"]
    assert r["max_chunk_freq"] >= 1


def test_radial_search_is_one_scan_and_thresholded(spark, sf_dir):
    df = ann_radial_search(spark, sf_dir)
    plan = explain_plan(df)
    # one embeddings scan for all three queries (the 3 head() lookups
    # happen at build time, not in this plan)
    assert count_nodes(plan, "Scan parquet") == 1
    rows = df.collect()
    assert rows and all(r["cos_sim"] >= RADIAL_MIN_COS for r in rows)
    assert all(r["vec_id"] != r["query_id"] for r in rows)


def test_knn_join_returns_k_per_query(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.training_pipeline2 import (
        KNN_JOIN_K,
        KNN_JOIN_QUERIES,
        knn_join_topk,
    )

    rows = knn_join_topk(spark, sf_dir).collect()
    assert len(rows) == KNN_JOIN_QUERIES * KNN_JOIN_K
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = [r["rank"] for r in rs]
        assert ranks == [1, 2, 3]
        sims = [r["cos_sim"] for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r["vec_id"] != q for r in rs)
