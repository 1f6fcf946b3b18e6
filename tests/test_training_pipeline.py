"""Tests for the training-data governance operators
(queries/training_pipeline.py, functions/pii.py). Value parity vs
DuckDB is covered by the driver gate; these pin the semantics and the
scale-shape (no shuffle for per-doc metrics, broadcast for the
benchmark join)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions import pii
from postgres_opensearch_cdc_spark.queries import training_pipeline as tp


def test_pii_scrub_redacts_emails_phones_and_ids(spark):
    df = spark.createDataFrame(
        [
            ("reach me at alice@example.com or +1 555-123-4567",),
            ("Customer#000000042 balance 1234567890",),
            ("nothing sensitive here",),
        ],
        ["t"],
    )
    out = df.select(
        pii.scrub(F.col("t")).alias("s"),
        pii.redaction_count(F.col("t")).alias("n"),
    ).collect()
    assert out[0].s == "reach me at [EMAIL] or [PHONE]"
    assert out[0].n == 2
    assert out[1].s == "[CUSTOMER_ID] balance [NUMBER]"
    assert out[1].n == 2
    assert out[2].s == "nothing sensitive here"
    assert out[2].n == 0


def test_pii_scrub_counts_match_patterns_on_customer(spark, sf_dir):
    rows = tp.pii_scrub(spark, sf_dir).collect()
    # every synthetic customer name is a Customer#NNN id tag
    assert all(r.scrubbed_name == "[CUSTOMER_ID]" for r in rows)
    assert all(r.n_redactions == 1 for r in rows)


def test_bpe_token_count_splits_digits_and_punct(spark):
    from postgres_opensearch_cdc_spark.functions import text as textfn

    df = spark.createDataFrame(
        [
            ("plain prose words", 3, 3),
            ("v2.0 costs $45,000!", 3, 10),  # ws: 3; bpe: v 2 . 0 costs $ 45 , 000 !
            ("", 1, 0),  # split('') -> [''] for ws; no bpe pieces
        ],
        ["t", "ws_expect", "bpe_expect"],
    )
    rows = df.select(
        "ws_expect",
        "bpe_expect",
        textfn.token_count(F.col("t")).alias("ws"),
        textfn.bpe_token_count(F.col("t")).alias("bpe"),
    ).collect()
    for r in rows:
        assert r.ws == r.ws_expect
        assert r.bpe == r.bpe_expect


def test_quality_repetition_flags_are_threshold_consistent(spark, sf_dir):
    rows = tp.quality_repetition(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        expect = (
            r.top_bigram_frac > tp.TOP_BIGRAM_MAX
            or r.dup_bigram_frac > tp.DUP_BIGRAM_MAX
        )
        assert r.flagged == expect
        assert 0.0 <= r.dup_bigram_frac <= 1.0
        assert 0.0 < r.top_bigram_frac <= 1.0
    assert any(r.flagged for r in rows), "thresholds never trip on this corpus"
    assert not all(r.flagged for r in rows), "thresholds flag everything"


def test_quality_repetition_plan_has_no_shuffle_before_sort(spark, sf_dir):
    # per-doc metrics must not shuffle the token stream: the only
    # Exchanges allowed are the under-partitioned-source repartition
    # (RoundRobin, id+text only — no derived data) and the final
    # orderBy's range partitioning; no hash shuffle of grams
    df = tp.quality_repetition(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "hashpartitioning" not in plan.lower()


def test_contamination_join_broadcasts_benchmark(spark, sf_dir):
    df = tp.contamination_ngram(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert all(r.doc_id >= tp.BENCHMARK_MAX_DOC_ID for r in rows)
    assert all(r.n_shared_grams >= 1 for r in rows)


def test_contamination_self_detection_sanity(spark, sf_dir):
    # a benchmark doc's own text is fully contaminated by construction:
    # run the same plan with the benchmark as corpus → every doc hits
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < tp.BENCHMARK_MAX_DOC_ID
    )
    grams = docs.select(
        "doc_id",
        F.explode(tp._ngrams(tp._toks(F.col("text")), tp.CONTAM_N)).alias("gram"),
    )
    n_docs_with_grams = grams.select("doc_id").distinct().count()
    hit = (
        grams.join(grams.select(F.col("gram").alias("g")).distinct(),
                   F.col("gram") == F.col("g"))
        .select("doc_id")
        .distinct()
        .count()
    )
    assert hit == n_docs_with_grams


def test_bigram_lm_scores_bounded_by_vocab_entropy(spark, sf_dir):
    out = tp.quality_bigram_lm(spark, sf_dir).collect()
    assert out
    for r in out:
        # -ln p is nonnegative and a conditional MLE cannot exceed the
        # log of the prefix-count ceiling (every bigram occurs >= once)
        assert 0 <= r["min_nlp"] <= r["mean_nlp"] <= r["max_nlp"]


def test_bigram_lm_repetition_scores_low(spark, sf_dir):
    # a deterministic template source should average LOWER conditional
    # surprise than the corpus-wide max: repetition is predictable
    rows = {r["source"]: r for r in tp.quality_bigram_lm(spark, sf_dir).collect()}
    means = [r["mean_nlp"] for r in rows.values()]
    assert min(means) < max(means)  # sources genuinely separate


def test_embedding_centroids_norm_bounds(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.extensions import embedding_centroids
    from postgres_opensearch_cdc_spark.registry import load_table

    out = embedding_centroids(spark, sf_dir).collect()
    n_labels = (
        load_table(spark, sf_dir, "embeddings").select("label").distinct().count()
    )
    assert len(out) == n_labels
    for r in out:
        # Jensen: ||mean vector|| <= mean ||vector||
        assert 0 < r["centroid_norm"] <= r["mean_vec_norm"] + 1e-9
