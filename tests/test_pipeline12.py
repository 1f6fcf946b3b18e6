"""Batch-12 pipeline tests: streaming Gram entry, MI feature
selection, LSH recall audit (round 14). The GramRollupSink contract
itself is pinned in tests/test_gram_stream.py."""

from __future__ import annotations

import math
import re

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline12 import (
    MI_LABEL_LANG,
    MI_TOP_K,
    dedup_lsh_recall_audit,
    feature_mi_label,
)


def _corpus(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "lang", "text")
        .collect()
    )


def test_mi_matches_brute_force(spark, sf_dir):
    rows = _corpus(spark, sf_dir)
    n = len(rows)
    n_label = sum(1 for r in rows if r["lang"] == MI_LABEL_LANG)
    cells: dict[str, list[int]] = {}
    for r in rows:
        y = 1 if r["lang"] == MI_LABEL_LANG else 0
        for w in set(x for x in re.split(r"\s+", r["text"].lower()) if x):
            c = cells.setdefault(w, [0, 0])  # [n1_, n11]
            c[0] += 1
            c[1] += y

    def mi(n1_, n11):
        n10 = n1_ - n11
        n01 = n_label - n11
        n00 = n - n_label - n10
        total = 0.0
        for nxy, nx, ny in (
            (n11, n1_, n_label),
            (n10, n1_, n - n_label),
            (n01, n - n1_, n_label),
            (n00, n - n1_, n - n_label),
        ):
            if nxy > 0:
                total += (nxy / n) * math.log(nxy * n / (nx * ny))
        return total

    expected = sorted(
        ((round(mi(c[0], c[1]), 6), w, c) for w, c in cells.items()),
        key=lambda t: (-t[0], t[1]),
    )[:MI_TOP_K]

    got = feature_mi_label(spark, sf_dir).collect()
    assert len(got) == len(expected)
    for r, (m, w, c) in zip(got, expected):
        assert r["w"] == w
        assert r["n11"] == c[1]
        assert r["n10"] == c[0] - c[1]
        assert r["n01"] == n_label - c[1]
        assert r["n00"] == n - n_label - (c[0] - c[1])
        assert abs(r["mi"] - m) < 2e-6


def test_mi_is_nonnegative_and_cells_sum_to_corpus(spark, sf_dir):
    n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    for r in feature_mi_label(spark, sf_dir).collect():
        assert r["mi"] >= -1e-9  # MI is nonnegative up to rounding
        assert r["n11"] + r["n10"] + r["n01"] + r["n00"] == n


def test_recall_audit_consistency(spark, sf_dir):
    """The audit's counts must be internally consistent and agree
    with the entries it audits: hit + missed = truth, recall =
    hit/truth, and the LSH pair set is a subset of truth (precision
    1 by construction)."""
    from postgres_opensearch_cdc_spark.queries.extensions import (
        dedup_minhash_lsh,
        dedup_ngram_jaccard,
    )

    row = dedup_lsh_recall_audit(spark, sf_dir).head()
    truth = {
        (r["id_a"], r["id_b"])
        for r in dedup_ngram_jaccard(spark, sf_dir).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in dedup_minhash_lsh(spark, sf_dir).collect()
    }
    assert lsh <= truth
    assert row["n_truth"] == len(truth)
    assert row["n_hit"] == len(lsh & truth)
    assert row["n_missed"] == len(truth - lsh)
    assert row["n_hit"] + row["n_missed"] == row["n_truth"]
    assert abs(row["recall"] - len(lsh) / len(truth)) < 1e-6
    if row["n_missed"] == 0:
        assert row["avg_missed_jaccard"] == -1.0
    else:
        assert 0.4 <= row["avg_missed_jaccard"] <= 1.0
