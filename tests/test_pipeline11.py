"""Batch-11 pipeline tests: distributed Gram / PCA power iteration,
n-gram novelty, co-occurrence PMI (round 14)."""

from __future__ import annotations

import itertools
import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline11 import (
    BOILER_DF,
    EMB_DIM,
    NOVELTY_N,
    PMI_MIN_PAIRS,
    PMI_TOP_K,
    _power_iterate,
    cooc_pmi_topk,
    embedding_gram_matrix,
    embedding_pca_power,
    gram_upper,
    text_novelty_ngram,
)


def _embedding_matrix(spark, sf_dir) -> np.ndarray:
    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r["vec_id"])
    return np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in rows]
    )


def test_gram_matches_numpy(spark, sf_dir):
    """The Arrow-partial Gram must equal the dense numpy X^T X to
    well under the 6-dp output rounding."""
    x = _embedding_matrix(spark, sf_dir)
    ref = x.T @ x
    rows = embedding_gram_matrix(spark, sf_dir).collect()
    assert len(rows) == EMB_DIM * (EMB_DIM + 1) // 2
    for r in rows:
        assert r["i"] <= r["j"]
        assert abs(r["gram"] - ref[r["i"], r["j"]]) < 5e-6


def test_gram_invariant_to_partitioning(spark, sf_dir):
    """Per-partition partials must merge to the same matrix whatever
    the input partitioning — including partitions with zero rows
    (more partitions than vectors)."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = {
        (r["i"], r["j"]): r["gram_raw"]
        for r in gram_upper(emb).collect()
    }
    wide = {
        (r["i"], r["j"]): r["gram_raw"]
        for r in gram_upper(emb.repartition(997)).collect()
    }
    assert set(base) == set(wide)
    for k in base:
        assert abs(base[k] - wide[k]) < 1e-9


def test_pca_power_matches_numpy_reference(spark, sf_dir):
    """3-iteration power estimate must match a direct numpy unroll
    over the SAME rounded Gram, and the loading must be unit-norm
    with a positive eigenvalue estimate."""
    rows = embedding_gram_matrix(spark, sf_dir).collect()
    g = np.zeros((EMB_DIM, EMB_DIM))
    for r in rows:
        g[r["i"], r["j"]] = r["gram"]
        g[r["j"], r["i"]] = r["gram"]
    ref_loading, ref_eig = _power_iterate(g)

    out = embedding_pca_power(spark, sf_dir).collect()
    assert len(out) == EMB_DIM
    loading = np.array([r["loading"] for r in sorted(out, key=lambda r: r["i"])])
    assert abs(np.linalg.norm(loading) - 1.0) < 1e-4
    assert out[0]["eigval_est"] > 0
    assert abs(out[0]["eigval_est"] - ref_eig) < 5e-6
    assert np.max(np.abs(loading - ref_loading)) < 5e-6


def test_power_iterate_rejects_zero_matrix():
    with pytest.raises(ValueError, match="zero vector"):
        _power_iterate(np.zeros((4, 4)))


def _doc_shingles(text: str, n: int) -> set[str]:
    toks = re.split(r"\s+", text.lower())
    k = max(len(toks) - n, 0)
    return {" ".join(toks[i : i + n]) for i in range(k + 1)}


def test_novelty_matches_brute_force(spark, sf_dir):
    docs = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    shingle_sets = {d: _doc_shingles(t, NOVELTY_N) for d, t in docs.items()}
    df = {}
    for s in shingle_sets.values():
        for g in s:
            df[g] = df.get(g, 0) + 1

    rows = text_novelty_ngram(spark, sf_dir).collect()
    assert len(rows) == len(docs)
    for r in rows:
        s = shingle_sets[r["doc_id"]]
        n_novel = sum(1 for g in s if df[g] == 1)
        n_boiler = sum(1 for g in s if df[g] >= BOILER_DF)
        assert r["n_grams"] == len(s)
        assert r["n_novel"] == n_novel
        assert r["n_boiler"] == n_boiler
        assert abs(r["novelty"] - n_novel / len(s)) < 1e-6


def test_pmi_matches_brute_force(spark, sf_dir):
    docs = [
        set(w for w in re.split(r"\s+", r["text"].lower()) if w)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("text")
        .collect()
    ]
    n = len(docs)
    dfw: dict[str, int] = {}
    c_ab: dict[tuple[str, str], int] = {}
    for ws in docs:
        for w in ws:
            dfw[w] = dfw.get(w, 0) + 1
        for a, b in itertools.combinations(sorted(ws), 2):
            c_ab[(a, b)] = c_ab.get((a, b), 0) + 1

    expected = sorted(
        (
            (
                round(math.log(c * n / (dfw[a] * dfw[b])), 6),
                a,
                b,
                c,
            )
            for (a, b), c in c_ab.items()
            if c >= PMI_MIN_PAIRS
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:PMI_TOP_K]

    rows = cooc_pmi_topk(spark, sf_dir).collect()
    assert len(rows) == len(expected)
    for r, (pmi, a, b, c) in zip(rows, expected):
        assert (r["wa"], r["wb"]) == (a, b)
        assert r["c_ab"] == c
        assert r["df_a"] == dfw[a] and r["df_b"] == dfw[b]
        assert abs(r["pmi"] - pmi) < 2e-6


def test_pmi_plan_has_no_cartesian_and_broadcasts_n(spark, sf_dir):
    """N must ride as a broadcast (BroadcastNestedLoopJoin over one
    row is fine; a CartesianProduct is not)."""
    plan = cooc_pmi_topk(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Broadcast" in plan
