"""Hybrid-search fusion tests: python reference models of RRF and
min-max fusion recomputed from the two legs' collected results must
match the entries row for row; plus the published-semantics edge
cases (missing-leg contribution, degenerate normalization)."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.queries.hybrid import (
    FUSED_K,
    RRF_K,
    W_LEX,
    W_VEC,
    _legs,
    search_hybrid_minmax,
    search_hybrid_rrf,
)


@pytest.fixture(scope="module")
def legs(spark, sf_dir):
    lexr, vecr = _legs(spark, sf_dir)
    lex = {r["doc_id"]: (r["s_lex"], r["r_lex"]) for r in lexr.collect()}
    vec = {r["doc_id"]: (r["s_vec"], r["r_vec"]) for r in vecr.collect()}
    return lex, vec


def test_leg_ranks_are_dense_and_score_ordered(legs):
    for leg in legs:
        ranks = sorted(r for _, r in leg.values())
        assert ranks == list(range(1, len(leg) + 1))
        by_rank = sorted(leg.values(), key=lambda t: t[1])
        scores = [s for s, _ in by_rank]
        assert scores == sorted(scores, reverse=True)


def test_rrf_matches_reference_fusion(spark, sf_dir, legs):
    lex, vec = legs
    want = {}
    for d in set(lex) | set(vec):
        s = 0.0
        if d in lex:
            s += 1.0 / (RRF_K + lex[d][1])
        if d in vec:
            s += 1.0 / (RRF_K + vec[d][1])
        want[d] = round(s, 6)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:FUSED_K]
    got = [
        (r["doc_id"], r["rrf_score"])
        for r in search_hybrid_rrf(spark, sf_dir).collect()
    ]
    assert got == top


def test_rrf_missing_leg_contributes_zero(legs):
    lex, vec = legs
    only_vec = set(vec) - set(lex)
    # the fixture corpus guarantees the legs differ; if not, the
    # missing-leg branch would be vacuous — make that loud
    assert only_vec, "legs fully overlap: missing-leg case untested"


def test_minmax_matches_reference_fusion(spark, sf_dir, legs):
    lex, vec = legs

    def norm(leg):
        scores = [s for s, _ in leg.values()]
        lo, hi = min(scores), max(scores)
        if hi == lo:
            return {d: 1.0 for d in leg}
        return {d: (s - lo) / (hi - lo) for d, (s, _) in leg.items()}

    nl, nv = norm(lex), norm(vec)
    want = {}
    for d in set(nl) | set(nv):
        want[d] = round(
            W_LEX * nl.get(d, 0.0) + W_VEC * nv.get(d, 0.0), 6
        )
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:FUSED_K]
    got = [
        (r["doc_id"], r["hybrid_score"])
        for r in search_hybrid_minmax(spark, sf_dir).collect()
    ]
    assert got == top


def test_minmax_top_doc_of_each_leg_normalizes_to_one(legs):
    for leg in legs:
        by_rank = sorted(leg.values(), key=lambda t: t[1])
        scores = [s for s, _ in by_rank]
        assert scores[0] == max(scores)
        # rank-1 doc gets norm 1.0 unless the leg is degenerate
        if scores[0] != scores[-1]:
            assert (scores[0] - min(scores)) / (max(scores) - min(scores)) == 1.0


def test_eval_metrics_match_reference(spark, sf_dir, legs):
    """Recompute precision/recall/MRR/nDCG@10 in python from the
    collected legs + relevance labels; the entry must match row for
    row (including the RRF ranking's fused order)."""
    import math

    from pyspark.sql import functions as F

    from postgres_opensearch_cdc_spark.queries.hybrid import (
        EVAL_K,
        HYBRID_QVEC_ID,
        search_eval_metrics,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    lex, vec = legs
    vecs = {
        r["vec_id"]: r["label"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "label").collect()
    }
    qlab = vecs[HYBRID_QVEC_ID]
    rel = {d for d, l in vecs.items() if l == qlab}

    # rebuild the three rankings
    def topk(leg):
        return [d for d, (_, r) in sorted(leg.items(), key=lambda kv: kv[1][1])][:EVAL_K]

    rrf_scores = {}
    for d in set(lex) | set(vec):
        s = 0.0
        if d in lex:
            s += 1.0 / (60 + lex[d][1])
        if d in vec:
            s += 1.0 / (60 + vec[d][1])
        rrf_scores[d] = round(s, 6)
    rrf_rank = [d for d, _ in sorted(rrf_scores.items(), key=lambda kv: (-kv[1], kv[0]))][:EVAL_K]

    idcg = sum(
        1.0 / (math.log(i + 1.0) / math.log(2.0))
        for i in range(1, min(EVAL_K, len(rel)) + 1)
    )

    def metrics(ranking):
        hits = [1 if d in rel else 0 for d in ranking]
        prec = round(sum(hits) / float(EVAL_K), 6)
        recall = round(sum(hits) / len(rel), 6)
        mrr = 0.0
        for i, h in enumerate(hits, 1):
            if h:
                mrr = round(1.0 / i, 6)
                break
        dcg = sum(
            h / (math.log(i + 1.0) / math.log(2.0))
            for i, h in enumerate(hits, 1)
        )
        return prec, recall, mrr, round(round(dcg, 6) / round(idcg, 6), 6)

    want = {
        "lex": metrics(topk(lex)),
        "vec": metrics(topk(vec)),
        "rrf": metrics(rrf_rank),
    }
    got = {
        r["ranking"]: (
            r[f"precision_at_{EVAL_K}"],
            r[f"recall_at_{EVAL_K}"],
            r["mrr"],
            r[f"ndcg_at_{EVAL_K}"],
        )
        for r in search_eval_metrics(spark, sf_dir).collect()
    }
    for name in ("lex", "vec", "rrf"):
        for g, w in zip(got[name], want[name]):
            assert g == pytest.approx(w, abs=2e-6), (name, got[name], want[name])


def test_eval_metrics_structural_sanity(spark, sf_dir):
    """Bounds + the self-retrieval invariant: the query vector is its
    own nearest neighbor and shares its own label, so the vector
    leg's first hit is rank 1 (MRR exactly 1.0). The synthetic
    corpus' labels are otherwise label-random w.r.t. the embedding
    geometry, so no cross-leg quality ordering is assumed here — the
    value checks live in the reference-model test above and the
    DuckDB oracle."""
    from postgres_opensearch_cdc_spark.queries.hybrid import (
        search_eval_metrics,
    )

    rows = {r["ranking"]: r for r in search_eval_metrics(spark, sf_dir).collect()}
    assert set(rows) == {"lex", "vec", "rrf"}
    for r in rows.values():
        for m in ("precision_at_10", "recall_at_10", "mrr", "ndcg_at_10"):
            assert 0.0 <= r[m] <= 1.0, (r["ranking"], m, r[m])
    assert rows["vec"]["mrr"] == 1.0


def test_rbo_matches_direct_definition(spark, sf_dir, legs):
    """Recompute truncated RBO straight from the definition
    (prefix-overlap sum over depths) and compare with the entry's
    per-doc tail-weight reformulation."""
    from postgres_opensearch_cdc_spark.queries.hybrid import (
        LEG_K,
        RBO_P,
        search_rank_rbo,
    )

    lex, vec = legs
    a = [d for d, (_, r) in sorted(lex.items(), key=lambda kv: kv[1][1])]
    b = [d for d, (_, r) in sorted(vec.items(), key=lambda kv: kv[1][1])]
    s = 0.0
    for d in range(1, LEG_K + 1):
        x = len(set(a[:d]) & set(b[:d]))
        s += (RBO_P ** d) * x / d
    want = round((1.0 - RBO_P) / RBO_P * s, 6)
    row = search_rank_rbo(spark, sf_dir).head()
    assert row["rbo_trunc"] == pytest.approx(want, abs=2e-6)
    assert row["overlap_at_10"] == len(set(a[:10]) & set(b[:10]))


def test_rbo_identical_rankings_approach_truncated_max():
    """RBO of a ranking with itself equals the truncated maximum
    (1-p)/p * sum p^d — sanity for the tail-weight table."""
    from postgres_opensearch_cdc_spark.queries.hybrid import (
        LEG_K,
        RBO_P,
        _rbo_tail_weights,
    )

    # every doc enters at m = its own rank
    s = sum(t for _, t in _rbo_tail_weights())
    direct = sum((RBO_P ** d) for d in range(1, LEG_K + 1))
    assert (1 - RBO_P) / RBO_P * s == pytest.approx(
        (1 - RBO_P) / RBO_P * direct, rel=1e-12
    )
