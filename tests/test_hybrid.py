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
