"""Dedup operators with planted duplicates/near-duplicates — semantic
verification for the hash-based operators whose signatures the DuckDB
oracle can't reproduce (minhash/simhash), plus the exact/jaccard ones."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.functions.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash64,
    simhash_hamming_pairs,
    word_shingles,
)

BASE = (
    "spark streaming engine maintains a keyed mirror of postgres tables "
    "and answers analytics queries over the mirror with filters and aggregates"
)
NEAR = BASE.replace("analytics", "analytic")  # one-token edit
FAR = "completely different text about cooking pasta with tomatoes and basil leaves in a copper pot"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE),
        (2, BASE),  # exact dup of 1
        (3, NEAR),  # near dup of 1
        (4, FAR),
        (5, "  " + BASE.upper() + "  "),  # whitespace/case variant of 1
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups_normalized_variants(docs):
    out = {r["keep_id"]: r["dupe_count"] for r in exact_dedup(docs).collect()}
    # 1,2,5 share a normalized fingerprint; 3 and 4 are singletons
    assert out[1] == 3
    assert out[3] == 1
    assert out[4] == 1


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and pairs[(1, 3)] > 0.5
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_recovers_planted_pairs(docs):
    sh = word_shingles(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures(sh, num_hashes=32)
    cands = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(sigs).collect()}
    assert (1, 2) in cands  # identical → all bands agree
    assert (1, 3) in cands  # near-dup → high band-collision probability
    assert (1, 4) not in cands and (2, 4) not in cands and (3, 4) not in cands


def test_simhash_distance_orders_similarity(docs):
    sketches = simhash64(docs)
    pairs = simhash_hamming_pairs(sketches, max_distance=64, bands=4)
    d = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs.collect()}
    assert d[(1, 2)] == 0  # identical text → identical sketch
    assert d[(1, 3)] < d.get((1, 4), 64)  # near-dup closer than unrelated


def test_lsh_pruned_jaccard_equals_allpairs_on_candidates(docs):
    """The 100 TB path (LSH candidates → exact verify) must agree with
    all-pairs verification on everything LSH surfaces."""
    sh = word_shingles(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures(sh, num_hashes=32)
    cands = minhash_lsh_candidates(sigs)
    pruned = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5, candidates=cands).collect()
    }
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    for pair, j in pruned.items():
        assert full[pair] == j
