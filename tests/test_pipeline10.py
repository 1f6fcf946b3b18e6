"""Batch-10 pipeline tests: production-size HLL entry, edit-distance
verification, exact containment join (round 14)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline10 import (
    CONT_N,
    CONT_T,
    HLL_P_PROD,
    dedup_containment_join,
    dedup_edit_distance,
    sketch_hll_production,
)


def test_hll_production_runs_at_p14_linear_branch(spark, sf_dir):
    """Fixture vocabularies sit far under 2.5m = 40,960 at p=14, so
    every group must take the linear-counting branch (documented as
    the only reachable branch at fixture cardinality) — and at that
    load factor the estimate is near-exact."""
    rows = sketch_hll_production(spark, sf_dir).collect()
    assert rows
    m, _, _, _ = __import__(
        "postgres_opensearch_cdc_spark.functions.sketch",
        fromlist=["hll_params"],
    ).hll_params(HLL_P_PROD)
    assert m == 16384
    for r in rows:
        assert r["used_linear_counting"] is True
        assert r["sum_num"] <= 1 << 61
        assert r["n_exact"] < 2.5 * m
        # linear counting at load factor < 1/16 is near-exact
        assert abs(r["hll_est"] - r["n_exact"]) / r["n_exact"] < 0.02


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_edit_distance_matches_python_reference(spark, sf_dir):
    """Spark's levenshtein must agree with the textbook DP on every
    memoized LSH pair (and char_sim with the normalized form)."""
    texts = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    }
    rows = dedup_edit_distance(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = _lev(texts[r["id_a"]], texts[r["id_b"]])
        assert r["lev"] == want
        maxlen = max(len(texts[r["id_a"]]), len(texts[r["id_b"]]))
        assert abs(r["char_sim"] - round(1.0 - want / maxlen, 6)) < 1e-9


def test_containment_join_equals_brute_force(spark, sf_dir):
    """Completeness + exactness: the asymmetric prefix filter returns
    exactly the ordered pairs brute force finds at CONT_T over the
    same shingle substrate."""
    from postgres_opensearch_cdc_spark.functions.dedup import word_shingles
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, "text", "doc_id", n=CONT_N)
    sets: dict = {}
    for r in sh.collect():
        sets.setdefault(r["id"], set()).add(r["shingle"])
    want = {}
    for ia, ib in itertools.permutations(sorted(sets), 2):
        inter = len(sets[ia] & sets[ib])
        if inter / len(sets[ia]) >= CONT_T:
            want[(ia, ib)] = (inter, len(sets[ia]))
    got = {
        (r["inner_id"], r["outer_id"]): (r["n_inter"], r["n_inner"])
        for r in dedup_containment_join(spark, sf_dir).collect()
    }
    assert got == want
    assert want, "corpus has no containment pairs: completeness untested"


def test_containment_detects_planted_subset(spark, tmp_path):
    """A document whose text is a strict prefix-chunk of another must
    surface as (inner=chunk, outer=full) with containment 1.0 — and
    NOT in the reverse orientation when the full doc is much larger."""
    base = " ".join(f"w{i}" for i in range(40))
    chunk = " ".join(f"w{i}" for i in range(12))
    other = " ".join(f"z{i}" for i in range(40))
    d = str(tmp_path / "sub")
    spark.createDataFrame(
        [(1, base, "en", "s", len(base)),
         (2, chunk, "en", "s", len(chunk)),
         (3, other, "en", "s", len(other))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{d}/documents.parquet")
    got = {
        (r["inner_id"], r["outer_id"]): r["containment"]
        for r in dedup_containment_join(spark, d).collect()
    }
    assert got == {(2, 1): 1.0}
