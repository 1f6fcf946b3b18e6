"""Batch-8 tests: triangle counting against hand-checkable graphs,
and the prefix filter's COMPLETENESS — the exact-similarity-join
guarantee that separates it from LSH: no qualifying pair is ever
lost, pinned against brute force on both random sets (pure python
bound proof) and the real corpus (vs the all-pairs entry)."""

from __future__ import annotations

import itertools
import math
import random

import pytest
from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline8 import (
    PF_N,
    PF_TAU,
    dedup_prefix_filter_join,
    triangle_counts,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Triangles
# ---------------------------------------------------------------------------


def _tri(spark, edges):
    e = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "src string, dst string"
    ).distinct()
    return {
        r["w"]: r["triangles"] for r in triangle_counts(e).collect()
    }


def test_k4_every_node_in_three_triangles(spark):
    k4 = list(itertools.combinations("abcd", 2))
    got = _tri(spark, k4)
    assert got == {c: 3 for c in "abcd"}


def test_path_graph_has_no_triangles(spark):
    got = _tri(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {}


def test_two_triangles_sharing_an_edge(spark):
    # a-b-c and b-c-d: b,c in 2 triangles; a,d in 1
    edges = [("a", "b"), ("a", "c"), ("b", "c"), ("b", "d"), ("c", "d")]
    got = _tri(spark, edges)
    assert got == {"a": 1, "b": 2, "c": 2, "d": 1}


def test_triangle_total_matches_reference_on_random_graph(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(25)]
    edges = {
        (min(a, b), max(a, b))
        for a, b in (
            (rng.choice(nodes), rng.choice(nodes)) for _ in range(150)
        )
        if a != b
    }
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    want = {}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for v in (a, b, c):
                want[v] = want.get(v, 0) + 1
    assert _tri(spark, sorted(edges)) == want


# ---------------------------------------------------------------------------
# Prefix filter
# ---------------------------------------------------------------------------


def test_prefix_bound_is_sound_on_random_sets():
    """The filter's theorem, brute-forced: if two sets' prefixes
    (under any common total order) are disjoint, their Jaccard is
    strictly below tau — so prefix-join candidates are a superset of
    the true result."""
    rng = random.Random(3)
    universe = list(range(120))
    for _ in range(300):
        a = set(rng.sample(universe, rng.randint(4, 40)))
        b = set(rng.sample(universe, rng.randint(4, 40)))
        order = {t: i for i, t in enumerate(universe)}
        pa = sorted(a, key=order.get)[: len(a) - math.ceil(PF_TAU * len(a)) + 1]
        pb = sorted(b, key=order.get)[: len(b) - math.ceil(PF_TAU * len(b)) + 1]
        j = len(a & b) / len(a | b)
        if not (set(pa) & set(pb)):
            assert j < PF_TAU, (sorted(a), sorted(b), j)


def test_prefix_join_equals_brute_force_on_corpus(spark, sf_dir):
    """Completeness + exactness on the real corpus: the prefix-
    filtered join returns exactly the pairs the all-pairs brute force
    finds at the same threshold over the same shingle substrate."""
    from postgres_opensearch_cdc_spark.functions.dedup import word_shingles
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    sh = word_shingles(docs, "text", "doc_id", n=PF_N)
    sets = {}
    for r in sh.collect():
        sets.setdefault(r["id"], set()).add(r["shingle"])
    want = {}
    for ia, ib in itertools.combinations(sorted(sets), 2):
        inter = len(sets[ia] & sets[ib])
        union = len(sets[ia] | sets[ib])
        if round(inter / union, 6) >= PF_TAU:
            want[(ia, ib)] = (inter, union)
    # all three suffix modes must return the identical exact result:
    # the depth-1 suffix bound is result-neutral (OFF by default
    # since r14 — the array-intersect verify dominates it, SCALE §25)
    for mode in ("off", "on", "auto"):
        got = {
            (r["ia"], r["ib"]): (r["n_inter"], r["n_union"])
            for r in dedup_prefix_filter_join(
                spark, sf_dir, suffix_mode=mode
            ).collect()
        }
        assert got == want, f"suffix_mode={mode} diverged"
    assert want, "corpus has no qualifying pairs: completeness untested"


def test_prefix_substrate_memoized_and_pinned(spark, sf_dir):
    """The (pos, arrs) substrate is memoized per (app, sf_dir, n) and
    eagerly checkpointed: a second call is the SAME pinned frames (the
    containment join shares the build by design, r15), and the pinned
    plans scan the materialized RDD instead of rebuilding the rank."""
    from postgres_opensearch_cdc_spark.queries.training_pipeline8 import (
        prefix_substrate,
    )

    pos1, arrs1 = prefix_substrate(spark, sf_dir, PF_N)
    pos2, arrs2 = prefix_substrate(spark, sf_dir, PF_N)
    assert pos1 is pos2 and arrs1 is arrs2
    for df in (pos1, arrs1):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan  # pinned, not a rebuild


def test_prefix_join_modes_agree_on_hot_shingle_corpus(spark, tmp_path):
    """The adversarial two-dialect corpus (tools/bench_hot_shingle) is
    where the suffix bound actually prunes — positional candidates go
    quadratic in the shared block-phrase df while cross-dialect pairs
    stay far below tau. Pin that the bound stays result-neutral there
    (it must only ever remove pairs the exact verify would reject)."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "bench_hot_shingle",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools", "bench_hot_shingle.py"),
    )
    hs = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(hs)

    d = str(tmp_path / "hot")
    hs.make_corpus(spark, d, n_docs=240, block_k=48)

    from postgres_opensearch_cdc_spark.functions.dedup import word_shingles

    sh = word_shingles(
        spark.read.parquet(f"{d}/documents.parquet"), "text", "doc_id",
        n=PF_N,
    )
    sets: dict = {}
    for r in sh.collect():
        sets.setdefault(r["id"], set()).add(r["shingle"])
    want = set()
    for ia, ib in itertools.combinations(sorted(sets), 2):
        inter = len(sets[ia] & sets[ib])
        if inter / (len(sets[ia]) + len(sets[ib]) - inter) >= PF_TAU:
            want.add((ia, ib))
    assert want, "hot corpus planted twins went missing"
    for mode in ("off", "on"):
        got = {
            (r["ia"], r["ib"])
            for r in dedup_prefix_filter_join(
                spark, d, suffix_mode=mode
            ).collect()
        }
        assert got == want, f"suffix_mode={mode} diverged on hot corpus"
