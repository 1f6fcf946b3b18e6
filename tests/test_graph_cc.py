"""Connected-components (functions/graph.py) and cluster-dedup entries."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.graph import (
    connected_components,
    connected_components_two_phase,
)
from postgres_opensearch_cdc_spark.queries.graph_dedup import (
    dedup_cc_clusters,
    dedup_cc_survivors,
)


def _cc(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components(edges).collect()
    return {r["node"]: r["comp"] for r in rows}


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_chain_needs_multiple_rounds(spark):
    # a 6-node path: label 1 must propagate 5 hops (diameter > 1)
    got = _cc(spark, [(i, i + 1) for i in range(1, 6)])
    assert set(got.values()) == {1} and len(got) == 6


def test_direction_irrelevant(spark):
    # edges given high->low and low->high mix; labels still go to min
    got = _cc(spark, [(5, 4), (3, 4), (3, 2), (1, 2)])
    assert set(got.values()) == {1}


def test_self_loop_and_duplicate_edges(spark):
    got = _cc(spark, [(7, 7), (8, 9), (9, 8), (8, 9)])
    assert got == {7: 7, 8: 8, 9: 8}


def test_unconverged_raises(spark):
    edges = spark.createDataFrame([(i, i + 1) for i in range(1, 8)], "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=2)


def _cc2(spark, pairs):
    edges = spark.createDataFrame(pairs, "src long, dst long")
    rows = connected_components_two_phase(edges).collect()
    return {r["node"]: r["comp"] for r in rows}


def test_two_phase_matches_min_label_on_clique_unions(spark):
    """Equivalence on the near-dup shape (unions of small cliques
    plus bridges): both variants must produce the identical
    (node, min-member) labeling."""
    pairs = (
        # two 4-cliques
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(20, 24) for b in range(a + 1, 24)]
        # a bridge merging a third clique into the first
        + [(4, 40), (40, 41), (41, 40)]
        # an isolated pair and a self loop
        + [(100, 101), (200, 200)]
    )
    assert _cc2(spark, pairs) == _cc(spark, pairs)


def test_two_phase_handles_long_chain_in_logarithmic_rounds(spark):
    """The escape-hatch property (round-12 verdict ask): on a 32-node
    path the min label needs 31 propagation rounds (min-label with
    max_iter=10 must fail), while large-star/small-star contracts
    the chain in O(log² n) — well within the same 10-round budget."""
    chain = [(i, i + 1) for i in range(1, 32)]
    edges = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="converge"):
        connected_components(edges, max_iter=10)
    got = {
        r["node"]: r["comp"]
        for r in connected_components_two_phase(
            edges, max_iter=10
        ).collect()
    }
    assert len(got) == 32 and set(got.values()) == {1}


def test_two_phase_direction_and_duplicates_irrelevant(spark):
    pairs = [(5, 4), (4, 5), (3, 4), (3, 2), (1, 2), (1, 2)]
    got = _cc2(spark, pairs)
    assert set(got.values()) == {1} and len(got) == 5


def test_clusters_cover_all_docs_once(spark, sf_dir):
    cl = dedup_cc_clusters(spark, sf_dir)
    docs = cl.count()
    assert cl.select("doc_id").distinct().count() == docs
    # cluster ids are themselves member doc_ids (canonical = min member)
    ids = {r["doc_id"] for r in cl.collect()}
    assert all(r["cluster_id"] in ids for r in cl.collect())
    assert cl.filter(F.col("cluster_id") > F.col("doc_id")).count() == 0


def test_survivors_bounded_by_docs(spark, sf_dir):
    sv = dedup_cc_survivors(spark, sf_dir).collect()
    assert len(sv) > 0
    for r in sv:
        assert 0 < r["n_kept"] <= r["n_docs"]


def test_cluster_cache_keyed_on_application_id(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries import graph_dedup

    graph_dedup._CLUSTER_CACHE.clear()
    first = graph_dedup._doc_clusters(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    assert key in graph_dedup._CLUSTER_CACHE
    # second call is a cache hit: same DataFrame object, no recompute
    assert graph_dedup._doc_clusters(spark, sf_dir) is first
    # a different sf_dir misses (never serves another dataset's clusters)
    other = (spark.sparkContext.applicationId, sf_dir + "/other")
    assert other not in graph_dedup._CLUSTER_CACHE
