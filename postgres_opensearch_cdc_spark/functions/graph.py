"""Distributed connected components via iterative min-label propagation.

The missing piece between pairwise near-duplicate detection (LSH /
Jaccard pairs in functions/dedup.py) and actual deduplication: duplicate
PAIRS must be grouped into CLUSTERS (the transitive closure — if A~B and
B~C, then {A,B,C} is one duplicate group) before a canonical member can
be kept. The reference has no analogue (it stops at keyed upserts);
this is the standard big-data CC formulation.

Algorithm: every node starts labeled with itself; each round, every node
adopts the minimum label among itself and its neighbors; converged when
no label changes. Rounds needed = graph diameter, and near-duplicate
graphs are unions of small dense cliques (diameter 1-3), so 3-4 rounds
in practice. Each round is one equi-join edges⋈labels + one min-
aggregation — all shuffles on node id, AQE-coalesced. Lineage is cut
every round with localCheckpoint (an iterative plan would otherwise grow
exponentially and overwhelm the driver/optimizer at scale).

At 1000-executor / 100 TB scale the same loop holds (each round is a
shuffle linear in |E|); for graphs with long chains or giant components
the round count — not per-round cost — becomes the bottleneck, and the
two-phase large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) converges in O(log² n)
rounds with the same join/agg primitives. Duplicate clusters never form
such chains, so the simple propagation is the right default here —
``connected_components_two_phase`` (below, same signature/contract) is
the escape hatch for long-diameter graphs, pinned by the chain-graph
test where min-label needs O(diameter) rounds and the two-phase variant
converges in a handful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (node, component) for every node appearing in ``edges``,
    where component = min node id in the node's connected component.

    Raises RuntimeError if not converged within ``max_iter`` rounds
    (a correctness guard: an unconverged labeling silently under-merges
    clusters)."""
    # symmetrize once; both directions hash-partition on the join key
    fwd = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = fwd.union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
    sym = sym.distinct().localCheckpoint(eager=True)

    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        # min neighbor label per node, one join + one agg
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["node2"], "left")
            .select(
                "node",
                F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias(
                    "comp"
                ),
                F.col("comp").alias("old_comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("comp") != F.col("old_comp")).count()
        labels = new_labels.drop("old_comp")
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


# ---------------------------------------------------------------------------
# Two-phase large-star / small-star (Kiveris et al., SoCC'14)
# ---------------------------------------------------------------------------


def _large_star(e: DataFrame) -> DataFrame:
    """One large-star round over a distinct self-loop-free edge set
    (u, v): every node u attaches each STRICTLY LARGER neighbor v to
    m = min({u} ∪ Γ(u)). Emitted edges always point downward
    (v > u ≥ m), so no self-loops can appear. One symmetrize + one
    min-agg + one join, all keyed on node id — |E|-linear per round."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mv"))
        .select("u", F.least("u", "mv").alias("m"))
    )
    return (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """One small-star round: orient every edge (larger, smaller); each
    node u re-attaches its smaller neighbors AND itself to
    m = min(Γ_small(u) ∪ {u}). Self-loops (v == m) are dropped; the
    (u, m) pointer keeps u connected to its component."""
    oriented = (
        e.filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    attached = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    selfptr = mins.select("u", F.col("m").alias("v"))
    return attached.union(selfptr).distinct()


def connected_components_two_phase(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) with component = min node id — the SAME
    output contract as connected_components, via the alternating
    large-star/small-star algorithm (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14). Converges in
    O(log² n) rounds regardless of graph diameter, vs O(diameter)
    for min-label propagation — the right variant when the pair
    graph can contain long chains or giant components (at 100 TB a
    web-crawl link graph does; near-dup clique unions don't).

    Each round is two (min-agg + join) passes keyed on node id; the
    fixpoint is a set of stars (every non-root points directly at
    its component's minimum), detected by edge-set stability (the
    sets are distinct, so count equality + empty difference is set
    equality). Lineage is cut per round with localCheckpoint."""
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select(F.col("v").alias("node")))
        .unionByName(
            edges.select(F.col(src).alias("node"))  # self-loop-only nodes
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_prev = e.count()
    for _ in range(max_iter):
        e_new = _small_star(_large_star(e)).localCheckpoint(eager=True)
        n_new = e_new.count()
        if n_new == n_prev and e_new.exceptAll(e).isEmpty():
            stars = e_new
            labels = stars.select(
                F.col("u").alias("node"), F.col("v").alias("comp")
            )
            return (
                nodes.join(labels, "node", "left")
                .select(
                    "node",
                    F.coalesce("comp", F.col("node")).alias("comp"),
                )
            )
        e, n_prev = e_new, n_new
    raise RuntimeError(
        f"connected_components_two_phase did not converge in {max_iter} rounds"
    )
