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
Components in MapReduce and Beyond", SoCC'14) converges in O(log n)
rounds with the same join/agg primitives. Duplicate clusters never form
such chains, so the simple propagation is the right default here.
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
