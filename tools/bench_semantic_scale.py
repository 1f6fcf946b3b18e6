"""Semantic-dedup + sequence-packing scale curves (SCALE.md §22,
round 12): measure the two new training_pipeline4 families on a
synthetic corpus scaled 1x -> 10x to show the shapes hold.

1. k-means fit (distributed Lloyd, literal-centroid assignment):
   per-iteration cost must scale ~linearly in vectors — the driver
   exchange is K x dim regardless of corpus size, so wall time is the
   two scan-stage jobs (assign+posexplode+partial agg).
2. SemDeDup prune (within-cluster pairwise): cost scales with
   sum(cluster_size^2). With K fixed and the corpus 10x, clusters are
   10x and the pairwise term is 100x — the measurement DEMONSTRATES
   why production scales K with the corpus (SemDeDup's ~100k
   clusters): the K-scaled config keeps per-cluster size flat and the
   prune ~linear.
3. Greedy packing: applyInPandas over hash shards — linear in docs,
   shard count sets parallelism.

Prints one JSON line per measurement.

Run exclusively (no concurrent Spark sessions):
    python3 tools/bench_semantic_scale.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.functions.dedup import hash60  # noqa: E402
from postgres_opensearch_cdc_spark.functions.similarity import (  # noqa: E402
    _as_double,
    dot,
    l2_norm,
)
from postgres_opensearch_cdc_spark.queries import training_pipeline4 as tp4  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402

DIM = 64


def synth_vectors(spark, n: int, parts: int = 32):
    """Deterministic synthetic embeddings: dim values from md5-backed
    hash60 folded to [-1, 1] — same generator class the testdata uses,
    no rand()."""
    base = spark.range(0, n, 1, parts).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda d: (
                F.pmod(
                    hash60(
                        F.concat_ws(
                            ":", F.col("id").cast("string"), d.cast("string")
                        )
                    ),
                    F.lit(2000),
                ).cast("double")
                - 1000.0
            )
            / 1000.0,
        ).alias("v"),
    )
    return base


def fit(spark, vecs, k: int, iters: int):
    """The tp4 Lloyd loop over an arbitrary frame (same math, K and
    corpus parameterized)."""
    seeds = (
        vecs.orderBy(
            hash60(F.col("vec_id").cast("string"), salt=tp4.SEM_SALT), "vec_id"
        )
        .limit(k)
        .collect()
    )
    cents = [[round(float(x), 6) for x in r.v] for r in seeds]
    for _ in range(iters):
        cl, _d = tp4._assign_cols(F.col("v"), cents)
        rows = (
            vecs.select(cl, F.posexplode(F.col("v")).alias("dim", "val"))
            .groupBy("cluster", "dim")
            .agg(F.avg("val").alias("m"))
            .groupBy("cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("dim", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        new = {int(r.cluster): [round(float(x), 6) for x in r.c] for r in rows}
        cents = [new.get(i, cents[i]) for i in range(k)]
    return cents


def prune_count(spark, vecs, cents) -> tuple[int, float]:
    from pyspark.sql import Window

    cl, dsq = tp4._assign_cols(F.col("v"), cents)
    w = Window.partitionBy("cluster").orderBy("dsq", "vec_id")
    ranked = (
        vecs.select("vec_id", "v", cl, dsq)
        .withColumn("rnk", F.row_number().over(w))
        .withColumn("nv", l2_norm(F.col("v")))
    )
    a = ranked.select(
        "cluster", F.col("vec_id").alias("id_a"), F.col("rnk").alias("rnk_a"),
        F.col("v").alias("va"), F.col("nv").alias("na"),
    )
    b = ranked.select(
        "cluster", F.col("rnk").alias("rnk_b"),
        F.col("v").alias("vb"), F.col("nv").alias("nb"),
    )
    sim = F.round(dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6)
    t0 = time.monotonic()
    n = (
        a.join(b, "cluster")
        .filter(F.col("rnk_b") < F.col("rnk_a"))
        .filter(sim >= 0.995)
        .select("id_a")
        .distinct()
        .count()
    )
    return n, time.monotonic() - t0


def synth_docs(spark, n: int, parts: int = 32):
    return spark.range(0, n, 1, parts).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(
                    F.lit(1),
                    (F.pmod(hash60(F.col("id").cast("string")), F.lit(90)) + 10
                     ).cast("int"),
                ),
                lambda i: F.concat(F.lit("w"), i.cast("string")),
            ),
        ).alias("text"),
    )


def main() -> None:
    spark = get_spark("bench-semantic-scale", shuffle_partitions=32)
    out = []

    # prune cost ~ sum(cluster^2): fixed K at 10x data means 100x the
    # pairwise term (the demonstration), scaled K keeps clusters flat
    for label, n, k in [("1x", 2_000, 8), ("10x-fixedK", 20_000, 8),
                        ("10x-scaledK", 20_000, 80)]:
        vecs = synth_vectors(spark, n).localCheckpoint()
        t0 = time.monotonic()
        cents = fit(spark, vecs, k=k, iters=2)
        fit_s = time.monotonic() - t0
        dropped, prune_s = prune_count(spark, vecs, cents)
        rec = {
            "bench": "semantic_dedup",
            "config": label,
            "n_vecs": n,
            "k": k,
            "fit_sec_2iters": round(fit_s, 3),
            "prune_sec": round(prune_s, 3),
            "dropped": dropped,
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)
        vecs.unpersist()

    # large-K assignment: literal-expression vs Arrow-matmul path
    from postgres_opensearch_cdc_spark.functions.similarity import (
        assign_nearest_arrow,
        fit_kmeans_arrow,
    )

    vecs80 = synth_vectors(spark, 20_000).localCheckpoint()
    t0 = time.monotonic()
    fit_kmeans_arrow(vecs80, k=80, iterations=2, seed_salt=tp4.SEM_SALT)
    rec = {
        "bench": "semantic_dedup",
        "config": "10x-scaledK-arrowfit",
        "n_vecs": 20_000,
        "k": 80,
        "fit_sec_2iters": round(time.monotonic() - t0, 3),
    }
    print(json.dumps(rec), flush=True)
    out.append(rec)
    vecs80.unpersist()

    vecs = synth_vectors(spark, 20_000).localCheckpoint()
    seeds = (
        vecs.orderBy(
            hash60(F.col("vec_id").cast("string"), salt=tp4.SEM_SALT),
            "vec_id",
        )
        .limit(80)
        .collect()
    )
    cents80 = [[round(float(x), 6) for x in r.v] for r in seeds]
    for label, fn in [
        (
            "literal-expr",
            lambda: vecs.select(
                "vec_id", *tp4._assign_cols(F.col("v"), cents80)
            ).groupBy("cluster").count().count(),
        ),
        (
            "arrow-matmul",
            lambda: assign_nearest_arrow(vecs, cents80)
            .groupBy("cluster").count().count(),
        ),
    ]:
        fn()  # warm (codegen/compile)
        t0 = time.monotonic()
        fn()
        rec = {
            "bench": "assignment_k80",
            "config": label,
            "n_vecs": 20_000,
            "k": 80,
            "assign_sec_warm": round(time.monotonic() - t0, 3),
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)
    vecs.unpersist()

    for label, n, shards in [("1x", 50_000, 64), ("10x", 500_000, 64),
                             ("10x-moreshards", 500_000, 640)]:
        docs = synth_docs(spark, n).localCheckpoint()
        base = docs.select(
            "doc_id",
            F.pmod(
                hash60(F.col("doc_id").cast("string"), salt=tp4.PACK_SALT_SHARD),
                F.lit(shards),
            ).alias("shard"),
            hash60(F.col("doc_id").cast("string"), salt=tp4.PACK_SALT_ORDER
                   ).alias("h"),
            F.size(F.split(F.col("text"), " ")).cast("long").alias("toks"),
        )
        t0 = time.monotonic()
        got = (
            base.groupBy("shard")
            .applyInPandas(
                tp4._pack_shard,
                schema="shard long, bin long, n_docs long, tokens long",
            )
            .groupBy()
            .agg(F.count(F.lit(1)).alias("bins"), F.sum("tokens").alias("toks"))
            .collect()[0]
        )
        rec = {
            "bench": "pack_sequences",
            "config": label,
            "n_docs": n,
            "shards": shards,
            "pack_sec": round(time.monotonic() - t0, 3),
            "bins": got.bins,
        }
        print(json.dumps(rec), flush=True)
        out.append(rec)
        docs.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
