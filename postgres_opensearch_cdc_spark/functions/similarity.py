"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a single scan with the dot product
computed by built-in higher-order functions (zip_with + aggregate, JVM
codegen, no Python), finished by TakeOrderedAndProject. At 100 TB this
is the always-correct fallback and the verifier for the approximate
paths.

Scale paths:
- random-hyperplane LSH bucketing (cosine-preserving): probe only the
  query's bucket(s) — turns the scan into a partition-pruned lookup when
  bucketed storage is keyed by the LSH signature.
- IVF (inverted file): k-means-style coarse centroids (deterministic
  seeded init here), search nprobe nearest cells. Centroid assignment is
  a broadcast join of the tiny centroid table against the big vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns — zip_with + aggregate, fully
    codegen'd, no UDF."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector. The query is a
    literal array (constant-folded, effectively broadcast); the plan is
    scan → project(score) → TakeOrderedAndProject(k) — per-partition
    heaps, no global sort, no shuffle of payloads. Holds verbatim on a
    1000-executor scan."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    score = cosine(F.col(vec_col), q)
    return (
        vectors.select(F.col(id_col), F.round(score, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk_by_label(
    vectors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    group_col: str = "label",
) -> DataFrame:
    """Intra-group exact k-NN: join vectors within each group (the
    grouped/bucketed form of all-pairs — the pattern that makes all-pairs
    tractable: restrict candidate pairs to a partition key, here label,
    in production an LSH bucket)."""
    from pyspark.sql import Window

    a = vectors.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id_a"),
        _as_double(F.col(vec_col)).alias("va"),
    )
    b = vectors.select(
        F.col(group_col).alias("g"),
        F.col(id_col).alias("id_b"),
        _as_double(F.col(vec_col)).alias("vb"),
    )
    pairs = a.join(b, "g").filter(F.col("id_a") != F.col("id_b"))
    scored = pairs.select(
        "g",
        "id_a",
        "id_b",
        F.round(
            dot(F.col("va"), F.col("vb"))
            / (l2_norm(F.col("va")) * l2_norm(F.col("vb"))),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("id_a", "id_b", "cos_sim", "rnk")
    )


def random_hyperplane_buckets(
    vectors: DataFrame,
    planes: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cosine-LSH bucket id per vector: sign pattern against fixed random
    hyperplanes (passed in, deterministic). b planes → 2^b buckets.
    Bucket computation is pure projection — at scale, write the table
    bucketed by this column and ANN probes become partition-pruned
    scans."""
    v = _as_double(F.col(vec_col))
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bucket = bucket + F.when(dot(v, p) >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return vectors.select(F.col(id_col), bucket.alias("bucket"))


def ivf_assign(
    vectors: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse assignment: nearest centroid (max cosine) per vector.
    Centroids arrive as literals (≙ broadcast of a tiny dim table); the
    argmax is an array-sort over per-centroid scores — no shuffle at
    all, embarrassing-parallel over the scan."""
    v = _as_double(F.col(vec_col))
    scores = F.array(
        *[
            F.struct(
                F.round(
                    dot(v, F.array(*[F.lit(float(x)) for x in c])), 6
                ).alias("score"),
                F.lit(i).alias("cell"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scores)
    return vectors.select(F.col(id_col), best["cell"].alias("cell"))
