"""SRP-LSH embedding dedup: structural properties that the oracle
parity check can't express — candidate-verified output is a SUBSET of
the exact all-pairs result (LSH may miss pairs, never invent them), and
the signature pipeline is deterministic across runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.similarity import _as_double, dot, l2_norm
from postgres_opensearch_cdc_spark.queries.extensions import (
    _SRP_THRESHOLD,
    dedup_embedding_srp,
)
from postgres_opensearch_cdc_spark.registry import load_table


def _exact_pairs(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    a = vecs.select(
        F.col("vec_id").alias("id_a"), _as_double(F.col("embedding")).alias("va")
    )
    b = vecs.select(
        F.col("vec_id").alias("id_b"), _as_double(F.col("embedding")).alias("vb")
    )
    sim = dot(F.col("va"), F.col("vb")) / (l2_norm(F.col("va")) * l2_norm(F.col("vb")))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", F.round(sim, 6).alias("cos_sim"))
        .filter(F.col("cos_sim") >= _SRP_THRESHOLD)
    )


def test_srp_output_subset_of_exact_pairs(spark, sf_dir):
    srp = {(r["id_a"], r["id_b"]) for r in dedup_embedding_srp(spark, sf_dir).collect()}
    exact = {(r["id_a"], r["id_b"]) for r in _exact_pairs(spark, sf_dir).collect()}
    assert srp, "expected the corpus to contain SRP-recoverable pairs"
    assert srp <= exact, f"LSH invented pairs: {sorted(srp - exact)[:5]}"


def test_srp_deterministic(spark, sf_dir):
    r1 = [tuple(r) for r in dedup_embedding_srp(spark, sf_dir).collect()]
    r2 = [tuple(r) for r in dedup_embedding_srp(spark, sf_dir).collect()]
    assert r1 == r2
