"""Two-point scale-curve measurement for the dedup-LSH and IVF paths.

Builds a 10x corpus from the sf0.1 documents table by unioning 10
deterministic per-replica token-suffix rewrites (replica 0 = original;
replica i maps every token t -> t+"~i"). The rewrite preserves each
document's internal token order, so within a replica the duplicate /
near-duplicate structure and the shingle document-frequency
distribution are IDENTICAL to the original corpus, while replicas share
no shingles with each other — corpus size grows 10x with constant
true-duplicate density. A sub-quadratic pipeline must therefore show
candidate pairs growing ~10x (linear), not ~100x (the all-pairs
quadratic), and band rows growing exactly linearly.

(A first attempt permuted tokens by salted-hash sort instead; that
collapses every doc sharing common vocabulary onto identical sorted
runs, inflating shingle document frequency to ~corpus size and turning
the verify self-join quadratic — a corpus-construction artifact worth
remembering, not a pipeline property.)

Run: python3 tools/bench_scale_curve.py  (writes JSON lines to stdout;
results recorded in SCALE.md §10).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.dedup import (
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    word_shingles,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch")


def permuted_replicas(docs, replicas: int):
    """Union of per-replica token-suffix rewrites (see module doc)."""
    parts = []
    n_docs = docs.count()
    for i in range(replicas):
        if i == 0:
            text = F.col("text")
        else:
            toks = F.split(F.col("text"), r"\s+")
            text = F.array_join(
                F.transform(toks, lambda t, i=i: F.concat(t, F.lit(f"~{i}"))), " "
            )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * n_docs)).alias("doc_id"),
                text.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def measure_lsh(spark, docs, label: str) -> dict:
    """Mirrors the dedup_minhash_lsh entry's current shape: shuffle-free
    array signatures (no corpus-wide shingle shuffle), candidates from
    the band join, and exact verification restricted to candidate docs
    (only those get exploded into shingle rows)."""
    from postgres_opensearch_cdc_spark.functions.dedup import (
        minhash_signatures_from_arrays,
        shingle_arrays,
    )

    t0 = time.time()
    arrays = shingle_arrays(docs, "text", "doc_id", n=3)
    sigs = minhash_signatures_from_arrays(arrays, num_hashes=32, hasher="md5")
    cands = minhash_lsh_candidates(sigs, bands=8, rows_per_band=4).cache()
    cand_pairs = cands.count()
    cand_ids = (
        cands.select(F.col("id_a").alias("doc_id"))
        .union(cands.select(F.col("id_b").alias("doc_id")))
        .distinct()
    )
    docs_cand = docs.join(F.broadcast(cand_ids), "doc_id", "left_semi")
    sh_cand = word_shingles(docs_cand, "text", "doc_id", n=3)
    verified_shingle_rows = sh_cand.count()
    verified = ngram_jaccard_pairs(
        docs, n=3, threshold=0.4, candidates=cands, shingles=sh_cand
    ).count()
    wall = time.time() - t0
    n_docs = docs.count()
    cands.unpersist()
    return {
        "path": "dedup_minhash_lsh",
        "corpus": label,
        "docs": n_docs,
        "verify_shingle_rows": verified_shingle_rows,
        "band_rows": n_docs * 8,
        "candidate_pairs": cand_pairs,
        "verified_pairs": verified,
        "all_pairs_would_be": n_docs * (n_docs - 1) // 2,
        "wall_sec": round(wall, 2),
    }


def measure_ivf(spark, sf_dir: str, replicas: int, label: str) -> dict:
    from postgres_opensearch_cdc_spark.functions.similarity import (
        _as_double,
        _nearest_cell,
        ivf_topk,
    )

    vecs = load_table(spark, sf_dir, "embeddings")
    n0 = vecs.count()
    parts = [
        vecs.select(
            (F.col("vec_id") + F.lit(i * n0)).alias("vec_id"), "embedding"
        )
        for i in range(replicas)
    ]
    big = parts[0]
    for p in parts[1:]:
        big = big.unionByName(p)
    big = big.cache()
    n = big.count()
    q = [float(x) for x in vecs.filter(F.col("vec_id") == 0).head()["embedding"]]
    seed_rows = (
        vecs.filter(F.col("vec_id").isin(list(range(1, 11))))
        .select("vec_id", "embedding")
        .collect()
    )
    centroids = [
        [float(x) for x in r["embedding"]]
        for r in sorted(seed_rows, key=lambda r: r["vec_id"])
    ]
    t0 = time.time()
    probed_rows = (
        big.withColumn("_cell", _nearest_cell(_as_double(F.col("embedding")), centroids))
        .filter(F.col("_cell").isin([0, 1, 2]))
        .count()
    )
    topk = ivf_topk(big.filter(F.col("vec_id") != 0), q, centroids, nprobe=3, k=10)
    topk.count()
    wall = time.time() - t0
    big.unpersist()
    return {
        "path": "ann_ivf_probe",
        "corpus": label,
        "vectors": n,
        "rows_scored_in_probe": probed_rows,
        "wall_sec": round(wall, 2),
    }


def main() -> None:
    spark = get_spark("scale-curve", shuffle_partitions=32)
    docs = load_table(spark, SF_DIR, "documents")
    results = []
    results.append(measure_lsh(spark, docs, "1x (sf0.1)"))
    big = permuted_replicas(docs, 10).cache()
    big.count()
    results.append(measure_lsh(spark, big, "10x"))
    results.append(measure_ivf(spark, SF_DIR, 1, "1x (sf0.1)"))
    results.append(measure_ivf(spark, SF_DIR, 10, "10x"))
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
