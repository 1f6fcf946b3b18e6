"""Scale-curve for the PERSISTED IVF index (similarity.ivf_index_build /
ivf_index_topk): the build-once / query-many layout's two scaling
levers, measured.

Corpus: the sf0.1 embeddings table (2,000 × 64-dim) replicated 20×
(40,000 vectors) with deterministic per-replica perturbation — each
replica adds (replica_idx * 1e-3) to every component, preserving the
cluster geometry while making vectors distinct. The corpus is
materialized to parquet first so index build and brute-force query
read identical bytes.

Measured claims:
1. QUERY COST SCALES WITH nprobe/k, NOT CORPUS SIZE: at fixed corpus,
   growing the quantizer from k=8 to k=32 cells cuts both the files
   read and the query wall-clock ~4× (nprobe=3 fixed) — the knob a
   100 TB deployment turns as the corpus grows (k ~ sqrt(N) keeps
   per-cell size constant).
2. PRUNING IS FILE-LEVEL: inputFiles() of the query plan lists only
   the probed cells' partition directories; the fraction read matches
   nprobe/k, independent of corpus size.
3. Brute force over the same corpus reads EVERY file and scales
   linearly — the baseline the index beats by ~k/nprobe.

Run: python3 tools/bench_ivf_index_scale.py  (JSON lines to stdout;
results recorded in SCALE.md §13).
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.similarity import (
    brute_force_topk,
    ivf_index_build,
    ivf_index_topk,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 100
NPROBE = 3


def build_corpus(spark, tmp: str) -> str:
    base = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")

    def shift(delta: float):
        # factory, not a default-arg lambda: a 1-param lambda is what
        # transform() expects (a second param would be the INDEX, and a
        # default arg makes the signature 3-ary — rejected)
        return lambda x: x + F.lit(delta)

    parts = []
    for i in range(REPLICAS):
        parts.append(
            base.select(
                (F.col("vec_id") + F.lit(i * 1_000_000)).alias("vec_id"),
                F.transform("embedding", shift(float(i) * 1e-3)).alias(
                    "embedding"
                ),
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    path = os.path.join(tmp, "corpus")
    corpus.repartition(32).write.parquet(path)
    return path


def timed(fn, reps: int = 3) -> float:
    fn()  # warm (codegen compile + file listing)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts), 3)


def main() -> None:
    spark = get_spark(
        "ivf_scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="ivf_scale_")
    try:
        corpus_path = build_corpus(spark, tmp)
        corpus = spark.read.parquet(corpus_path)
        n = corpus.count()
        q = [
            float(x)
            for x in corpus.filter(F.col("vec_id") == 0).head()["embedding"]
        ]
        brute_sec = timed(
            lambda: brute_force_topk(corpus, q, k=10).collect()
        )
        print(json.dumps({"corpus_rows": n, "brute_force_sec": brute_sec}))
        for k, fpc in ((8, 1), (8, 4), (32, 1), (32, 4)):
            seeds = [
                [float(x) for x in r["embedding"]]
                for r in sorted(
                    corpus.filter(
                        F.col("vec_id").isin(list(range(1, k + 1)))
                    ).select("vec_id", "embedding").collect(),
                    key=lambda r: r["vec_id"],
                )
            ]
            idx = os.path.join(tmp, f"index_k{k}_f{fpc}")
            t0 = time.perf_counter()
            ivf_index_build(corpus, idx, centroids=seeds, files_per_cell=fpc)
            build_sec = round(time.perf_counter() - t0, 3)
            got = ivf_index_topk(spark, idx, q, nprobe=NPROBE, k=10)
            files_read = len(got.inputFiles())
            total_files = sum(
                1
                for root, _, fs in os.walk(idx)
                for f in fs
                if f.endswith(".parquet")
            )
            query_sec = timed(
                lambda: ivf_index_topk(
                    spark, idx, q, nprobe=NPROBE, k=10
                ).collect()
            )
            print(json.dumps({
                "k_cells": k,
                "files_per_cell": fpc,
                "nprobe": NPROBE,
                "build_sec": build_sec,
                "query_sec": query_sec,
                "files_read": files_read,
                "total_files": total_files,
                "read_fraction": round(files_read / total_files, 3),
                "speedup_vs_brute": round(brute_sec / query_sec, 1),
            }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
