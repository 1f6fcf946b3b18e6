"""Two-point scale-curve measurement for the PQ path: encode + ADC
top-k at 1x and 10x the sf0.1 embeddings corpus.

The 10x corpus unions 10 deterministic replicas (replica i adds i to
every dimension's value and offsets vec_id by i * 1e6) — distances to
any fixed query shift per replica but the workload per vector is
identical, so a linear pipeline must show ~10x wall-clock for encode
and ADC, never worse: both phases are scan projections with a
TakeOrderedAndProject finish, no shuffle to go super-linear.

Run: python3 tools/bench_pq_scale.py  (writes JSON lines to stdout;
results recorded in SCALE.md §12).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.similarity import (
    pq_adc_topk,
    pq_codes,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.session import get_spark


def replicate(vecs, n: int):
    def _shift(i: int):
        # factory, not a default-arg lambda: HOF lambdas are called by
        # arity, so a second parameter would receive the element index
        return lambda x: x + F.lit(float(i))

    out = None
    for i in range(n):
        rep = vecs.select(
            (F.col("vec_id") + i * 1_000_000).alias("vec_id"),
            F.transform("embedding", _shift(i)).alias("embedding"),
        )
        out = rep if out is None else out.unionByName(rep)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "pq-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    from postgres_opensearch_cdc_spark.queries.extensions import (
        _pq_frozen_codebook,
    )

    vecs = load_table(spark, sf_dir, "embeddings")
    q, cb = _pq_frozen_codebook(vecs)
    # untimed warm-up: the PQ expression tree's codegen compile is a
    # per-plan-structure one-off (a live engine compiles once, runs
    # warm) — without this the 1x point measures the compiler
    warm = vecs.filter(F.col("vec_id") != 0).limit(200)
    warm.select("vec_id", *pq_codes(F.col("embedding"), cb)).write.mode(
        "overwrite"
    ).format("noop").save()
    pq_adc_topk(warm, q, cb, k=10).collect()
    for factor in (1, 10):
        corpus = replicate(vecs.filter(F.col("vec_id") != 0), factor)
        corpus = corpus.localCheckpoint(eager=True)  # isolate build cost
        n = corpus.count()
        t0 = time.perf_counter()
        corpus.select("vec_id", *pq_codes(F.col("embedding"), cb)).write.mode(
            "overwrite"
        ).format("noop").save()
        t_encode = time.perf_counter() - t0
        t0 = time.perf_counter()
        rows = pq_adc_topk(corpus, q, cb, k=10).collect()
        t_adc = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "factor": factor,
                    "vectors": n,
                    "encode_sec": round(t_encode, 2),
                    "adc_topk_sec": round(t_adc, 2),
                    "top1": rows[0]["vec_id"],
                }
            )
        )


if __name__ == "__main__":
    main()
