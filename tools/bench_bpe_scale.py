"""BPE training/apply cost vs merge count (SCALE.md §21, round 12).

The round-11 verdict flagged two design boundaries: training ran one
Spark job per merge (fine at 8 merges, 30k jobs at a real tokenizer's
30k), and apply inlined one chained replace per merge into the plan
(Catalyst plan-time cost grows with expression-tree size). Round 12
adds the production paths — bpe_train_local (one distributed
word-count pass + driver-side incremental merge loop) and
bpe_token_counts_arrow (mapInPandas encoder, constant plan size).

This bench measures, on the sf0.1 documents corpus:
  - train: distributed loop at n=8/32 (job-count scaling) vs local
    loop at n=8/128/1024 (flat: the corpus pass dominates)
  - apply: expression form at n=8/64 (plan growth) vs arrow encoder
    at n=8/64/1024 (flat plan, cache-dominated execution)

Run exclusively: python3 tools/bench_bpe_scale.py [sf_dir]
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from postgres_opensearch_cdc_spark.functions.bpe import (  # noqa: E402
    bpe_token_counts,
    bpe_token_counts_arrow,
    bpe_train,
    bpe_train_local,
)
from postgres_opensearch_cdc_spark.registry import load_table  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return out, round(time.monotonic() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bpe-scale")
    docs = load_table(spark, sf_dir, "documents").localCheckpoint(
        eager=True
    )
    n_docs = docs.count()

    for n in (8, 32):
        merges, sec = timed(lambda n=n: bpe_train(docs, "text", n))
        print(json.dumps({"op": "train_distributed", "n_merges": n,
                          "learned": len(merges), "sec": sec,
                          "docs": n_docs}), flush=True)
    local = {}
    for n in (8, 128, 1024):
        merges, sec = timed(lambda n=n: bpe_train_local(docs, "text", n))
        local[n] = merges
        print(json.dumps({"op": "train_local", "n_merges": n,
                          "learned": len(merges), "sec": sec,
                          "docs": n_docs}), flush=True)

    def run_expr(merges):
        return bpe_token_counts(
            docs, "text", "doc_id", merges
        ).agg({"n_tokens_bpe": "sum"}).collect()[0][0]

    def run_arrow(merges):
        return bpe_token_counts_arrow(
            docs, "text", "doc_id", merges
        ).agg({"n_tokens_bpe": "sum"}).collect()[0][0]

    for n in (8, 64):
        m = local[1024][:n]
        tot, sec = timed(lambda m=m: run_expr(m))
        print(json.dumps({"op": "apply_expression", "n_merges": len(m),
                          "sum_tokens": tot, "sec": sec}), flush=True)
    for n in (8, 64, 1024):
        m = local[1024][:n]
        tot, sec = timed(lambda m=m: run_arrow(m))
        print(json.dumps({"op": "apply_arrow", "n_merges": len(m),
                          "sum_tokens": tot, "sec": sec}), flush=True)

    # the sf corpus's synthetic vocabulary exhausts below ~100 merges;
    # a wider deterministic corpus (hash-derived 'words' over a
    # 16-letter alphabet) exercises the 1000+-merge regime real
    # tokenizers live in
    from pyspark.sql import functions as F
    rich = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.substring(
                F.conv(F.abs(F.xxhash64("id", F.lit(k))), 10, 16),
                1, 10,
            )
            for k in range(30)
        ]).alias("text"),
    ).localCheckpoint(eager=True)
    for n in (1024, 4096):
        merges, sec = timed(
            lambda n=n: bpe_train_local(rich, "text", n))
        print(json.dumps({"op": "train_local_rich", "n_merges": n,
                          "learned": len(merges), "sec": sec,
                          "docs": 20_000}), flush=True)
    m4k = bpe_train_local(rich, "text", 4096)
    for n in (1024, len(m4k)):
        m = m4k[:n]
        tot, sec = timed(lambda m=m: bpe_token_counts_arrow(
            rich, "text", "doc_id", m
        ).agg({"n_tokens_bpe": "sum"}).collect()[0][0])
        print(json.dumps({"op": "apply_arrow_rich", "n_merges": len(m),
                          "sum_tokens": tot, "sec": sec}), flush=True)


if __name__ == "__main__":
    main()
