"""Scale curves for the round-12 batch-5 operators.

1. Winnowing fingerprints at 1x/4x/10x corpus (doc-id-offset
   replicas of the sf0.1 documents table). The gram-hash +
   window-argmin stages must scale ~linearly in corpus size; the
   pair expansion is the part the WIN_CAP hot-hash guard bounds —
   replication drives every fingerprint's doc-frequency up by the
   replica count, so this is also an adversarial probe of the cap
   (per-hash pair output is bounded by cap*(cap-1)/2 regardless of
   how hot a hash gets).

2. WordPiece max-munch encoding vs vocabulary size (8 / 256 / 1024
   merges learned by the driver-loop BPE trainer — vocab content is
   irrelevant to the cost shape; maxlen and set-probe count are
   what grow). Encode cost must stay ~flat-ish: the Zipf
   distinct-word cache absorbs vocab growth; the plan is constant
   size by construction (the merge list never enters Catalyst).

Run: python3 tools/bench_winnow_scale.py  (JSON lines to stdout;
results recorded in SCALE.md §23).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from postgres_opensearch_cdc_spark.functions.bpe import (
    bpe_train_local,
    wordpiece_token_counts_arrow,
)
from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
    winnow_shared_pairs,
)
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def replicated_docs(docs: DataFrame, replicas: int) -> DataFrame:
    span = 100_000_000
    parts = [
        docs.select(
            (F.col("doc_id") + i * span).alias("doc_id"), "text"
        )
        for i in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    spark = get_spark("bench_winnow_scale", shuffle_partitions=32)
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    n_docs = docs.count()

    for replicas in (1, 4, 10):
        rep = replicated_docs(docs, replicas).localCheckpoint(eager=True)
        t0 = time.time()
        n_pairs = winnow_shared_pairs(rep).count()
        el = time.time() - t0
        print(json.dumps({
            "curve": "winnowing",
            "replicas": replicas,
            "n_docs": n_docs * replicas,
            "n_pairs": n_pairs,
            "sec": round(el, 3),
        }), flush=True)

    merges_large = bpe_train_local(docs, "text", num_merges=1024)
    # the synthetic corpus' vocabulary exhausts its pair supply well
    # before 1024 merges — report the REAL vocab size used per point
    for n_merges in (8, 64, len(merges_large)):
        merges = [(r, l, x, 0.0) for r, l, x in merges_large[:n_merges]]
        best = None
        for _ in range(2):  # min-of-2: first pass pays Arrow warmup
            t0 = time.time()
            out = wordpiece_token_counts_arrow(
                docs, "text", "doc_id", merges
            )
            total = out.agg(F.sum("n_tokens_wp")).collect()[0][0]
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(json.dumps({
            "curve": "wordpiece_encode",
            "n_merges": len(merges),
            "n_docs": n_docs,
            "total_tokens": int(total),
            "sec": round(best, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
