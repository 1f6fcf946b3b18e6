"""Span-store growth curve (SCALE.md §19 extension, round 11): with
the winhash store hash-partitioned by pmod(win_hash, num_buckets), a
small probe batch's cost must track the TOUCHED BUCKETS' bytes, not
the store's — i.e. flat when num_buckets scales with the store, and
sublinear (pruned) when it doesn't.

Three configs, same 1-doc probe (24 tokens -> 15 windows -> <= 15
touched buckets):
  A: store 2,000 docs, num_buckets=64     (baseline)
  B: store 20,000 docs, num_buckets=64    (10x bytes per bucket)
  C: store 20,000 docs, num_buckets=640   (10x store, per-bucket
     bytes as A -- the operational 100 TB shape: bucket count grows
     with the store)

Expected: C ~= A regardless of the 10x store; B pays the bigger
buckets. Prints one JSON line.

Usage: python3 tools/bench_span_store_scale.py
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402
from postgres_opensearch_cdc_spark.streaming.neardup import (  # noqa: E402
    SpanDedupSink,
)


def corpus(spark, n_docs: int, tokens_per_doc: int = 40):
    from pyspark.sql import functions as F

    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(tokens_per_doc - 1)),
                    lambda i: F.concat(F.lit("d"), F.col("id"), F.lit("t"), i),
                ),
            ).alias("text"),
        )
    )


def probe(spark):
    from pyspark.sql import functions as F

    return spark.createDataFrame(
        [(10_000_000, " ".join(f"p{i}" for i in range(24)))],
        "doc_id long, text string",
    ).select("doc_id", F.col("text"))


def measure(spark, n_docs: int, num_buckets: int) -> dict:
    tmp = tempfile.mkdtemp(prefix=f"span_scale_{n_docs}_{num_buckets}_")
    try:
        sink = SpanDedupSink(path=f"{tmp}/sd", num_buckets=num_buckets)
        t0 = time.perf_counter()
        sink.apply_batch(corpus(spark, n_docs), 0)
        build = time.perf_counter() - t0
        # three distinct tiny probe batches (each registers ~15 new
        # hashes -- store size unchanged in magnitude); min over reps
        # is the steady-state per-batch number
        reps = []
        for b in range(1, 4):
            p = probe(spark).selectExpr(
                f"doc_id + {b} AS doc_id", "text"
            )
            t0 = time.perf_counter()
            sink.apply_batch(p, b)
            reps.append(time.perf_counter() - t0)
        import os

        store_bytes = sum(
            os.path.getsize(os.path.join(dp, f))
            for dp, _, fs in os.walk(sink._winhashes)
            for f in fs
        )
        return {
            "docs": n_docs,
            "num_buckets": num_buckets,
            "store_bytes": store_bytes,
            "build_sec": round(build, 3),
            "probe_batch_sec_min": round(min(reps), 3),
            "probe_batch_reps": [round(r, 3) for r in reps],
        }
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main() -> None:
    spark = get_spark(
        "span_store_scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm-up: compile the span pipeline once so config A isn't cold
    s = SpanDedupSink.__new__  # noqa: F841  (no-op, keep imports hot)
    warm = measure(spark, 200, 16)
    out = {
        "warmup": warm,
        "A_base": measure(spark, 2_000, 64),
        "B_10x_store_same_buckets": measure(spark, 20_000, 64),
        "C_10x_store_10x_buckets": measure(spark, 20_000, 640),
    }
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
