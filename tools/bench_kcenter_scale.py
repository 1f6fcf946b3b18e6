"""Greedy k-center cost curves (round-13 verdict ask #5, SCALE §26):
wall time vs K (the number of sequential argmax rounds) and vs corpus
size. The loop is K sequential Spark jobs — each a scan-projection
plus a 1-row TakeOrdered collect — so the expected shape is
t ≈ K · (scan(n)/parallelism + job_floor); this tool measures both
axes so the docstring bound in training_pipeline9.kcenter_select is a
number, not an argument.

Usage: python3 tools/bench_kcenter_scale.py [SF_DIR]   # default sf0.1
Prints one JSON line per (corpus multiplier, K) point.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.queries.training_pipeline9 import (  # noqa: E402
    kcenter_select,
)
from postgres_opensearch_cdc_spark.registry import load_table  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "kcenter_scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double"))
        .alias("v"),
    )
    n_base = base.count()
    for mult in (1, 8):
        if mult == 1:
            vecs = base
        else:
            # replicate with distinct ids and a tiny deterministic
            # per-replica offset so the replicas are not exact dups
            reps = spark.range(mult).withColumnRenamed("id", "rep")
            vecs = base.crossJoin(reps).select(
                (F.col("vec_id") * mult + F.col("rep")).alias("vec_id"),
                F.transform(
                    "v",
                    lambda x: x + F.col("rep").cast("double") / 1000.0,
                ).alias("v"),
            )
        vecs = vecs.localCheckpoint(eager=True)
        n = vecs.count()
        # warm-up: compile the round's plan shape once
        kcenter_select(vecs, 2)
        for k in (8, 16, 32, 64):
            t0 = time.perf_counter()
            centers = kcenter_select(vecs, k)
            dt = time.perf_counter() - t0
            print(json.dumps({
                "sf_dir": sf_dir, "corpus": n, "mult": mult, "k": k,
                "sec": round(dt, 2),
                "sec_per_round": round(dt / k, 3),
                "final_radius": round(centers[-1][2], 6),
            }), flush=True)


if __name__ == "__main__":
    main()
