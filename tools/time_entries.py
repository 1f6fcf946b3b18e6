"""Time named queries() entries in isolation: one cold run then
median of 3 warm repeats, full collect (the bench's methodology).

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
       python tools/time_entries.py <query_name ...>
Prints one line per entry: name cold_s warm_median_s rows.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "time-entries", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    # the bench's warmups: JVM/codegen/parquet footers/Arrow workers
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from postgres_opensearch_cdc_spark.registry import load_table

    for t in ("nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        load_table(spark, sf_dir, t).limit(1).collect()
    spark.range(10_000).repartition(8).mapInPandas(
        lambda it: it, schema="id long"
    ).selectExpr("count(1)").collect()

    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN", flush=True)
            continue
        spark.sparkContext.setJobDescription(f"time:{name}")
        t0 = time.perf_counter()
        rows = len(qs[name](spark, sf_dir).collect())
        cold = time.perf_counter() - t0
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            len(qs[name](spark, sf_dir).collect())
            reps.append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        print(
            f"{name}: cold={cold:.2f}s warm={statistics.median(reps):.2f}s "
            f"rows={rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
