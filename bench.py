"""Benchmark harness: runs the engine's query surface at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Per-query time = full execution to collected result (driver-side
materialization included, as a user would experience it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entrymod  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = entrymod.queries()
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, sf_dir)
            n = len(df.collect())
        except Exception as e:  # record failures as negative sentinel
            print(f"bench error in {name}: {e}", file=sys.stderr)
            timings[name] = -1.0
            continue
        dt = round(time.perf_counter() - t0, 3)
        timings[name] = dt
        total += dt
        print(f"{name}: {dt}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "query_surface_total_runtime",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
