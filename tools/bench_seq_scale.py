"""Two-point scale-curve for the EQL sequence operator.

Builds a 10x event stream from the sf0.1 events table by unioning 10
user-id-offset replicas — user count grows 10x while each user's
timeline (and therefore the per-user window work) is unchanged. The
window formulation must scale ~linearly in events; a pairwise
(signup x purchase) self-join formulation would grow with the pair
count instead. Also reports the result-row ratio (should be exactly
10x: every replica contributes identical per-user matches).

Run: python3 tools/bench_seq_scale.py  (JSON lines to stdout; results
recorded in SCALE.md §10).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from postgres_opensearch_cdc_spark.queries import sequences
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.session import get_spark

REPLICAS = 10


def replicated_events(ev: DataFrame, replicas: int) -> DataFrame:
    user_span = 1_000_000
    parts = [
        ev.select(
            (F.col("user_id") + i * user_span).alias("user_id"),
            (F.col("event_id") + i * 100_000_000).alias("event_id"),
            "event_type",
            "ts",
            "value",
            "props",
        )
        for i in range(replicas)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_seq(spark, ev: DataFrame) -> tuple[float, int]:
    # same plan as sequences.eql_sequence, applied to an arbitrary frame
    enriched = ev.select(
        "user_id",
        "event_type",
        "ts",
        sequences._future_min(sequences.SEQ_SECOND).alias("next_b"),
    )
    lag_s = F.col("next_b").cast("long") - F.col("ts").cast("long")
    matches = enriched.filter(
        (F.col("event_type") == sequences.SEQ_FIRST)
        & F.col("next_b").isNotNull()
        & (lag_s <= sequences.SEQ_MAXSPAN_S)
    )
    df = matches.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sequences"), F.min(lag_s).alias("min_lag_s")
    )
    t0 = time.perf_counter()
    n = df.count()
    return time.perf_counter() - t0, n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "seq-scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ev = load_table(spark, sf_dir, "events")
    base = replicated_events(ev, 1).localCheckpoint()
    big = replicated_events(ev, REPLICAS).localCheckpoint()
    run_seq(spark, base)  # warm-up: compile the identical plan
    t1, n1 = run_seq(spark, base)
    t10, n10 = run_seq(spark, big)
    print(
        json.dumps(
            {
                "op": "eql_sequence",
                "events_1x": base.count(),
                "events_10x": big.count(),
                "sec_1x": round(t1, 2),
                "sec_10x": round(t10, 2),
                "time_ratio": round(t10 / t1, 2),
                "rows_1x": n1,
                "rows_10x": n10,
                "rows_ratio": round(n10 / n1, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
