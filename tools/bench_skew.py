"""Skewed-key stress bench: compaction + aggregation under a hot-key
changelog where 1% of keys carry 50% of all events.

Measures (local[32], second run after codegen warm-up):
  - compact_changelog strategy='window' vs strategy='agg'
  - groupBy-count on key-pre-partitioned input vs salted_count
and asserts result equality between each pair. Numbers land in
SCALE.md §4.

Usage: python3 tools/bench_skew.py [num_events] [hot_keys] [cold_keys]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession, functions as F

sys.path.insert(0, ".")

from postgres_opensearch_cdc_spark.cdc.apply import compact_changelog  # noqa: E402
from postgres_opensearch_cdc_spark.functions.skew import salted_count  # noqa: E402

HOT_KEYS = 2_000          # 1% of keys ...
COLD_KEYS = 198_000
# ... receive 50% of events (even ids → hot key space, odd → cold)


def make_skewed_changelog(spark: SparkSession, n: int):
    df = spark.range(n).select(
        F.when(
            F.col("id") % 2 == 0,
            F.pmod(F.xxhash64("id"), F.lit(HOT_KEYS)),
        )
        .otherwise(F.lit(HOT_KEYS) + F.pmod(F.xxhash64("id"), F.lit(COLD_KEYS)))
        .alias("key"),
        F.col("id").alias("offset"),
        F.lit("u").alias("op"),
        (F.col("id") % 1000).cast("double").alias("value"),
    )
    return df


def timed(label: str, fn, runs: int = 2) -> float:
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:55s} {best:8.2f} s")
    return best


def main() -> None:
    global HOT_KEYS, COLD_KEYS
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    if len(sys.argv) > 2:
        HOT_KEYS = int(sys.argv[2])
    if len(sys.argv) > 3:
        COLD_KEYS = int(sys.argv[3])
    spark = (
        SparkSession.builder.master("local[32]")
        .appName("bench_skew")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    log = make_skewed_changelog(spark, n).localCheckpoint(eager=True)
    total = log.count()
    hot_share = log.filter(F.col("key") < HOT_KEYS).count() / total
    print(
        f"events={total:,} keys≈{HOT_KEYS + COLD_KEYS:,} "
        f"hot keys={HOT_KEYS:,} ({HOT_KEYS/(HOT_KEYS+COLD_KEYS):.1%}) "
        f"carrying {hot_share:.1%} of events"
    )

    t_window = timed(
        "compact strategy=window (shuffle + per-key sort)",
        lambda: compact_changelog(log, ["key"], ["offset"], strategy="window")
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    t_agg = timed(
        "compact strategy=agg (map-side max_by collapse)",
        lambda: compact_changelog(log, ["key"], ["offset"], strategy="agg")
        .agg(F.count(F.lit(1)))
        .collect(),
    )
    # result equality on the skewed input
    a = compact_changelog(log, ["key"], ["offset"], strategy="window")
    b = compact_changelog(log, ["key"], ["offset"], strategy="agg")
    mismatch = a.select("key", "offset").exceptAll(b.select("key", "offset")).count()
    assert mismatch == 0, f"strategies diverge on {mismatch} rows"
    print(f"strategies result-identical; agg/window speedup = {t_window/t_agg:.2f}x")

    # the metric that matters on a REAL (network-bound) cluster: rows
    # entering the shuffle. window shuffles every event; agg shuffles the
    # map-side-collapsed partials (≤ distinct keys per input partition).
    # Also the straggler bound: window gives ONE reducer the hot key's
    # full event stream (AQE cannot split a window key); agg caps any
    # key's reducer input at #map-partitions rows.
    partial_rows = (
        log.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", "key")
        .agg(F.count(F.lit(1)))
        .count()
    )
    hot_max = (
        log.groupBy("key").agg(F.count(F.lit(1)).alias("c")).agg(F.max("c")).head()[0]
    )
    nparts = log.rdd.getNumPartitions()
    print(
        f"shuffle rows: window={total:,} vs agg={partial_rows:,} "
        f"({total/partial_rows:.1f}x reduction); hottest-key reducer input: "
        f"window={hot_max:,} rows vs agg≤{nparts}"
    )

    # counting path: input pre-partitioned BY the hot key (map-side
    # combine can't help inside a key-pure partition held by one task)
    keyed = log.repartition(32, "key").localCheckpoint(eager=True)
    t_plain = timed(
        "groupBy(key).count on key-partitioned input",
        lambda: keyed.groupBy("key").agg(F.count(F.lit(1)).alias("cnt"))
        .agg(F.sum("cnt"))
        .collect(),
    )
    t_salt = timed(
        "salted_count (two-phase, 16 salts)",
        lambda: salted_count(keyed, ["key"], salt_buckets=16, salt_source="offset")
        .agg(F.sum("cnt"))
        .collect(),
    )
    p = {r["key"]: r["cnt"] for r in keyed.groupBy("key").agg(F.count(F.lit(1)).alias("cnt")).filter(F.col("key") < 5).collect()}
    s = {r["key"]: r["cnt"] for r in salted_count(keyed, ["key"], salt_buckets=16, salt_source="offset").filter(F.col("key") < 5).collect()}
    assert p == s, f"salted count diverges: {p} vs {s}"
    print(f"counts identical; salted/plain = {t_plain/t_salt:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
