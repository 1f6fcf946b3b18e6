"""Measured scale curve for the CDC merge path (SCALE.md §15): hash-
and range-mode VersionedMirrorSink merges at 1× and 10× mirror size
with a FIXED 1,000-row micro-batch.

The claim under test (the engine's core 100 TB argument, SCALE.md §2):
range-mode (clustered-key) merge latency is governed by the TOUCHED
BUCKETS, not the mirror size — a 10× mirror with the same batch should
cost ~the same; hash-mode (uniform random keys) touches every bucket
and therefore re-reads/rewrites mirror-sized state, so it degrades
with mirror size and is the shape to avoid for big mirrors.

Run exclusively (no concurrent Spark sessions — ambient load swings
timings ±50%):

    python3 tools/merge_scale.py            # events sf0.01 vs sf0.1

Prints one JSON line per (mirror_size, mode) with mirror rows, touched
buckets, and min-over-3-reps batch seconds (idempotent merge: reps
leave identical state).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.cdc.envelope import events_as_changelog  # noqa: E402
from postgres_opensearch_cdc_spark.registry import load_table  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402
from postgres_opensearch_cdc_spark.streaming.apply import VersionedMirrorSink  # noqa: E402

BATCH_ROWS = 1000
BUCKETS = 32


def measure(spark, sf_dir: str, tmp: str) -> list[dict]:
    log = events_as_changelog(load_table(spark, sf_dir, "events"))
    n = log.count()
    max_key = log.agg(F.max("key")).head()[0]
    span = max_key // BUCKETS + 1
    out = []
    for mode, bucket_expr, batch in [
        # hash mode: uniform random keys -> touches every bucket
        ("hash", None,
         log.filter(F.col("event_id") % 97 == 0).limit(BATCH_ROWS)),
        # range mode: batch clustered in ONE key range (monotonic PKs /
        # hot recent entities - the common CDC shape)
        ("range", f"key div {span}",
         log.filter(F.col("key") < span).limit(BATCH_ROWS)),
    ]:
        path = os.path.join(tmp, f"mirror_{os.path.basename(sf_dir)}_{mode}")
        sink = VersionedMirrorSink(
            path=path, key_cols=["key"], seq_cols=["ts", "event_id"],
            num_buckets=BUCKETS, bucket_expr=bucket_expr,
        )
        sink.apply_batch(log, 0)  # build the mirror (untimed)
        mirror_rows = sink.read(spark).count()
        batch = batch.localCheckpoint(eager=True)  # fix batch content
        sink.apply_batch(batch, 1)  # warm-up: compile the merge plan
        reps = []
        for rep in range(3):
            t0 = time.perf_counter()
            sink.apply_batch(batch, rep + 2)
            reps.append(time.perf_counter() - t0)
        touched = (
            batch.withColumn("_b", F.expr(bucket_expr) if bucket_expr
                             else F.pmod(F.xxhash64("key"), F.lit(BUCKETS)))
            .select("_b").distinct().count()
        )
        row = {
            "sf_dir": sf_dir, "mode": mode, "events": n,
            "mirror_rows": mirror_rows, "batch_rows": BATCH_ROWS,
            "touched_buckets": touched, "num_buckets": BUCKETS,
            "batch_sec_min": round(min(reps), 3),
            "batch_sec_all": [round(r, 3) for r in reps],
        }
        print(json.dumps(row), flush=True)
        out.append(row)
    return out


def main() -> None:
    spark = get_spark(
        "merge_scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="merge_scale_")
    try:
        for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            measure(spark, sf_dir, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
