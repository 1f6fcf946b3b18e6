"""Ops layer: bootstrap DDL, retention, routing, stream observability."""

from __future__ import annotations

import json
import os
import time
from datetime import datetime

from pyspark.sql import functions as F, types as T

from postgres_opensearch_cdc_spark.ops import (
    OpStatsListener,
    bootstrap_mirror,
    retention_job,
    route_topics,
)


def test_bootstrap_creates_empty_typed_mirror(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("status", T.StringType())]
    )
    path = str(tmp_path / "mirror")
    bootstrap_mirror(spark, path, schema)
    df = spark.read.parquet(path)
    assert df.count() == 0
    assert df.schema == schema


def test_retention_drops_expired_rows(spark, tmp_path):
    path = str(tmp_path / "tbl")
    rows = [
        (1, datetime(2024, 1, 1)),
        (2, datetime(2024, 3, 1)),
        (3, datetime(2024, 3, 25)),
    ]
    spark.createDataFrame(rows, "id long, created_at timestamp").write.parquet(path)
    kept, dropped = retention_job(spark, path, "created_at", keep_days=90, now="2024-04-01 00:00:00")
    assert (kept, dropped) == (2, 1)
    assert {r["id"] for r in spark.read.parquet(path).collect()} == {2, 3}


def test_route_topics_maps_and_nulls_unknown(spark):
    df = spark.createDataFrame(
        [("postgres.public.card",), ("postgres.public.unknown_t",)], "topic string"
    )
    out = route_topics(df, {"postgres.public.card": "card"})
    rows = {r["topic"]: r["target_table"] for r in out.collect()}
    assert rows["postgres.public.card"] == "card"
    assert rows["postgres.public.unknown_t"] is None


def test_op_stats_listener_collects_observed_metrics(spark, tmp_path):
    from postgres_opensearch_cdc_spark.sources.changelog import file_changelog_stream
    from postgres_opensearch_cdc_spark.streaming.apply import MirrorSink, start_mirror_stream

    row_schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("status", T.StringType())]
    )
    src = str(tmp_path / "log")
    os.makedirs(src)
    events = [
        {"op": "c", "after": {"id": 1, "status": "A"}, "offset": 1},
        {"op": "d", "before": {"id": 1, "status": "A"}, "offset": 2},
    ]
    with open(os.path.join(src, "b.json"), "w") as f:
        f.write("\n".join(json.dumps(e) for e in events))

    listener = OpStatsListener()
    spark.streams.addListener(listener)
    try:
        stream = file_changelog_stream(spark, src, row_schema)
        flat = stream.select(
            "op",
            F.coalesce(F.col("after.id"), F.col("before.id")).alias("id"),
            F.col("after.status").alias("status"),
            "offset",
        )
        sink = MirrorSink(
            path=str(tmp_path / "mirror"), key_cols=["id"], seq_cols=["offset"]
        )
        q = start_mirror_stream(flat, sink, str(tmp_path / "ckpt"))
        q.awaitTermination(120)
        # listener delivery is async — poll briefly
        for _ in range(50):
            if listener.batches:
                break
            time.sleep(0.2)
        assert listener.totals["events"] == 2
        assert listener.totals["deletes"] == 1
    finally:
        spark.streams.removeListener(listener)
