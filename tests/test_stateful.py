"""Custom stateful operator: state persists across micro-batches via the
state store; running totals accumulate batch over batch."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.streaming.stateful import keyed_running_state

SCHEMA = "op string, key long, event_id long, ts timestamp, value double"


def mk_batch(spark, rows, path):
    spark.createDataFrame(rows, SCHEMA).write.mode("append").parquet(path)


def drain(spark, src, ckpt, out_dir):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = keyed_running_state(stream)

    def sink(batch, batch_id):
        batch.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(out_dir)

    q = (
        out.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def latest_state(spark, out_dir):
    df = spark.read.parquet(out_dir)
    from pyspark.sql import Window

    w = Window.partitionBy("key").orderBy(F.col("batch_id").desc())
    rows = (
        df.withColumn("_rn", F.row_number().over(w)).filter("_rn = 1").drop("_rn").collect()
    )
    return {r["key"]: r for r in rows}


def test_first_seen_processor_semantics_with_stubbed_state():
    """The transformWithState runtime needs google.protobuf (absent in
    this container — declared), so the processor's semantics are pinned
    directly: lowest event_id wins within a call, later calls for a
    seen key emit nothing."""
    import pandas as pd

    from postgres_opensearch_cdc_spark.streaming.stateful import (
        make_first_seen_processor,
    )

    class StubState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def update(self, v):
            self._v = v

    class StubHandle:
        def getValueState(self, name, schema, ttl=None):
            return StubState()

    proc = make_first_seen_processor()
    proc.init(StubHandle())
    batch = [
        pd.DataFrame({"event_id": [5, 2], "value": [50.0, 20.0]}),
        pd.DataFrame({"event_id": [1], "value": [10.0]}),
    ]
    out = list(proc.handleInputRows((1,), iter(batch), None))
    assert len(out) == 1 and out[0]["event_id"].iloc[0] == 1
    # key now seen: a later micro-batch emits nothing
    again = list(
        proc.handleInputRows(
            (1,), iter([pd.DataFrame({"event_id": [9], "value": [9.0]})]), None
        )
    )
    assert again == []
    # empty input for an unseen key emits nothing and does not mark seen
    proc2 = make_first_seen_processor()
    proc2.init(StubHandle())
    assert list(proc2.handleInputRows((2,), iter([pd.DataFrame({"event_id": [], "value": []})]), None)) == []
    emitted = list(
        proc2.handleInputRows(
            (2,), iter([pd.DataFrame({"event_id": [7], "value": [7.0]})]), None
        )
    )
    assert len(emitted) == 1


def test_first_seen_dedup_suppresses_across_batches(spark, tmp_path):
    """transformWithStateInPandas path: the first event per key is
    emitted once; in-batch and cross-batch duplicates are suppressed by
    the ValueState."""
    import pytest

    from postgres_opensearch_cdc_spark.streaming.stateful import (
        first_seen_dedup,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        pytest.skip("google.protobuf unavailable: transformWithState runtime absent")

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = datetime(2024, 1, 1)

    def drain_dedup():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        deduped = first_seen_dedup(stream)

        def sink(batch, batch_id):
            batch.write.mode("append").parquet(out)

        q = (
            deduped.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # batch 1: key 1 twice (event 2 then 1 — lowest id wins), key 2 once
    mk_batch(spark, [("c", 1, 2, t, 20.0), ("c", 1, 1, t, 10.0), ("c", 2, 3, t, 1.0)], src)
    drain_dedup()
    got = {r["key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {1, 2}
    assert got[1]["event_id"] == 1 and got[1]["value"] == 10.0

    # batch 2: duplicate of key 1 (suppressed by state) + new key 3
    mk_batch(spark, [("u", 1, 4, t, 99.0), ("c", 3, 5, t, 7.0)], src)
    drain_dedup()
    rows = spark.read.parquet(out).collect()
    assert len(rows) == 3  # no re-emission for key 1
    got = {r["key"]: r for r in rows}
    assert got[1]["event_id"] == 1 and got[3]["event_id"] == 5


def test_state_accumulates_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    t = datetime(2024, 1, 1)

    mk_batch(spark, [("c", 1, 1, t, 10.0), ("u", 1, 2, t, 5.0), ("c", 2, 3, t, 1.0)], src)
    drain(spark, src, ckpt, out)
    s1 = latest_state(spark, out)
    assert s1[1]["cnt"] == 2 and s1[1]["total"] == 15.0 and s1[1]["last_op"] == "u"
    assert s1[2]["cnt"] == 1

    mk_batch(spark, [("d", 1, 4, t, 2.0)], src)
    drain(spark, src, ckpt, out)
    s2 = latest_state(spark, out)
    # state carried across restarts/batches: key 1 now cnt=3 total=17
    assert s2[1]["cnt"] == 3 and s2[1]["total"] == 17.0 and s2[1]["last_op"] == "d"
    # key 2 untouched by batch 2 → still the batch-1 emission
    assert s2[2]["cnt"] == 1
