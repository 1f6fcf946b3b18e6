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
