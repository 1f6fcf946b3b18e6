"""Operational parity layer (SURVEY §7.2 phase 5): mirror DDL bootstrap,
retention/lifecycle, topic routing, and stream observability — the
reference's setup.sh / ILM / consumer-stats behaviors in Spark terms.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T
from pyspark.sql.streaming import StreamingQueryListener


def bootstrap_mirror(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    partition_cols: list[str] | None = None,
) -> None:
    """W4 index DDL bootstrap (reference setup.sh:128-145): create the
    empty keyed mirror with its explicit schema up front — the Spark
    analog of index creation with explicit mappings. Partition columns
    (typically a date or key bucket) are the scale lever: retention
    becomes partition drop, merges touch only affected partitions."""
    empty = spark.createDataFrame([], schema)
    writer = empty.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def retention_job(
    spark: SparkSession,
    path: str,
    ts_col: str,
    keep_days: int,
    now: str,
) -> tuple[int, int]:
    """W6 lifecycle (reference TDD :572-629 hot/warm/delete): drop rows
    older than the retention horizon. Returns (kept, dropped).

    On date-partitioned storage this compiles to partition pruning — the
    rewrite touches only expired partitions; with a table format
    (Delta/Iceberg) it is a metadata-only partition drop. ``now`` is a
    parameter, not a clock read, so runs are reproducible."""
    df = spark.read.parquet(path)
    cutoff = F.lit(now).cast("timestamp") - F.expr(f"INTERVAL {keep_days} DAYS")
    keep = df.filter(F.col(ts_col) >= cutoff)
    drop_cnt = df.filter(F.col(ts_col) < cutoff).count()
    keep_cnt = keep.count()
    keep.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)
    return keep_cnt, drop_cnt


def bootstrap_bucketed_mirror(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort_col: str | None = None,
) -> None:
    """Bucketed mirror bootstrap — the co-located-join scale lever: two
    tables bucketed on the same key with the same bucket count join with
    NO exchange on either side (verified in tests/test_bucketing.py).
    For the CDC mirror, bucketing by PK also confines each merge to
    matching buckets. This is the saveAsTable path (bucket metadata
    lives in the session catalog); plain-path parquet writes cannot
    carry bucket info."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def route_topics(
    changes: DataFrame,
    topic_to_table: dict[str, str],
    topic_col: str = "topic",
) -> DataFrame:
    """T5 topic→index routing (reference consumer.py:17-21,57): static
    map lookup adding a 'target_table' column; unknown topics get null
    (→ quarantine branch, matching the consumer's skip-on-unknown)."""
    mapping = F.create_map(*[F.lit(x) for kv in topic_to_table.items() for x in kv])
    return changes.withColumn("target_table", mapping[F.col(topic_col)])


@dataclass
class OpStatsListener(StreamingQueryListener):
    """T9 run-stats (reference consumer.py:48,108-117) for the streaming
    path: collects the per-batch observe() metrics emitted by
    start_mirror_stream ('cdc_stats': events, deletes)."""

    batches: list[dict] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:  # noqa: N802
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        row = event.progress.observedMetrics.get("cdc_stats")
        if row is not None:
            self.batches.append(row.asDict())

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    @property
    def totals(self) -> dict:
        return {
            "events": sum(b.get("events", 0) for b in self.batches),
            "deletes": sum(b.get("deletes", 0) or 0 for b in self.batches),
        }
