"""Source helpers: the reference's source matrix (SURVEY §2.1) in Spark
terms.

S1/S3/S4 (Debezium→Kafka / Kinesis): ``kafka_changelog_stream`` is the
production path — Spark has a first-class Kafka source; offsets/groups
map to checkpoints. Tests and self-contained deployments use
``file_changelog_stream`` (JSON-lines changelog directory), which
exercises the identical downstream plan.

S2 (initial snapshot): ``jdbc_snapshot`` — partitioned parallel read,
the classic backfill-then-stream bootstrap.

S5 (micro-batch shaping): trigger + maxOffsetsPerTrigger options are
exposed on the stream builders.

S6 (table include/exclude rules): ``select_tables``.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from postgres_opensearch_cdc_spark.cdc.envelope import envelope_schema


def kafka_stream_options(
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
    fail_on_data_loss: bool = False,
) -> dict[str, str]:
    """The exact option map handed to the Kafka source — split out as a
    pure function so the wiring is golden-testable without a broker
    (reference consumer.py:34-41: subscribed topic list,
    auto_offset_reset='earliest'; the consumer-group/auto-commit model
    maps to the query's checkpointLocation, set on the writer).
    failOnDataLoss=false mirrors the consumer's keep-running posture on
    retention-expired offsets."""
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": ",".join(topics),
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "true" if fail_on_data_loss else "false",
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    return opts


def kafka_changelog_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: list[str],
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S3: Kafka consumer source (reference consumer.py:34-41).
    earliest ≙ auto_offset_reset='earliest'; the consumer group/commit
    model ≙ checkpointLocation on the query. Returns the raw frame
    (key, value, topic, partition, offset, timestamp) for
    parse_kafka_envelopes. Requires the spark-sql-kafka package on the
    cluster (not in the local test container — covered by
    file_changelog_stream plus the captured-envelope golden tests in
    tests/test_sources.py instead)."""
    reader = spark.readStream.format("kafka")
    for k, v in kafka_stream_options(
        bootstrap_servers, topics, starting_offsets, max_offsets_per_trigger
    ).items():
        reader = reader.option(k, v)
    return reader.load()


def parse_kafka_envelopes(
    raw: DataFrame, row_schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Parse the Kafka source frame (binary key/value + topic/partition/
    offset/timestamp) into typed envelopes — the bridge from the raw
    Debezium JSON the reference consumes (JsonConverter,
    schemas.enable=false: bare ``{before, after, source, op, ts_ms}``
    payloads, setup.sh:104-107) to the engine's envelope contract.

    Real Debezium payloads carry no top-level ``offset``; the per-key
    ordering token (ST2) is the Kafka record offset, so the parsed
    frame's ``offset`` coalesces envelope-offset → record offset. The
    Kafka ``topic`` column is kept for T5 routing. Same PERMISSIVE
    quarantine semantics as parse_envelopes. Works identically on a
    static frame of captured messages (golden tests) and the live
    stream — it is a pure projection."""
    from postgres_opensearch_cdc_spark.cdc.envelope import CORRUPT_COL, envelope_schema

    schema = envelope_schema(row_schema, include_corrupt=True)
    parsed = raw.withColumn(
        "env",
        F.from_json(
            F.col("value").cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    is_bad = (
        F.col("env").isNull()
        | F.col(f"env.{CORRUPT_COL}").isNotNull()
        | F.col("env.op").isNull()
    )
    ok = parsed.filter(~is_bad).select(
        "env.op",
        "env.before",
        "env.after",
        "env.ts_ms",
        "env.source",
        F.coalesce(F.col("env.offset"), F.col("offset")).alias("offset"),
        "topic",
    )
    bad = parsed.filter(is_bad).select(
        F.col("value").cast("string").alias("raw"),
        F.current_timestamp().alias("quarantined_at"),
    )
    return ok, bad


def file_changelog_stream(
    spark: SparkSession,
    path: str,
    row_schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based changelog source: a directory of JSON-lines envelope
    files read as a stream. Drop-in replacement for the Kafka source in
    tests and air-gapped runs; same envelope schema, same downstream
    plan. maxFilesPerTrigger ≙ the reference's batch-size 100 /
    window 5 s micro-batch shaping (S5, TDD :325-335)."""
    reader = spark.readStream.schema(
        envelope_schema(row_schema, include_corrupt=True)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.json(path)


def jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """S2: initial snapshot scan (snapshot.mode=initial, reference
    setup.sh:103) as a partitioned-parallel JDBC read. Partitioning on
    the PK range gives num_partitions concurrent range scans — the Spark
    form of DMS ParallelLoadThreads (TDD :273-275)."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound or 0))
            .option("upperBound", str(upper_bound or 1_000_000))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def incremental_jdbc_poll(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_column: str,
    last_watermark: str,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Self-contained incremental source (no Debezium): poll rows with
    watermark_column > last high-water mark — the polling-CDC fallback
    SURVEY §2.1/S1 prescribes when no WAL reader is available. Pushdown
    happens server-side via the dbtable subquery."""
    subquery = (
        f"(SELECT * FROM {table} "
        f"WHERE {watermark_column} > '{last_watermark}') AS incr"
    )
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", subquery)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()


def select_tables(
    catalog: list[str],
    include: list[str] | None = None,
    exclude: list[str] | None = None,
) -> list[str]:
    """S6: DMS-style include/exclude selection rules (TDD :247-270) —
    e.g. include ['public.%'], exclude ['audit_%']. '%' wildcards map to
    fnmatch '*'."""

    def match(name: str, patterns: list[str]) -> bool:
        return any(fnmatch.fnmatch(name, p.replace("%", "*")) for p in patterns)

    selected = [t for t in catalog if include is None or match(t, include)]
    return [t for t in selected if not (exclude and match(t, exclude))]
