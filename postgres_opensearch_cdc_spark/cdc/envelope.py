"""CDC change-event envelope: schema, parser, and test-changelog synthesis.

The reference consumes Debezium envelopes ``{op, before, after, ts_ms}``
with op ∈ {r, c, u, d} (reference consumer.py:53-100, 74-93) and the DMS
variant ``{data, metadata{operation, schema-name, table-name, ...}}``
(reference aurora-postgresql-cdc-opensearchtdd.md:1601-1622). Both are
"row images + an op code + a per-key ordering token"; that is the
abstraction this module implements.

Spark-first mapping (SURVEY §1.1): the envelope is a typed StructType and
parsing is ``from_json`` in PERMISSIVE mode, so corrupt events land in a
``_corrupt_record`` quarantine column instead of stalling the pipeline —
the reference's per-record try/except → DLQ behavior (consumer.py:102-103,
TDD :388-392) expressed declaratively.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T

# Op codes, reference consumer.py:74-93 (Debezium) / TDD :427-444 (DMS).
OP_SNAPSHOT = "r"
OP_CREATE = "c"
OP_UPDATE = "u"
OP_DELETE = "d"
UPSERT_OPS = (OP_SNAPSHOT, OP_CREATE, OP_UPDATE)

CORRUPT_COL = "_corrupt_record"

DMS_TO_DEBEZIUM_OP = {
    "load": OP_SNAPSHOT,
    "insert": OP_CREATE,
    "update": OP_UPDATE,
    "delete": OP_DELETE,
}


def envelope_schema(row_schema: T.StructType, include_corrupt: bool = True) -> T.StructType:
    """Debezium-shaped envelope for a given row schema (FIXTURES.md §2).

    ``before`` carries the full old image (REPLICA IDENTITY FULL,
    reference setup.sh:59-65); ``after`` the full new image; ``offset`` is
    the per-partition monotonic ordering token (Kafka offset / Kinesis
    sequence / LSN) that per-key last-wins compaction orders by (ST2).
    """
    fields = [
        T.StructField("op", T.StringType()),
        T.StructField("before", row_schema),
        T.StructField("after", row_schema),
        T.StructField("ts_ms", T.LongType()),
        T.StructField(
            "source",
            T.StructType(
                [
                    T.StructField("schema", T.StringType()),
                    T.StructField("table", T.StringType()),
                    T.StructField("lsn", T.LongType()),
                ]
            ),
        ),
        T.StructField("offset", T.LongType()),
    ]
    if include_corrupt:
        fields.append(T.StructField(CORRUPT_COL, T.StringType()))
    return T.StructType(fields)


def parse_envelopes(
    raw: DataFrame, row_schema: T.StructType, value_col: str = "value"
) -> tuple[DataFrame, DataFrame]:
    """Parse raw JSON change events into typed envelopes.

    Returns ``(good, quarantine)``. Equivalent of the reference's
    per-message ``json.loads`` (consumer.py:40) plus its DLQ branch
    (consumer.py:102-103): PERMISSIVE mode nulls out bad records and
    captures the raw text in ``_corrupt_record`` so poison events never
    block the stream (ST7). Both outputs are lazy single-pass projections
    — no shuffle, fully pipelined with whatever sink follows.
    """
    schema = envelope_schema(row_schema, include_corrupt=True)
    parsed = raw.withColumn(
        "env",
        F.from_json(
            F.col(value_col).cast("string"),
            schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ),
    )
    # A record is corrupt if from_json couldn't parse it (env null) or it
    # parsed but carries no op (half-formed envelope).
    bad = parsed.filter(
        F.col("env").isNull()
        | F.col(f"env.{CORRUPT_COL}").isNotNull()
        | F.col("env.op").isNull()
    ).select(
        F.col(value_col).cast("string").alias("raw"),
        F.current_timestamp().alias("quarantined_at"),
    )
    good = parsed.filter(
        F.col("env").isNotNull()
        & F.col(f"env.{CORRUPT_COL}").isNull()
        & F.col("env.op").isNotNull()
    ).select("env.op", "env.before", "env.after", "env.ts_ms", "env.source", "env.offset")
    return good, bad


def normalize_dms_op(op_col: Column) -> Column:
    """Map DMS operation names (TDD :1601-1622) onto Debezium op codes so
    one apply engine serves both envelope dialects (T4)."""
    mapping = F.create_map(
        *[F.lit(x) for kv in DMS_TO_DEBEZIUM_OP.items() for x in kv]
    )
    return F.coalesce(mapping[F.lower(op_col)], op_col)


def index_name(schema_col: Column, table_col: Column) -> Column:
    """Index/mirror-name derivation: lower(schema + "_" + table) with dots
    replaced (reference TDD :417-421, operator T6)."""
    return F.regexp_replace(
        F.lower(F.concat_ws("_", schema_col, table_col)), r"\.", "_"
    )


def primary_key(df_cols: list[str], id_col: str = "id") -> Column:
    """PK extraction with hash fallback (T7): ``data['id']`` when present,
    else a hash of the whole row (reference consumer.py:62; TDD :447-456
    ``extractPrimaryKey`` / ``data.hashCode()``)."""
    if id_col in df_cols:
        return F.col(id_col).cast("string")
    return F.xxhash64(F.to_json(F.struct(*[F.col(c) for c in df_cols]))).cast("string")


def events_as_changelog(events: DataFrame) -> DataFrame:
    """Deterministically reinterpret the driver ``events`` table as a CDC
    changelog keyed by ``user_id`` — the fixture pattern FIXTURES.md §3
    prescribes ("treat event_type as op-code analog").

    Mapping: signup → c, error → d, everything else → u. Ordering token =
    (ts, event_id), which is monotone per key in the fixture. The row
    image is the event payload itself.
    """
    op = (
        F.when(F.col("event_type") == "signup", F.lit(OP_CREATE))
        .when(F.col("event_type") == "error", F.lit(OP_DELETE))
        .otherwise(F.lit(OP_UPDATE))
    )
    return events.select(
        op.alias("op"),
        F.col("user_id").alias("key"),
        F.col("event_id"),
        F.col("ts"),
        F.col("event_type"),
        F.col("value"),
        F.col("props"),
    )
