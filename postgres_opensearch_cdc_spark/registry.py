"""Table registry: explicit StructType per table + loaders.

The reference's source side is fixed relational DDL with required PKs
(reference aurora-postgresql-cdc-opensearchtdd.md:170-187); its sink side
is dynamically mapped (setup.sh:104-107, TDD :516-570). Spark's idiomatic
equivalent of the fixed side is an explicit StructType registry — schemas
declared up front so scans prune columns and never pay inference.

The registry covers (a) the driver testdata tables (TESTDATA.md) that all
correctness/bench queries run over, and (b) the reference's own domain
tables (FIXTURES.md §1, derived from create-sample-data.sh:8-64) used by
the CDC-apply unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md / FIXTURES.md §3)
# ---------------------------------------------------------------------------

TESTDATA_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            # the generator has shipped ts as TIMESTAMP(MICROS) in some
            # rounds and TIMESTAMP(NANOS) in others; load_table sniffs the
            # parquet footer and branches (nanos arrive as int64 via the
            # legacy nanosAsLong path and are converted to micros)
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TESTDATA_TABLES = list(TESTDATA_SCHEMAS)

# ---------------------------------------------------------------------------
# Reference domain tables (FIXTURES.md §1; reference create-sample-data.sh:8-64)
# Used by CDC-apply unit tests; NUMERIC → DecimalType(12,2) per SURVEY §1.3
# (the reference coerces to double and documents the loss, TDD :714 — we
# keep a compat flag in cdc.apply for that behavior).
# ---------------------------------------------------------------------------

REFERENCE_SCHEMAS: dict[str, T.StructType] = {
    "card": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("version", T.IntegerType()),
            T.StructField("product_id", T.LongType()),
            T.StructField("primary_account_number", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("fulfillment_status", T.StringType()),
            T.StructField("card_type", T.StringType()),
            T.StructField("card_network", T.StringType()),
            T.StructField("physical_card_activated", T.BooleanType()),
            T.StructField("pos_payment_enabled", T.BooleanType()),
            T.StructField("sub_status", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
            T.StructField("updated_at", T.TimestampType()),
        ]
    ),
    "authorize_transaction": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("version", T.IntegerType()),
            T.StructField("savings_account_id", T.LongType()),
            T.StructField("office_id", T.LongType()),
            T.StructField("transaction_date", T.DateType()),
            T.StructField("amount", T.DecimalType(12, 2)),
            T.StructField("created_at", T.TimestampType()),
            T.StructField("is_manual", T.BooleanType()),
            T.StructField("is_active", T.BooleanType()),
            T.StructField("pending_amount", T.DecimalType(12, 2)),
            T.StructField("transaction_type", T.StringType()),
            T.StructField("reference", T.StringType()),
        ]
    ),
    "card_authorization": T.StructType(
        [
            T.StructField("id", T.LongType(), False),
            T.StructField("version", T.IntegerType()),
            T.StructField("card_id", T.LongType()),
            T.StructField("auth_type", T.StringType()),
            T.StructField("amount", T.DecimalType(12, 2)),
            T.StructField("currency", T.StringType()),
            T.StructField("local_currency", T.StringType()),
            T.StructField("status", T.StringType()),
            T.StructField("created_at", T.TimestampType()),
            T.StructField("transaction_type", T.StringType()),
        ]
    ),
}


# footer sniff is one small metadata read per path; cache it so repeated
# load_table calls (every query touches events) don't re-open the footer
_EVENTS_TS_IS_NANOS: dict[str, bool] = {}


def _events_ts_is_nanos(path: str) -> bool:
    """True when events.ts is physically TIMESTAMP(NANOS) (or a bare int64
    of nanos) in the parquet footer — the one layout Spark can only read
    via the legacy nanosAsLong path. TIMESTAMP(MICROS/MILLIS) reads
    natively as TimestampType."""
    cached = _EVENTS_TS_IS_NANOS.get(path)
    if cached is None:
        import pyarrow.dataset as ds

        t = ds.dataset(path, format="parquet").schema.field("ts").type
        cached = getattr(t, "unit", None) == "ns" or str(t) == "int64"
        _EVENTS_TS_IS_NANOS[path] = cached
    return cached


def _scan_splits(path: str, max_partition_bytes: int) -> int:
    """How many input splits a parquet scan of ``path`` yields, from the
    filesystem alone (no Spark job): files are split at
    ``maxPartitionBytes`` boundaries, so a directory contributes at
    least one split per file."""
    import math
    import os

    try:
        if os.path.isfile(path):
            sizes = [os.path.getsize(path)]
        else:
            sizes = [
                e.stat().st_size
                for e in os.scandir(path)
                if e.is_file() and not e.name.startswith(("_", "."))
            ]
    except OSError:
        return 1 << 30  # unknown layout: assume wide, never repartition
    return max(1, sum(
        max(1, math.ceil(s / max_partition_bytes)) for s in sizes
    ))


def spread_scan(spark: SparkSession, df: DataFrame, path: str) -> DataFrame:
    """Round-robin repartition a scan that would otherwise
    under-parallelize — the optimization guide's §2.5 fix for "one huge
    unsplittable file": the sandbox fixtures are single-row-group
    parquet files, so every scan stage is ONE task and all scan-stage
    compute (tokenization, n-gram transforms, hashing — the surface's
    deliberately scan-heavy design) runs on one core of local[N].

    Scale-adaptive, not a local[32] constant: the repartition fires
    only when the source's split count is below the session's
    parallelism. At 100 TB the input is thousands of splits, the guard
    is false, and the call is a no-op — exactly the behavior a real
    cluster wants (repartitioning well-split input would only add a
    shuffle). Value-neutral: round-robin repartition preserves rows
    (sortBeforeRepartition keeps the assignment deterministic), and
    filters/pruning still push through the Repartition node."""
    par = spark.sparkContext.defaultParallelism
    if par <= 1:
        return df
    mpb_raw = str(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    ).lower().rstrip("b")
    try:
        mpb = int(mpb_raw)
    except ValueError:
        mpb = 134217728
    if _scan_splits(path, mpb) >= par:
        return df
    return df.repartition(par)


def load_table(
    spark: SparkSession, sf_dir: str, name: str, spread: bool = False
) -> DataFrame:
    """Read one testdata table. Explicit schema keeps the scan prunable and
    skips footer-based inference on wide datasets; at 100 TB the same call
    points at a partitioned parquet root and Catalyst handles partition
    pruning from any date/key predicate above it.

    ``spread=True`` marks a COMPUTE-HEAVY consumer (tokenization /
    n-gram / hashing pipelines): it routes through ``spread_scan`` so an
    unsplittable local fixture still uses every core; on well-split
    production input it is a no-op (see spread_scan)."""
    import os as _os
    if _os.environ.get("SPARK_GRAFT_FORCE_SPREAD") == "1":  # experiment hook
        spread = True
    schema = TESTDATA_SCHEMAS.get(name)
    path = f"{sf_dir}/{name}.parquet"
    if name == "events" and _events_ts_is_nanos(path):
        # legacy layout: read raw int64 nanos, then nanos → micros by
        # integer division (never float division: int64 nanos exceed
        # double's 53-bit exact range), matching DuckDB's truncating
        # TIMESTAMP_NS → TIMESTAMP semantics
        from pyspark.sql import functions as F

        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        nanos_schema = T.StructType(
            [
                T.StructField("ts", T.LongType())
                if f.name == "ts"
                else f
                for f in schema.fields
            ]
        )
        df = spark.read.schema(nanos_schema).parquet(path)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return spread_scan(spark, df, path) if spread else df
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    return spread_scan(spark, df, path) if spread else df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register every testdata table as a temp view so the SQL surface
    (spark.sql) works identically to the DataFrame surface."""
    for name in tables or TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
