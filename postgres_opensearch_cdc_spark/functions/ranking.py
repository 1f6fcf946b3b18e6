"""Distributed global ordering primitives: exact running totals and
global ranks WITHOUT a single-partition window.

A ``Window.orderBy(...)`` with no partition spec funnels the full
input through one task — the plan-shape the surface-wide test
`test_plans.py::test_no_python_udfs_anywhere_in_query_surface` bans
over unbounded input. These helpers realize the same exact semantics
with the classic two-phase construction:

1. ``repartitionByRange`` on the order key — a single range shuffle;
   partition i's rows all precede partition i+1's in the total order.
2. Per-partition running totals via a PARTITIONED window (parallel).
3. Per-partition totals are aggregated (one row per partition —
   bounded by ``spark.sql.shuffle.partitions``), collected, turned
   into exclusive prefix offsets on the driver, and broadcast back.

The driver-side collect is #partitions rows — the same bounded-list
pattern as the span store's touched buckets, NOT a data collect. At
100 TB: one range shuffle (which a global sort would need anyway),
everything else map-side or group-cardinality-sized.

Reference behavior: ES's ``variable_width_histogram`` /
``bucket_count_ks_test`` and SQL NTILE/CUME_DIST consumers (see
queries/querydsl3.py, querydsl_aggs2.py, windows_pivot.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def running_totals(df: DataFrame, order_cols: list[str],
                   sum_cols: list[str]) -> tuple[DataFrame, dict]:
    """Exact global running totals of ``sum_cols`` (long-typed) under
    the total order of ``order_cols``: returns (frame with added
    ``cum_<c>`` columns, {c: grand_total}). Rows must be UNIQUE under
    ``order_cols`` (pre-aggregate ties first — that is also what makes
    tie semantics explicit instead of engine-dependent)."""
    spark = df.sparkSession
    tagged = (
        df.repartitionByRange(*[F.col(c) for c in order_cols])
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # freeze one partitioning for
        # both the offsets pass and the ranked output
    )
    per = sorted(
        tagged.groupBy("_pid").agg(
            *[F.sum(c).alias(c) for c in sum_cols]
        ).collect(),
        key=lambda r: r["_pid"],
    )  # bounded: one row per shuffle partition
    offsets, acc = [], {c: 0 for c in sum_cols}
    for r in per:
        offsets.append((r["_pid"], *[acc[c] for c in sum_cols]))
        for c in sum_cols:
            acc[c] += r[c] or 0
    off_schema = ", ".join(
        ["_pid int"] + [f"_off_{c} long" for c in sum_cols]
    )
    off = spark.createDataFrame(offsets or [], off_schema)
    w = (
        Window.partitionBy("_pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = tagged.join(F.broadcast(off), "_pid")
    for c in sum_cols:
        out = out.withColumn(
            f"cum_{c}", F.sum(c).over(w) + F.col(f"_off_{c}")
        )
    return out.drop("_pid", *[f"_off_{c}" for c in sum_cols]), acc


def with_global_rank(df: DataFrame, order_cols: list[str],
                     rank_col: str = "_r") -> tuple[DataFrame, int]:
    """Exact 1-based global rank under ``order_cols`` (which must be a
    unique ordering): returns (frame + rank column, total row count).
    row_number semantics without the single-partition sort."""
    tagged = df.withColumn("_one", F.lit(1).cast("long"))
    out, totals = running_totals(tagged, order_cols, ["_one"])
    return (
        out.withColumnRenamed("cum__one", rank_col).drop("_one"),
        totals["_one"],
    )


def ntile_expr(rank_col: str, n: int, k: int) -> Column:
    """SQL NTILE(k) from a precomputed global-rank COLUMN over n rows
    — bucket sizes differ by at most one, larger buckets first (the
    ANSI definition both Spark and DuckDB implement). Integer
    arithmetic via ``div`` so it is exact at any n."""
    q, rem = divmod(n, k)
    if q == 0:  # fewer rows than tiles: bucket = rank
        return F.col(rank_col)
    big = rem * (q + 1)
    return (
        F.when(F.col(rank_col) <= big,
               F.expr(f"1 + (`{rank_col}` - 1) div {q + 1}"))
        .otherwise(
            F.expr(f"{rem} + 1 + (`{rank_col}` - {big} - 1) div {q}")
        )
    )
