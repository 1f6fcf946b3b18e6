"""Index-pattern resolution (Q12 generalized) and range joins.

Q12's hardcoded union becomes a real resolver: a pattern like ``card*``
or ``*transaction*`` (reference DASHBOARD_GUIDE.md:21-24) matches
registered mirror names and the result is a null-filling unionByName —
OpenSearch's multi-index search semantics over Spark views.

The range join is the time-window join the reference's event data
invites (and OpenSearch cannot do at all): pairs of rows whose
timestamps fall within a band. Naive form is an inequality join
(quadratic per key); the scale form bins time so candidates co-locate,
then verifies exactly — same two-phase shape as LSH dedup.
"""

from __future__ import annotations

import fnmatch

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import TESTDATA_TABLES, load_table


def resolve_index_pattern(
    spark: SparkSession,
    sf_dir: str,
    pattern: str,
    catalog: list[str] | None = None,
) -> DataFrame:
    """OpenSearch index-pattern scan: union every mirror whose name
    matches, null-filling missing columns, with a provenance column
    (the _index field OpenSearch attaches). Unmatched pattern raises —
    same as a search against a missing index."""
    names = [t for t in (catalog or TESTDATA_TABLES) if fnmatch.fnmatch(t, pattern)]
    if not names:
        raise ValueError(f"index pattern {pattern!r} matches no registered table")
    out: DataFrame | None = None
    for name in names:
        df = load_table(spark, sf_dir, name).withColumn("_index", F.lit(name))
        out = df if out is None else out.unionByName(df, allowMissingColumns=True)
    return out


def binned_range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    band_seconds: int,
) -> DataFrame:
    """Band/range join: all (left, right) pairs with the same key and
    |left.ts - right.ts| <= band. Two-phase: assign each row to
    band-sized time bins, join on (key, bin) with each left row probing
    its own and both neighbor bins, verify the exact band predicate.
    Candidate set is O(rows × 3 × bin-density) instead of O(n²) per key;
    the bin join is an equi-join Catalyst hash-partitions normally."""
    band = F.lit(band_seconds)
    l_binned = left.withColumn(
        "_bin",
        F.explode(
            F.array(
                (F.unix_timestamp(F.col(left_ts)) / band).cast("long") - 1,
                (F.unix_timestamp(F.col(left_ts)) / band).cast("long"),
                (F.unix_timestamp(F.col(left_ts)) / band).cast("long") + 1,
            )
        ),
    )
    r_binned = right.withColumn(
        "_bin", (F.unix_timestamp(F.col(right_ts)) / band).cast("long")
    )
    joined = l_binned.join(r_binned, [key, "_bin"])
    exact = F.abs(
        F.unix_timestamp(F.col(left_ts)) - F.unix_timestamp(F.col(right_ts))
    ) <= band
    return joined.filter(exact).drop("_bin")


# --- oracle-checked query entries ---------------------------------------


def index_pattern_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern '*n' matches {nation, region}: heterogenous-schema union
    with provenance, counts per source index."""
    df = resolve_index_pattern(spark, sf_dir, "*n")  # nation, region
    return df.groupBy("_index").agg(F.count(F.lit(1)).alias("cnt")).orderBy("_index")


def range_join_same_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of (view → later purchase within 10 min) by the same user —
    the attribution-window join. Binned two-phase implementation; oracle
    is the direct inequality join."""
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id"), F.col("event_id").alias("view_id"), F.col("ts").alias("v_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    pairs = binned_range_join(
        views, purchases, "user_id", "v_ts", "p_ts", band_seconds=600
    )
    return (
        pairs.filter(F.col("p_ts") >= F.col("v_ts"))
        .select("user_id", "view_id", "purchase_id")
        .distinct()
    )


QUERIES = {
    "index_pattern_scan": index_pattern_scan,
    "range_join_same_user": range_join_same_user,
}

ORACLE = {
    "index_pattern_scan": """
        SELECT _index, count(*) AS cnt FROM (
            SELECT 'nation' AS _index FROM nation
            UNION ALL
            SELECT 'region' AS _index FROM region
        ) GROUP BY _index ORDER BY _index
    """,
    "range_join_same_user": """
        SELECT DISTINCT v.user_id, v.event_id AS view_id, p.event_id AS purchase_id
        FROM events v JOIN events p
          ON v.user_id = p.user_id
         AND v.event_type = 'view' AND p.event_type = 'purchase'
         AND p.ts >= v.ts
         -- floor(epoch()) matches Spark unix_timestamp's whole-second
         -- truncation so boundary pairs agree across engines
         AND floor(epoch(p.ts)) - floor(epoch(v.ts)) <= 600
    """,
}
