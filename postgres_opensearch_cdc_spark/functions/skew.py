"""Skew-mitigation operators (SURVEY §4 / task brief: "skewed keys →
salting or AQE skew-join"). AQE's skew-join splitting (enabled in
session.py) covers sort-merge joins automatically; these are the
explicit forms for aggregations and broadcast-averse joins where a
single hot key would otherwise pin one reducer.

All salts are deterministic (hash-derived, never random) so results are
reproducible and replay-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salted_count(
    df: DataFrame,
    key_cols: list[str],
    salt_buckets: int = 16,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe count: groupBy(key, salt) partial → groupBy
    (key) final. A key holding 50% of all rows spreads over
    ``salt_buckets`` reducers in phase 1; phase 2 merges tiny partials.

    Note Spark's built-in partial aggregation already gives this for
    count/sum when upstream partitioning is uniform; explicit salting is
    for when rows arrive pre-partitioned BY the hot key (e.g. straight
    off a keyed shuffle) and map-side combine can't help.
    """
    salt_col = F.pmod(
        F.xxhash64(F.col(salt_source) if salt_source else F.monotonically_increasing_id()),
        F.lit(salt_buckets),
    )
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(*key_cols, "_salt")
        .agg(F.count(F.lit(1)).alias("_partial_cnt"))
    )
    return (
        partial.groupBy(*key_cols)
        .agg(F.sum("_partial_cnt").cast("long").alias("cnt"))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 8,
    big_salt_source: str | None = None,
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key deterministically,
    replicate the small side once per salt bucket, join on
    (key, salt). The hot key's rows land on ``salt_buckets`` reducers
    instead of one. Inner-join semantics.

    Cost: small side × salt_buckets rows (acceptable precisely when the
    small side is small — otherwise AQE skew-join on the sort-merge path
    is the right tool).
    """
    src = F.col(big_salt_source) if big_salt_source else F.monotonically_increasing_id()
    big_salted = big.withColumn("_salt", F.pmod(F.xxhash64(src), F.lit(salt_buckets)))
    small_replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    joined = big_salted.join(small_replicated, [on, "_salt"], "inner")
    return joined.drop("_salt")
