"""Property-based verification of the two nontrivial derived operators:

- asof_join vs a brute-force python reference over arbitrary timelines
- incremental (±1 delta) aggregate maintenance vs a sequential
  interpreter over arbitrary changelogs

Both must match for ANY generated input, not just the fixtures."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from postgres_opensearch_cdc_spark.functions.asof import asof_join

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from postgres_opensearch_cdc_spark.session import get_spark

        _spark = get_spark("tests", shuffle_partitions=8)
    return _spark


BASE = datetime(2024, 1, 1)

left_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=1, max_size=12
)
right_rows = st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 50)), min_size=0, max_size=12
)


def brute_force_asof(lrows, rrows):
    out = {}
    for i, (k, lt) in enumerate(lrows):
        best = None
        for j, (rk, rt) in enumerate(rrows):
            if rk == k and rt <= lt:
                # latest ts wins; ties among right rows -> larger rid wins
                if best is None or (rt, j) > (rrows[best][1], best):
                    best = j
        out[i] = best
    return out


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(lrows=left_rows, rrows=right_rows)
def test_asof_matches_brute_force(lrows, rrows):
    spark = _get_spark()
    left = spark.createDataFrame(
        [(k, BASE + timedelta(minutes=t), i) for i, (k, t) in enumerate(lrows)],
        "k long, ts timestamp, lid long",
    )
    right = spark.createDataFrame(
        [(k, BASE + timedelta(minutes=t), j) for j, (k, t) in enumerate(rrows)],
        "k long, ts timestamp, rid long",
    ) if rrows else spark.createDataFrame([], "k long, ts timestamp, rid long")
    got = {
        r["lid"]: r["rid"]
        for r in asof_join(left, right, ["k"], "ts", ["rid"], seq_col="rid").collect()
    }
    expected = {
        lid: (None if j is None else j) for lid, j in brute_force_asof(lrows, rrows).items()
    }
    assert got == expected


ops = st.sampled_from(["c", "u", "d"])
states = st.sampled_from(["A", "B", "C"])
changelog = st.lists(
    st.tuples(ops, st.integers(1, 4), states), min_size=1, max_size=25
)


def interpreter_distribution(seq):
    mirror: dict = {}
    for op, key, state in seq:
        if op == "d":
            mirror.pop(key, None)
        else:
            mirror[key] = state
    dist: dict = {}
    for s in mirror.values():
        dist[s] = dist.get(s, 0) + 1
    return dist


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(seq=changelog)
def test_incremental_agg_matches_interpreter(seq):
    """The ±1 delta maintenance (cdc_queries.cdc_incremental_agg logic)
    over any changelog equals the sequential interpreter's final
    distribution."""
    from pyspark.sql import Window, functions as F

    spark = _get_spark()
    rows = [(op, key, state, i) for i, (op, key, state) in enumerate(seq)]
    log = spark.createDataFrame(rows, "op string, key long, state string, offset long")
    w = Window.partitionBy("key").orderBy("offset")
    enriched = log.select(
        F.when(F.col("op") != "d", F.col("state")).alias("new_state"),
        F.when(F.lag("op").over(w) != "d", F.lag("state").over(w)).alias("prev_state"),
    )
    deltas = (
        enriched.select(
            F.explode(
                F.array(
                    F.struct(F.col("new_state").alias("s"), F.lit(1).alias("d")),
                    F.struct(F.col("prev_state").alias("s"), F.lit(-1).alias("d")),
                )
            ).alias("x")
        )
        .select("x.s", "x.d")
        .filter(F.col("s").isNotNull())
    )
    got = {
        r["s"]: r["cnt"]
        for r in deltas.groupBy("s").agg(F.sum("d").alias("cnt")).filter("cnt > 0").collect()
    }
    assert got == interpreter_distribution(seq)
