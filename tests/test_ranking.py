"""Distributed global-ordering primitives (functions/ranking.py):
exact equivalence against the single-partition window built-ins they
replace, across the edge cases the two-phase construction must get
right (empty input, fewer rows than partitions, n < k tiles, uneven
tile splits)."""

from __future__ import annotations

import random

from pyspark.sql import Window, functions as F

from postgres_opensearch_cdc_spark.functions.ranking import (
    ntile_expr,
    running_totals,
    with_global_rank,
)


def _rand_df(spark, n, seed):
    rng = random.Random(seed)
    rows = [(i, rng.randint(0, 50), rng.randint(0, 5)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long, w long")


def test_running_totals_match_global_window(spark):
    df = _rand_df(spark, 500, 7)
    got, totals = running_totals(df, ["v", "id"], ["w"])
    w = Window.orderBy("v", "id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = {
        (r["id"], r["cum_w"])
        for r in df.select("id", F.sum("w").over(w).alias("cum_w")).collect()
    }
    assert {(r["id"], r["cum_w"]) for r in got.collect()} == want
    assert totals["w"] == sum(r["w"] for r in df.collect())


def test_running_totals_fewer_rows_than_partitions(spark):
    # 3 rows under 32 shuffle partitions: most range partitions empty
    df = spark.createDataFrame(
        [(1, 10, 2), (2, 5, 3), (3, 10, 4)], "id long, v long, w long"
    )
    got, totals = running_totals(df, ["v", "id"], ["w"])
    rows = {r["id"]: r["cum_w"] for r in got.collect()}
    assert rows == {2: 3, 1: 5, 3: 9}  # order: (5,2), (10,1), (10,3)
    assert totals["w"] == 9


def test_running_totals_empty_and_single(spark):
    empty = spark.createDataFrame([], "id long, v long, w long")
    got, totals = running_totals(empty, ["v"], ["w"])
    assert got.count() == 0 and totals["w"] == 0
    one = spark.createDataFrame([(9, 1, 7)], "id long, v long, w long")
    got, totals = running_totals(one, ["v"], ["w"])
    assert [(r["id"], r["cum_w"]) for r in got.collect()] == [(9, 7)]
    assert totals["w"] == 7


def test_global_rank_matches_row_number(spark):
    df = _rand_df(spark, 300, 11)
    ranked, n = with_global_rank(df, ["v", "id"])
    assert n == 300
    w = Window.orderBy("v", "id")
    want = {
        (r["id"], r["rn"])
        for r in df.select("id", F.row_number().over(w).alias("rn")).collect()
    }
    assert {(r["id"], r["_r"]) for r in ranked.collect()} == want


def test_ntile_expr_matches_builtin(spark):
    w = Window.orderBy("v", "id")
    for n_rows, k, seed in ((100, 4, 1), (103, 4, 2), (7, 3, 3),
                            (2, 5, 4), (64, 8, 5)):
        df = _rand_df(spark, n_rows, seed)
        ranked, n = with_global_rank(df, ["v", "id"])
        got = {
            (r["id"], r["t"])
            for r in ranked.select(
                "id", ntile_expr("_r", n, k).cast("int").alias("t")
            ).collect()
        }
        want = {
            (r["id"], r["t"])
            for r in df.select(
                "id", F.ntile(k).over(w).alias("t")
            ).collect()
        }
        assert got == want, f"ntile mismatch at n={n_rows}, k={k}"
