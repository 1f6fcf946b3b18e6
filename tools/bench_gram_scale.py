"""Measure the two Gram-matrix strategies (SCALE §27).

Compares the shipped Arrow-partial shape (mapInPandas: one d×d
float64 accumulator per partition, shuffle = p·d²/2 rows) against the
fully-declarative alternative (posexplode + self-join on vec_id +
groupBy(i,j): shuffle = N·d rows twice, N·d² join output into partial
agg) on the sf0.1 embeddings table at 1×/4×/16× row multipliers.

Usage: python tools/bench_gram_scale.py [sf_dir]
Prints one JSON line per (strategy, multiplier).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline11 import (
    EMB_DIM,
    gram_upper,
)
from postgres_opensearch_cdc_spark.session import get_spark


def gram_declarative(emb: DataFrame) -> DataFrame:
    """The built-ins-only alternative: explode each vector to
    (vec_id, i, xi), self-join on vec_id, groupBy (i, j). Correct and
    fully codegen, but the join materializes N·d² product rows before
    the partial agg — the shape the Arrow partial avoids."""
    ex = emb.select(
        "vec_id",
        F.posexplode(
            F.transform("embedding", lambda x: x.cast("double"))
        ).alias("i", "x"),
    )
    a = ex.select("vec_id", F.col("i").alias("i"), F.col("x").alias("xa"))
    b = ex.select("vec_id", F.col("i").alias("j"), F.col("x").alias("xb"))
    return (
        a.join(b, "vec_id")
        .filter(F.col("j") >= F.col("i"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("xa") * F.col("xb")).alias("gram_raw"))
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("bench-gram", shuffle_partitions=32)
    base = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n_base = base.count()

    for mult in (1, 4, 16):
        emb = base
        if mult > 1:
            emb = base.crossJoin(
                F.broadcast(
                    spark.range(mult).select(F.col("id").alias("rep"))
                )
            ).drop("rep")
        emb = emb.localCheckpoint(eager=True)
        for label, fn in (
            ("arrow_partial", gram_upper),
            ("declarative_join", gram_declarative),
        ):
            t0 = time.monotonic()
            rows = fn(emb).count()
            dt = time.monotonic() - t0
            print(
                json.dumps(
                    {
                        "strategy": label,
                        "rows_in": n_base * mult,
                        "mult": mult,
                        "gram_rows": rows,
                        "dim": EMB_DIM,
                        "sec": round(dt, 3),
                    }
                )
            )
        emb.unpersist()


if __name__ == "__main__":
    main()
