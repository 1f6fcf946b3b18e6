"""Scale curves for the batch-6 kernels (SCALE.md §24): HLL register
build vs corpus replicas (fixed-size sketch, linear scan), KMV sketch
+ pairwise overlap vs corpus replicas (pair stage runs on k·S sketch
rows regardless of corpus), PageRank iteration cost vs graph size
(tagged-replica graphs: nodes and edges scale together), and the
streaming HLL sink's per-batch cost as the store ages (state is
O(groups × m) — batch cost must stay flat).

Usage: python tools/bench_sketch_scale.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.functions.sketch import (  # noqa: E402
    hll_estimates,
    hll_registers,
)
from postgres_opensearch_cdc_spark.queries.training_pipeline6 import (  # noqa: E402
    kmv_sketches,
    pagerank_fixed_point,
)
from postgres_opensearch_cdc_spark.registry import load_table  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402
from postgres_opensearch_cdc_spark.streaming.sketch import (  # noqa: E402
    HllRollupSink,
)


def replicate_docs(docs, k: int):
    """k corpus replicas with distinct doc ids; words unchanged (the
    sketch-relevant adversarial case: corpus grows, vocab does not)."""
    return docs.crossJoin(
        F.broadcast(
            docs.sparkSession.range(k).select(F.col("id").alias("rep"))
        )
    ).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "text",
        "source",
    )


def timed(label, fn):
    t0 = time.time()
    n = fn()
    dt = time.time() - t0
    print(f"{label:58s} {n:>12,}  {dt:7.2f}s")
    return dt


def main(sf_dir: str):
    spark = get_spark(
        "sketch-scale",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source"
    ).localCheckpoint(eager=True)

    print("== HLL register build (fixed-size sketch, linear scan) ==")
    for k in (1, 4, 10):
        rep = replicate_docs(docs, k)
        words = rep.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
        ).filter(F.length("w") > 0)
        timed(
            f"hll registers {k}x corpus",
            lambda w=words: hll_registers(w).count(),
        )

    print("== KMV sketches + pairwise overlap (sketch rows only) ==")
    for k in (1, 4, 10):
        rep = replicate_docs(docs, k)
        words = rep.select(
            "source",
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w"),
        ).filter(F.length("w") > 0)

        def run(w=words):
            dv = w.select("source", "w").distinct()
            return kmv_sketches(dv).count()

        timed(f"kmv sketches {k}x corpus", run)

    print("== PageRank 4 iterations vs graph size (tagged replicas) ==")
    toks = docs.select(
        F.filter(
            F.split(F.lower(F.col("text")), r"\s+"),
            lambda w: F.length(w) > 0,
        ).alias("t")
    )
    base_edges = toks.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
                F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
                lambda a, b: F.struct(a.alias("src"), b.alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst").distinct().localCheckpoint(eager=True)
    for k in (1, 10, 100):
        tagged = base_edges.crossJoin(
            F.broadcast(
                spark.range(k).select(F.col("id").cast("string").alias("r"))
            )
        ).select(
            F.concat_ws("#", "src", "r").alias("src"),
            F.concat_ws("#", "dst", "r").alias("dst"),
        ).localCheckpoint(eager=True)
        nodes = (
            tagged.select(F.col("src").alias("w"))
            .unionByName(tagged.select(F.col("dst").alias("w")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        ne = tagged.count()
        timed(
            f"pagerank 4 iters, {ne:,} edges ({k}x tags)",
            lambda e=tagged, n=nodes: pagerank_fixed_point(e, n).count(),
        )

    print("== Streaming HLL sink: per-batch cost as the store ages ==")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id"
    ).localCheckpoint(eager=True)
    workdir = tempfile.mkdtemp(prefix="hll_scale_")
    sink = HllRollupSink(
        path=f"{workdir}/st", group_col="event_type", value_col="user_id"
    )
    n_batches = 10
    lo, hi = events.agg(F.min("event_id"), F.max("event_id")).head()
    step = (hi - lo + n_batches) // n_batches
    for b in range(n_batches):
        sl = events.filter(
            (F.col("event_id") >= lo + b * step)
            & (F.col("event_id") < lo + (b + 1) * step)
        )
        t0 = time.time()
        sink.apply_batch(sl, b, writer_id="scale")
        dt = time.time() - t0
        if b in (0, 4, 9):
            nregs = sink.registers(spark).count()
            print(f"batch {b:2d}: {dt:6.2f}s  store={nregs} registers")
    est = hll_estimates(sink.registers(spark)).count()
    print(f"final estimates rows: {est}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
