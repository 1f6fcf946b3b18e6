"""Adversarial hot-shingle corpus for the prefix-filter join
(round-13 verdict #2): measure the PPJoin+ depth-1 suffix filter in
the regime it is designed for — candidate volume that goes quadratic
in a shared prefix shingle's document frequency while the positional
filter stops pruning.

Corpus construction (D dialects, overlapping blocks):
- every document carries M 8-token BLOCK phrases (df = BLOCK_K each,
  from M staggered block namespaces) — rarer than every filler
  shingle, so they sit EARLY in the docs' prefixes: block-mate pairs
  all become candidates and the positional bound 1 + min(n−p) ≈ n
  clears α ≈ 2n/3 for every one of them;
- the doc's remaining text is PICK filler phrases from its dialect's
  pool (df ≈ N_DOCS/D · PICK/N_PHRASES, COMMONER than block shingles
  so fillers stay out of the prefix) — block-mates from different
  dialects share only the block shingles (Jaccard far below τ), and
  with D dialects that junk is (D−1)/D of all candidates;
- the suffix filter sees the junk pairs' disjoint filler rank
  distributions: min(|La|,|Lb|) + min(|Ra|,|Rb|) collapses to about
  the shared-block mass, far under α, so the cross-dialect junk dies
  before the verify join shuffles shingle rows for it;
- a twin (one filler phrase swapped) is planted every TWIN_EVERY
  docs so the result set is small but nonzero.

Usage: python3 tools/bench_hot_shingle.py [n_docs] [block_k]
Writes nothing to the repo; prints the SCALE §25 row inputs.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.functions.dedup import prefix_index  # noqa: E402
from postgres_opensearch_cdc_spark.queries.training_pipeline8 import (  # noqa: E402
    PF_N,
    PF_TAU,
    dedup_prefix_filter_join,
)
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402

N_DOCS = 2000
BLOCK_K = 96
D = 8            # dialects: (D-1)/D of block-mate pairs are junk
M = 6            # staggered block namespaces per doc
PICK = 10        # filler phrases per doc (one fixed window/dialect:
                 # same-dialect far pairs share only fillers — which
                 # stay OUT of the prefix — so they never become
                 # candidates; cross-dialect pairs have fully
                 # SEPARATED filler rank ranges, the shape the
                 # depth-1 median bound is built to kill)
TWIN_EVERY = 40  # plant a near-dup twin every this many docs


def _doc_tokens(i: int, twin: bool = False,
                block_k: int = BLOCK_K) -> list[str]:
    dialect = i % D
    toks: list[str] = []
    for m in range(M):
        bid = (i + m * block_k // M) // block_k
        toks.extend(f"b{m}x{bid}w{j}" for j in range(8))
    for j in range(PICK):
        p = j + 100 if twin and j == 0 else j  # twin: one swapped phrase
        toks.extend(f"d{dialect}p{p}w{t}" for t in range(6))
    return toks


def make_corpus(spark, path: str, n_docs: int = N_DOCS,
                block_k: int = BLOCK_K) -> None:
    rows = []
    for i in range(n_docs):
        text = " ".join(_doc_tokens(i, block_k=block_k))
        rows.append((i, text, "en", "hot", len(text)))
        if i % TWIN_EVERY == 0:
            text = " ".join(_doc_tokens(i, twin=True, block_k=block_k))
            rows.append((n_docs + i, text, "en", "hot", len(text)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(4).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def stage_counts(spark, sf_dir: str) -> dict:
    """Measurement replica of the entry's candidate stages (prefix
    self-join → size+positional → fused depth-1 suffix) — counts
    only, mirroring training_pipeline8.dedup_prefix_filter_join."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # shared substrate (functions/dedup.prefix_index) — the harness
    # measures the entry's real stages, so it must run the entry's
    # real pipeline, not a drift-prone copy (r14 review)
    pos, _arrs = prefix_index(docs, n=PF_N)
    prefix = pos.filter(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(PF_TAU) * F.col("n")) + 1
    ).select("doc_id", "rk", "pos", "n")
    candrows = (
        prefix.alias("p1")
        .join(prefix.alias("p2"), "rk")
        .filter(F.col("p1.doc_id") < F.col("p2.doc_id"))
        .select(
            F.col("p1.doc_id").alias("ia"), F.col("p2.doc_id").alias("ib"),
            F.col("p1.pos").alias("pos1"), F.col("p2.pos").alias("pos2"),
            F.col("p1.n").alias("na"), F.col("p2.n").alias("nb"),
        )
    )
    alpha = F.ceil(F.lit(PF_TAU / (1.0 + PF_TAU)) * (F.col("na") + F.col("nb")))
    grouped = candrows.groupBy("ia", "ib", "na", "nb").agg(
        F.min("pos1").alias("mp1"), F.min("pos2").alias("mp2")
    ).localCheckpoint(eager=True)
    n_prefix = grouped.count()
    cand = grouped.filter(
        (F.least("na", "nb") >= F.lit(PF_TAU) * F.greatest("na", "nb"))
        & (
            F.lit(1)
            + F.least(F.col("na") - F.col("mp1"), F.col("nb") - F.col("mp2"))
            >= alpha
        )
    ).localCheckpoint(eager=True)
    n_pos = cand.count()
    arrs = _arrs
    suffixed = (
        cand.join(arrs.select(F.col("doc_id").alias("ia"),
                              F.col("rks").alias("a_rks")), "ia")
        .join(arrs.select(F.col("doc_id").alias("ib"),
                          F.col("rks").alias("b_rks")), "ib")
        .withColumn(
            "m",
            F.when(
                F.col("nb") > F.col("mp2"),
                F.element_at(
                    "b_rks",
                    (F.col("mp2")
                     + ((F.col("nb") - F.col("mp2") + 1) / F.lit(2))
                     .cast("int")).cast("int"),
                ),
            ),
        )
        .withColumn(
            "ca",
            F.aggregate(
                "a_rks", F.lit(0),
                lambda acc, x: acc + F.when(x < F.col("m"), F.lit(2))
                .when(x == F.col("m"), F.lit(1)).otherwise(F.lit(0)),
            ),
        )
        .withColumn(
            "ltb",
            F.aggregate(
                "b_rks", F.lit(0),
                lambda acc, x: acc
                + F.when(x < F.col("m"), F.lit(1)).otherwise(F.lit(0)),
            ),
        )
    )
    lt_a = F.shiftright("ca", 1)
    eq_a = F.col("ca") % 2
    ub = F.when(
        F.col("m").isNotNull(),
        F.lit(1)
        + F.least(lt_a - F.col("mp1"), F.col("ltb") - F.col("mp2"))
        + F.least(F.col("na") - lt_a - eq_a, F.col("nb") - F.col("ltb") - 1)
        + eq_a,
    ).otherwise(F.lit(1))
    n_suffix = suffixed.filter(ub >= alpha).count()
    n_docs = docs.count()

    # verify-strategy timings over the SAME positional candidates:
    # exploded shingle-string row join (pre-r14 verify) vs co-shuffled
    # codegen array_intersect (r14 verify) — the measurement that
    # retired the suffix filter from the default path
    def _time2(df) -> float:
        # warm-up rep absorbs the one-off codegen compile; min of 2
        # timed reps is the steady-state number
        df.count()
        reps = []
        for _ in range(2):
            t0 = time.perf_counter()
            df.count()
            reps.append(time.perf_counter() - t0)
        return min(reps)

    t_string_verify = _time2(
        cand.select("ia", "ib")
        .join(sh.select(F.col("doc_id").alias("ia"), "sh"), "ia")
        .join(sh.select(F.col("doc_id").alias("ib"), "sh"), ["ib", "sh"])
        .groupBy("ia", "ib").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    arrs_ck = arrs.localCheckpoint(eager=True)
    t_array_verify = _time2(
        cand.select("ia", "ib", "na", "nb")
        .join(arrs_ck.select(F.col("doc_id").alias("ia"),
                             F.col("rks").alias("a_rks")), "ia")
        .join(arrs_ck.select(F.col("doc_id").alias("ib"),
                             F.col("rks").alias("b_rks")), "ib")
        .withColumn("n_inter", F.size(F.array_intersect("a_rks", "b_rks")))
        .filter(F.col("n_inter")
                / (F.col("na") + F.col("nb") - F.col("n_inter"))
                >= F.lit(PF_TAU))
    )

    return {
        "docs": n_docs,
        "all_pairs": n_docs * (n_docs - 1) // 2,
        "prefix_only": n_prefix,
        "positional": n_pos,
        "suffix": n_suffix,
        "pressure": round(n_pos / n_docs, 1),
        "string_verify_sec": round(t_string_verify, 2),
        "array_verify_sec": round(t_array_verify, 2),
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS
    block_k = int(sys.argv[2]) if len(sys.argv) > 2 else BLOCK_K
    spark = get_spark(
        "hot_shingle",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="hot_shingle_")
    try:
        make_corpus(spark, tmp, n_docs=n_docs, block_k=block_k)
        print(f"corpus: {n_docs} docs, block_k={block_k}, "
              f"{D} dialects, tau={PF_TAU}")
        counts = stage_counts(spark, tmp)
        print("stage counts:", counts)
        for mode in ("off", "on", "auto"):
            # warm-up then 2 timed reps, min reported (codegen compile
            # lands in the warm-up)
            dedup_prefix_filter_join(spark, tmp, suffix_mode=mode).count()
            reps = []
            for _ in range(2):
                t0 = time.perf_counter()
                n = dedup_prefix_filter_join(
                    spark, tmp, suffix_mode=mode
                ).count()
                reps.append(time.perf_counter() - t0)
            print(f"suffix_mode={mode}: {min(reps):.2f}s  ({n} result pairs)")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
