"""ANN recall curves (SCALE.md §18): recall@10 vs nprobe / M for the
four serving index families — IVF (raw vectors, partition-pruned),
PQ (ADC over M-byte codes), and IVFPQ raw / residual — against the
exact brute-force top-10 at the same scale. The serving claims in
SCALE.md §12-§16 rest on bytes-read; this adds the accuracy axis.

Ground truth matches each family's OWN metric (mixing them would
charge the quantizer for a metric mismatch it never promised to
preserve): IVF ranks candidates by exact cosine, so its truth is the
exact cosine top-10; PQ/IVFPQ rank by ADC-approximated squared L2, so
their truth is the exact L2 top-10. Recall@10 = |returned-or-candidate
set ∩ truth| / 10, averaged over the query sample.

Run exclusively (concurrent Spark sessions swing timings; recall
itself is deterministic — seeded training, fixed query sample):

    python3 tools/bench_ann_recall.py [SF_DIR]   # default sf0.1

Prints one JSON line per (family, knob) point.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.functions.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_index_build,
    ivf_index_topk,
    ivfpq_index_build,
    ivfpq_index_topk,
    kmeans_train,
    pq_index_adc_topk,
    pq_index_build,
    pq_train,
)
from postgres_opensearch_cdc_spark.registry import load_table  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402

N_QUERIES = 8
K = 10
CELLS = 16


def exact_mip_topk(corpus, q: list[float], k: int) -> list:
    """Exact maximum-inner-product top-k (descending dot, vec_id
    tiebreak) — the ground truth for the MIPS family."""
    lit_q = F.array(*[F.lit(float(x)) for x in q])
    dp = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            lit_q, lambda a, b: a * b,
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return [r["vec_id"] for r in corpus.select("vec_id", dp.alias("d"))
            .orderBy(F.col("d").desc(), "vec_id").limit(k).collect()]


def augment_corpus(corpus):
    """The ann_mips_topk reduction (training_pipeline9): x̃ = [x,
    sqrt(M²−‖x‖²)] with M the corpus max norm, so cosine over x̃
    against q̃ = [q, 0] is monotone in ⟨x, q⟩ and every cosine index
    serves MIPS unchanged."""
    v = F.transform("embedding", lambda x: x.cast("double"))
    nv = F.sqrt(F.aggregate(F.zip_with(v, v, lambda a, b: a * b),
                            F.lit(0.0), lambda acc, x: acc + x))
    norms = corpus.select("vec_id", v.alias("v"), nv.alias("nv"))
    mx = norms.agg(F.max("nv").alias("m_norm"))
    return norms.crossJoin(F.broadcast(mx)).select(
        "vec_id",
        F.concat(
            "v",
            F.array(F.sqrt(F.greatest(
                F.col("m_norm") * F.col("m_norm")
                - F.col("nv") * F.col("nv"), F.lit(0.0)))),
        ).alias("embedding"),
    )


def exact_l2_topk(corpus, q: list[float], k: int) -> list:
    lit_q = F.array(*[F.lit(float(x)) for x in q])
    l2 = F.aggregate(
        F.zip_with(
            F.transform("embedding", lambda x: x.cast("double")),
            lit_q, lambda a, b: (a - b) * (a - b),
        ),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    return [r["vec_id"] for r in corpus.select("vec_id", l2.alias("d"))
            .orderBy("d", "vec_id").limit(k).collect()]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(
        "ann_recall", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    vecs = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    queries = [
        (r["vec_id"], [float(x) for x in r["embedding"]])
        for r in vecs.filter(F.col("vec_id") < N_QUERIES)
        .orderBy("vec_id").collect()
    ]
    corpus = vecs.filter(F.col("vec_id") >= N_QUERIES)
    corpus = corpus.localCheckpoint(eager=True)
    n_corpus = corpus.count()

    truth_cos = {
        qid: [r["vec_id"] for r in
              brute_force_topk(corpus, q, k=K).collect()]
        for qid, q in queries
    }
    truth_l2 = {qid: exact_l2_topk(corpus, q, K) for qid, q in queries}

    centroids = kmeans_train(corpus, k=CELLS, iterations=4, seed=42)
    tmp = tempfile.mkdtemp(prefix="ann_recall_")

    def emit(row: dict) -> None:
        print(json.dumps({
            "sf_dir": sf_dir, "corpus": n_corpus, "n_queries": len(queries),
            "k": K, **row,
        }), flush=True)

    try:
        # IVF over raw vectors: recall loss comes ONLY from cell pruning
        ivf_path = os.path.join(tmp, "ivf")
        ivf_index_build(corpus, ivf_path, centroids=centroids)
        for nprobe in (1, 2, 4, 8):
            hits = 0
            for qid, q in queries:
                got = [r["vec_id"] for r in ivf_index_topk(
                    spark, ivf_path, q, nprobe=nprobe, k=K).collect()]
                hits += len(set(got) & set(truth_cos[qid]))
            emit({"family": "ivf", "cells": CELLS, "nprobe": nprobe,
                  "recall_at_10": round(hits / (K * len(queries)), 3)})

        # PQ (no IVF): ADC top-10 directly, and the rerank form's
        # candidate recall at 3K (what an exact rerank could recover)
        for m in (4, 8, 16):
            cb = pq_train(corpus, m=m, k=16, iterations=4, seed=7)
            pq_path = os.path.join(tmp, f"pq_m{m}")
            pq_index_build(corpus, pq_path, codebook=cb)
            top, cand = 0, 0
            for qid, q in queries:
                got = [r["vec_id"] for r in pq_index_adc_topk(
                    spark, pq_path, q, k=3 * K).collect()]
                top += len(set(got[:K]) & set(truth_l2[qid]))
                cand += len(set(got) & set(truth_l2[qid]))
            emit({"family": "pq", "m": m,
                  "recall_at_10": round(top / (K * len(queries)), 3),
                  "candidate_recall_at_30":
                      round(cand / (K * len(queries)), 3)})

        # IVFPQ raw vs residual: candidate recall at 3K (the serving
        # path ALWAYS exact-reranks candidates against live vectors,
        # engine._knn_index_search, so candidate recall IS end recall)
        cb8 = pq_train(corpus, m=8, k=16, iterations=4, seed=7)
        for by_residual in (False, True):
            label = "ivfpq_residual" if by_residual else "ivfpq_raw"
            path = os.path.join(tmp, label)
            ivfpq_index_build(corpus, path, centroids=centroids,
                              codebook=cb8, by_residual=by_residual)
            for nprobe in (1, 2, 4):
                cand30, cand100 = 0, 0
                for qid, q in queries:
                    got = [r["vec_id"] for r in ivfpq_index_topk(
                        spark, path, q, nprobe=nprobe, k=10 * K).collect()]
                    cand30 += len(set(got[:3 * K]) & set(truth_l2[qid]))
                    cand100 += len(set(got) & set(truth_l2[qid]))
                emit({"family": label, "cells": CELLS, "m": 8,
                      "nprobe": nprobe,
                      "candidate_recall_at_30":
                          round(cand30 / (K * len(queries)), 3),
                      # num_candidates is the serving knob
                      # (engine spec num_candidates): the rerank is
                      # exact, so candidate recall at the budget IS
                      # end-to-end recall
                      "candidate_recall_at_100":
                          round(cand100 / (K * len(queries)), 3)})

        # MIPS via the augmented-cosine reduction (round-13 verdict
        # ask #4): truth = exact inner-product top-10; serving = IVF
        # built over the AUGMENTED vectors, queried with q̃ = [q, 0].
        # Cosine over augmented vectors is monotone in ⟨x,q⟩, so any
        # recall loss is pure cell pruning. The fixture embeddings
        # are UNIT-NORM (max-min norm spread < 1e-6), where MIP order
        # == cosine order by construction — so two corpora are
        # measured: the raw fixture (sanity: curve must match plain
        # IVF exactly) and a norm-SPREAD variant (each vector scaled
        # by 0.5 + (vec_id % 10)/10, norms 0.5-1.4) where MIPS and
        # cosine genuinely disagree. On the spread corpus a plain
        # cosine IVF is also scored against MIP truth — the gap
        # between that curve and the augmented one is what the
        # reduction buys.
        scale = F.lit(0.5) + (F.col("vec_id") % 10).cast("double") / 10
        spread = corpus.select(
            "vec_id",
            F.transform("embedding",
                        lambda x: x.cast("double") * scale)
            .alias("embedding"),
        ).localCheckpoint(eager=True)
        for label, corp in (("mips_unitnorm", corpus),
                            ("mips_spreadnorm", spread)):
            truth_mip = {qid: exact_mip_topk(corp, q, K)
                         for qid, q in queries}
            aug = augment_corpus(corp).localCheckpoint(eager=True)
            aug_centroids = kmeans_train(aug, k=CELLS, iterations=4,
                                         seed=42)
            mips_path = os.path.join(tmp, f"{label}_ivf")
            ivf_index_build(aug, mips_path, centroids=aug_centroids)
            naive_path = os.path.join(tmp, f"{label}_naive")
            ivf_index_build(corp, naive_path, centroids=kmeans_train(
                corp, k=CELLS, iterations=4, seed=42))
            # nprobe = CELLS is the exhaustive probe: the augmented
            # family must hit 1.0 there (its ranking is MIP-monotone)
            # while the norm-blind cosine strawman stays capped
            for nprobe in (1, 2, 4, 8, 16):
                hits, naive_hits = 0, 0
                for qid, q in queries:
                    got = [r["vec_id"] for r in ivf_index_topk(
                        spark, mips_path, q + [0.0], nprobe=nprobe,
                        k=K).collect()]
                    hits += len(set(got) & set(truth_mip[qid]))
                    naive = [r["vec_id"] for r in ivf_index_topk(
                        spark, naive_path, q, nprobe=nprobe,
                        k=K).collect()]
                    naive_hits += len(set(naive) & set(truth_mip[qid]))
                emit({"family": label, "cells": CELLS, "nprobe": nprobe,
                      "recall_at_10":
                          round(hits / (K * len(queries)), 3),
                      # cosine IVF scored against MIP truth — the
                      # reduction-free strawman
                      "naive_cosine_recall_at_10":
                          round(naive_hits / (K * len(queries)), 3)})
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
