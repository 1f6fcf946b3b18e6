"""Training-data pipeline batch 11 (round 14): distributed Gram /
PCA over the embedding corpus and two corpus-statistics operators —
n-gram novelty scoring and doc-level co-occurrence PMI. Four more
published curation stages (absent from the reference, whose consumer
delegates all analytics to OpenSearch — reference consumer.py:24-89;
SURVEY §2.7 extension class alongside batches 1-10).

- embedding_gram_matrix: the d×d Gram (uncentered second-moment)
  matrix of the embedding corpus, the substrate of corpus-level PCA /
  whitening / spectral diagnostics used before semantic dedup and
  coreset selection. Spark-first shape: per-partition Arrow-batched
  X^T X partials (mapInPandas, numpy) so the shuffle carries only
  p·d² tiny rows instead of N·d² exploded products — at 100 TB each
  executor reduces its rows to ONE 64×64 matrix locally and the
  cluster-wide agg touches kilobytes. The declarative alternative
  (posexplode + self-join on vec_id + groupBy(i,j)) computes the same
  thing fully in codegen but shuffles N·d rows twice and materializes
  N·d² join output before partial agg; the Arrow partial is the
  documented, measured winner (SCALE §27) and is the textbook
  tree-aggregation pattern Spark MLlib uses for covariance.
- embedding_pca_power: top principal direction by THREE unrolled
  power iterations over the ROUNDED Gram (the k-center precedent:
  an iterative algorithm certified by an unrolled-round oracle —
  training_pipeline9.coreset_kcenter_greedy). Rounding the Gram to
  6 dp BEFORE iterating pins both engines to bit-identical iteration
  input, so the only cross-engine drift is summation order inside
  each matvec (~1e-14 relative), far under the 6 dp output rounding.
  The d×d collect is a BOUNDED driver constant (d(d+1)/2 = 2,080
  doubles, independent of corpus size — the same justification as
  the MIPS max-norm 1-row broadcast).
- text_novelty_ngram: per-document novelty = fraction of its distinct
  3-gram shingles whose corpus document-frequency is 1, plus a
  boilerplate counter (df >= BOILER_DF) — the standard "how much of
  this document is new text vs corpus-repeated text" curation signal
  (Gopher's repetition rules measure WITHIN-doc repetition; this is
  the ACROSS-corpus complement). Reuses the shared word_shingles
  substrate (functions/dedup.py:112), so the shingle definition is
  pinned to the one the LSH family already certifies.
- cooc_pmi_topk: document-level co-occurrence PMI over word pairs —
  the classic distributional-statistics precompute (word2vec/GloVe
  era, still the standard corpus-association diagnostic). Exact
  integer document frequencies; PMI = ln(c_ab·N / (c_a·c_b)) is one
  ln of a ratio of exact int64 products, identical in both engines
  to the last ulp of libm.

Determinism: all counts are exact int64; every float output is a
single division / ln of identical int64s or a 6-dp-rounded double,
and the PCA iteration consumes the already-rounded Gram (see above).
Ordering ties in cooc_pmi_topk break on (wa, wb) AFTER the rounded
PMI, so the LIMIT cut is deterministic across engines.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.functions.dedup import word_shingles
from postgres_opensearch_cdc_spark.registry import load_table

_TOKS_SQL = r"regexp_split_to_array(lower(text), '\s+')"

EMB_DIM = 64
NOVELTY_N = 3
BOILER_DF = 3
PMI_MIN_PAIRS = 5
PMI_TOP_K = 50

# ---------------------------------------------------------------------------
# Distributed Gram matrix (per-partition Arrow partials)
# ---------------------------------------------------------------------------


def gram_upper(
    emb: DataFrame, dim: int = EMB_DIM, vec_col: str = "embedding"
) -> DataFrame:
    """Upper-triangle Gram entries (i <= j) of the embedding corpus:
    G[i,j] = Σ_rows v_i · v_j, computed as per-partition numpy
    X^T X partials merged by a fixed-size groupBy.

    Scale shape: each Arrow batch folds into ONE local d×d float64
    accumulator; a partition emits exactly d(d+1)/2 rows regardless
    of how many vectors it held, so the shuffle is p·d²/2 rows total
    (kilobytes at any corpus size). float32 parquet values are
    promoted to float64 BEFORE multiplying — exact, so both engines
    multiply identical doubles and differ only in summation order."""
    iu0, iu1 = np.triu_indices(dim)

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.float64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["v"]]
            )
            acc += x.T @ x
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "i": iu0.astype("int32"),
                    "j": iu1.astype("int32"),
                    "partial": acc[iu0, iu1],
                }
            )

    vecs = emb.select(
        F.transform(vec_col, lambda x: x.cast("double")).alias("v")
    )
    return (
        vecs.mapInPandas(partial, "i int, j int, partial double")
        .groupBy("i", "j")
        .agg(F.sum("partial").alias("gram_raw"))
    )


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d(d+1)/2 = 2,080 rounded Gram entries, ordered (i, j)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        gram_upper(emb)
        .select("i", "j", F.round("gram_raw", 6).alias("gram"))
        .orderBy("i", "j")
    )


def _power_iterate(g: np.ndarray) -> tuple[np.ndarray, float]:
    """Three unrolled power iterations from the all-ones vector on a
    symmetric matrix; returns (unit loading vector, ||G u2|| — the
    top-eigenvalue estimate). Raises on a zero/degenerate matrix so
    an empty corpus fails diagnosably instead of emitting NaNs."""
    v = g @ np.ones(g.shape[0])
    for _ in range(2):
        n = float(np.linalg.norm(v))
        if n == 0.0:
            raise ValueError(
                "power iteration collapsed to the zero vector — "
                "empty or degenerate embedding corpus"
            )
        v = g @ (v / n)
    eig = float(np.linalg.norm(v))
    if eig == 0.0:
        raise ValueError(
            "power iteration collapsed to the zero vector — "
            "empty or degenerate embedding corpus"
        )
    return v / eig, eig


def embedding_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding Gram by 3 unrolled
    power iterations (v0 = ones; u_{k} = G·u_{k-1} normalized),
    over the 6-dp-ROUNDED Gram so both engines iterate on
    bit-identical input. The collect is the bounded d²/2 driver
    constant documented in the module docstring; the iteration
    itself is 64×64 — driver-side by design, exactly as a 100 TB
    job would do it (the data-sized work is the Gram, not the
    eigensolve)."""
    emb = load_table(spark, sf_dir, "embeddings")
    rows = (
        gram_upper(emb)
        .select("i", "j", F.round("gram_raw", 6).alias("gram"))
        .collect()
    )
    if not rows:
        raise ValueError("embeddings table is empty — no Gram to iterate")
    g = np.zeros((EMB_DIM, EMB_DIM), dtype=np.float64)
    for r in rows:
        g[r["i"], r["j"]] = r["gram"]
        g[r["j"], r["i"]] = r["gram"]
    loading, eig = _power_iterate(g)
    out = spark.createDataFrame(
        [(i, float(loading[i]), eig) for i in range(EMB_DIM)],
        "i int, loading double, eigval_est double",
    )
    return out.select(
        "i",
        F.round("loading", 6).alias("loading"),
        F.round("eigval_est", 6).alias("eigval_est"),
    ).orderBy("i")


# ---------------------------------------------------------------------------
# Corpus n-gram novelty
# ---------------------------------------------------------------------------


def text_novelty_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document novelty: the fraction of its DISTINCT 3-gram
    shingles with corpus document-frequency 1, plus how many sit at
    df >= BOILER_DF (corpus boilerplate). Shingle definition is the
    shared word_shingles substrate, so this entry and the whole LSH
    family certify the same tokenization.

    Scale shape: df is one map-side-combined groupBy on the shingle
    key; the gram ⋈ df join shuffles on the same key (hot shingles
    are exactly the AQE skew-join case, and the join carries only
    (id, shingle, df) — no document text). Final per-doc agg
    re-shuffles on doc_id, the natural input partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    grams = word_shingles(docs, "text", "doc_id", n=NOVELTY_N)
    dfreq = grams.groupBy("shingle").agg(F.count("*").alias("df"))
    per_doc = (
        grams.join(dfreq, "shingle")
        .groupBy("id")
        .agg(
            F.count("*").alias("n_grams"),
            F.sum(
                F.when(F.col("df") == 1, 1).otherwise(0)
            ).alias("n_novel"),
            F.sum(
                F.when(F.col("df") >= BOILER_DF, 1).otherwise(0)
            ).alias("n_boiler"),
        )
    )
    return per_doc.select(
        F.col("id").alias("doc_id"),
        "n_grams",
        "n_novel",
        "n_boiler",
        F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Doc-level co-occurrence PMI
# ---------------------------------------------------------------------------


def cooc_pmi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K word pairs by document-level PMI: for words a < b,
    PMI = ln(c_ab · N / (c_a · c_b)) over document frequencies, kept
    when c_ab >= PMI_MIN_PAIRS, ordered (rounded PMI desc, wa, wb).

    Scale shape: the pair space is quadratic in per-document DISTINCT
    words — bounded by the document length cap, the same bound the
    shingle family relies on. The self-join is co-partitioned on
    doc_id (one shuffle feeds both sides); pair counts and word
    document-frequencies are map-side-combined groupBys; N rides as
    a 1-row broadcast cross join (no collect). The final TakeOrdered
    keeps only K rows per partition."""
    docs = load_table(spark, sf_dir, "documents")
    words = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
            ).alias("w"),
        )
        .filter(F.length("w") > 0)
        # four consumers below (total, dfreq, both join sides):
        # Catalyst does not share the branches, so pin the exploded
        # projection once instead of re-scanning the corpus 4×
        .localCheckpoint(eager=True)
    )
    n_docs = words.select(
        F.countDistinct("doc_id").alias("n_corpus")
    )
    dfreq = words.groupBy("w").agg(F.count("*").alias("dfw"))
    a = words.select(F.col("doc_id"), F.col("w").alias("wa"))
    b = words.select(F.col("doc_id"), F.col("w").alias("wb"))
    pairs = (
        a.join(b, "doc_id")
        .filter(F.col("wa") < F.col("wb"))
        .groupBy("wa", "wb")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= PMI_MIN_PAIRS)
    )
    joined = (
        pairs.join(
            dfreq.select(F.col("w").alias("wa"), F.col("dfw").alias("df_a")),
            "wa",
        )
        .join(
            dfreq.select(F.col("w").alias("wb"), F.col("dfw").alias("df_b")),
            "wb",
        )
        .crossJoin(F.broadcast(n_docs))
    )
    # cast each count to double BEFORE multiplying: int64 products
    # wrap silently past 2^63 at corpus scale (the overflow class the
    # r13 zipf fix closed); double products round identically in both
    # engines and are exact below 2^53
    pmi = F.log(
        (F.col("c_ab").cast("double") * F.col("n_corpus").cast("double"))
        / (F.col("df_a").cast("double") * F.col("df_b").cast("double"))
    )
    return (
        joined.select(
            "wa",
            "wb",
            "c_ab",
            "df_a",
            "df_b",
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "wa", "wb")
        .limit(PMI_TOP_K)
    )


QUERIES = {
    "embedding_gram_matrix": embedding_gram_matrix,
    "embedding_pca_power": embedding_pca_power,
    "text_novelty_ngram": text_novelty_ngram,
    "cooc_pmi_topk": cooc_pmi_topk,
}


# ---------------------------------------------------------------------------
# Oracles
# ---------------------------------------------------------------------------

# Shared CTE fragment: upper-triangle Gram, rounded to 6 dp — the
# EXACT artifact both embedding entries are defined over (float32
# parquet values promoted to double before multiplying, as in Spark).
_GRAM_UT_CTE = f"""
    idx AS (SELECT unnest(range(0, {EMB_DIM})) AS i),
    gram_ut AS (
        SELECT i.i AS i, j.i AS j,
               ROUND(SUM(CAST(embedding[i.i + 1] AS DOUBLE)
                         * CAST(embedding[j.i + 1] AS DOUBLE)), 6) AS gram
        FROM embeddings
        CROSS JOIN idx i
        CROSS JOIN idx j
        WHERE j.i >= i.i
        GROUP BY 1, 2
    )
"""

_GRAM_SQL = f"""
    WITH {_GRAM_UT_CTE}
    SELECT i, j, gram FROM gram_ut ORDER BY i, j
"""

_PCA_SQL = f"""
    WITH {_GRAM_UT_CTE},
    g AS (
        SELECT i, j, gram FROM gram_ut
        UNION ALL
        SELECT j AS i, i AS j, gram FROM gram_ut WHERE i <> j
    ),
    v1 AS (SELECT i, SUM(gram) AS x FROM g GROUP BY i),
    u1 AS (
        SELECT i, x / (SELECT sqrt(SUM(x * x)) FROM v1) AS x FROM v1
    ),
    v2 AS (
        SELECT g.i, SUM(g.gram * u1.x) AS x
        FROM g JOIN u1 ON u1.i = g.j GROUP BY g.i
    ),
    u2 AS (
        SELECT i, x / (SELECT sqrt(SUM(x * x)) FROM v2) AS x FROM v2
    ),
    v3 AS (
        SELECT g.i, SUM(g.gram * u2.x) AS x
        FROM g JOIN u2 ON u2.i = g.j GROUP BY g.i
    ),
    n3 AS (SELECT sqrt(SUM(x * x)) AS n FROM v3)
    SELECT v3.i AS i,
           ROUND(v3.x / n3.n, 6) AS loading,
           ROUND(n3.n, 6) AS eigval_est
    FROM v3 CROSS JOIN n3
    ORDER BY i
"""

_NOVELTY_SQL = f"""
    WITH sh AS MATERIALIZED (
        SELECT doc_id,
               unnest(list_distinct(
                   list_transform(
                       range(1, greatest(len(toks) - {NOVELTY_N - 1}, 1) + 1),
                       i -> array_to_string(toks[i:i+{NOVELTY_N - 1}], ' ')
                   ))) AS sh
        FROM (SELECT doc_id, {_TOKS_SQL} AS toks FROM documents)
    ),
    dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
    SELECT s.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(SUM(CASE WHEN d.df >= {BOILER_DF} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_boiler,
           ROUND(SUM(CASE WHEN d.df = 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 6) AS novelty
    FROM sh s JOIN dfreq d USING (sh)
    GROUP BY s.doc_id
    ORDER BY s.doc_id
"""

_PMI_SQL = f"""
    WITH w AS MATERIALIZED (
        SELECT DISTINCT doc_id, w FROM (
            SELECT doc_id, unnest({_TOKS_SQL}) AS w FROM documents
        ) WHERE length(w) > 0
    ),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_corpus FROM w),
    dfreq AS (SELECT w, COUNT(*) AS dfw FROM w GROUP BY w),
    pairs AS (
        SELECT a.w AS wa, b.w AS wb, COUNT(*) AS c_ab
        FROM w a JOIN w b ON a.doc_id = b.doc_id AND a.w < b.w
        GROUP BY 1, 2
        HAVING COUNT(*) >= {PMI_MIN_PAIRS}
    )
    SELECT p.wa, p.wb, p.c_ab, da.dfw AS df_a, db.dfw AS df_b,
           ROUND(ln((CAST(p.c_ab AS DOUBLE) * CAST(n.n_corpus AS DOUBLE))
                    / (CAST(da.dfw AS DOUBLE) * CAST(db.dfw AS DOUBLE))),
                 6) AS pmi
    FROM pairs p
    CROSS JOIN n
    JOIN dfreq da ON da.w = p.wa
    JOIN dfreq db ON db.w = p.wb
    ORDER BY pmi DESC, wa, wb
    LIMIT {PMI_TOP_K}
"""

ORACLE = {
    "embedding_gram_matrix": _GRAM_SQL,
    "embedding_pca_power": _PCA_SQL,
    "text_novelty_ngram": _NOVELTY_SQL,
    "cooc_pmi_topk": _PMI_SQL,
}
