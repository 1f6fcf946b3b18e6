"""Training-data pipeline batch 2: corpus-adaptive length filtering,
temperature-based multilingual mixture sampling, chunk-level duplicate
measurement, and radial (range) vector search — the remaining
first-class operations a 100 TB pretraining pipeline runs beyond the
static filters in training_pipeline.py.

Scale shapes: every corpus statistic (percentile band, per-language
weights, chunk counts) is a small partial-aggregated rollup broadcast
back onto a single fact scan; sampling fates are content-hash-based so
they replay across engines, runs, and partitionings. All entries are
value-checked against DuckDB oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.functions.dedup import hash60
from postgres_opensearch_cdc_spark.registry import load_table

LEN_P_LO, LEN_P_HI = 0.05, 0.95
TEMP_DENOM = 10_000  # integer sampling domain, same contract as MIX_DENOM
CHUNK_TOKENS = 8
RADIAL_QUERY_IDS = [0, 1, 2]
RADIAL_MIN_COS = 0.25


def _collect_query_vectors(df) -> dict:
    """ONE driver round-trip for the whole query batch (never a
    per-query .head() loop — that is N scans)."""
    return {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in df.select("vec_id", "embedding").collect()
    }


def _score_stack(vecs, qvecs: dict):
    """One corpus scan scoring every query vector (constant-folded
    literal arrays, one rounded cosine column per query), unpivoted to
    (query_id, vec_id, cos_sim) rows with self-matches dropped —
    shared by the radial and kNN-join entries."""
    from postgres_opensearch_cdc_spark.functions.similarity import cosine

    scored = vecs.select(
        "vec_id",
        *[
            F.round(
                cosine(
                    F.col("embedding"),
                    F.array(*[F.lit(x) for x in qv]),
                ),
                6,
            ).alias(f"s{qid}")
            for qid, qv in sorted(qvecs.items())
        ],
    )
    return scored.select(
        "vec_id",
        F.expr(
            "stack(%d, %s) AS (query_id, cos_sim)"
            % (
                len(qvecs),
                ", ".join(
                    f"CAST({qid} AS BIGINT), s{qid}" for qid in sorted(qvecs)
                ),
            )
        ),
    ).filter(F.col("vec_id") != F.col("query_id"))



def length_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-adaptive length filter: drop documents outside the global
    [p05, p95] band of n_chars — the data-driven twin of a fixed length
    rule. The exact percentile pair is ONE 1-row aggregate broadcast
    back onto the scan (at 100 TB the production path swaps in
    approx_percentile with the same contract); per-language audit of
    kept/short/long counts."""
    docs = load_table(spark, sf_dir, "documents")
    band = docs.agg(
        F.expr(f"percentile(n_chars, {LEN_P_LO})").alias("lo"),
        F.expr(f"percentile(n_chars, {LEN_P_HI})").alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(band))
        .groupBy("lang")
        .agg(
            F.sum(
                ((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
                .cast("long")
            ).alias("kept"),
            F.sum((F.col("n_chars") < F.col("lo")).cast("long")).alias("too_short"),
            F.sum((F.col("n_chars") > F.col("hi")).cast("long")).alias("too_long"),
            F.round(F.first("lo"), 2).alias("p_lo"),
            F.round(F.first("hi"), 2).alias("p_hi"),
        )
        .orderBy("lang")
    )


def mixture_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature (alpha=0.5) multilingual mixture sampling: language
    sampling mass ∝ share^alpha, so the per-document keep rate is
    n^(alpha-1) — normalized so the SMALLEST language keeps everything
    (rate_l = sqrt(n_min / n_l)), the standard alpha-sampling that
    upweights low-resource languages. Rates are DERIVED from the corpus
    (one 5-row aggregate joined back broadcast), unlike mixture_sample's
    static table; fates are hash60-based so the realized sample replays
    bit-identically in the oracle. sqrt and division are correctly-
    rounded IEEE ops, so the integer thresholds match across engines
    with no float-boundary risk."""
    docs = load_table(spark, sf_dir, "documents")
    lang_n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    n_min = lang_n.agg(F.min("n_docs").alias("n_min"))
    rates = lang_n.crossJoin(F.broadcast(n_min)).select(
        "lang",
        "n_docs",
        F.floor(F.sqrt(F.col("n_min") / F.col("n_docs")) * TEMP_DENOM)
        .cast("long")
        .alias("threshold"),
    )
    bucket = F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(TEMP_DENOM))
    kept = (
        docs.join(F.broadcast(rates), "lang")
        .filter(bucket < F.col("threshold"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("kept_docs"))
    )
    return (
        rates.join(kept, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.round(F.col("threshold") / TEMP_DENOM, 4).alias("target_rate"),
            F.coalesce(F.col("kept_docs"), F.lit(0)).alias("kept_docs"),
        )
        .orderBy("lang")
    )


def chunk_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level duplication measurement: split every document into
    non-overlapping CHUNK_TOKENS-token chunks and measure corpus-wide
    chunk duplication — the cheap proxy for substring-level (suffix
    array) dedup. Chunking is a single left-to-right regex pass in the
    scan projection (no per-chunk array indexing — see the span_near
    O(n²) HOF note), then one chunk-keyed aggregation; the summary is a
    second tiny rollup. At 100 TB chunk keys would be 64-bit hashes;
    here the raw strings stay so the oracle checks content equality."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"(?:\S+ ){%d}\S+" % (CHUNK_TOKENS - 1)
    chunks = docs.select(
        F.explode(F.regexp_extract_all(F.lower(F.col("text")), F.lit(pat), 0)).alias(
            "chunk"
        )
    )
    per_chunk = chunks.groupBy("chunk").agg(F.count(F.lit(1)).alias("c"))
    return per_chunk.agg(
        F.sum("c").alias("total_chunks"),
        F.count(F.lit(1)).alias("distinct_chunks"),
        F.sum(F.col("c") - 1).alias("dup_occurrences"),
        F.max("c").alias("max_chunk_freq"),
    )


def ann_radial_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radial (range) vector search: ALL neighbors with cosine ≥
    RADIAL_MIN_COS for a batch of query vectors — the fixed-radius
    counterpart of top-k ANN (OpenSearch's radial k-NN). The three
    query vectors constant-fold into ONE scan that emits a score per
    query; the threshold filters before anything shuffles, so the
    output is proportional to matches, not to corpus × queries."""
    vecs = load_table(spark, sf_dir, "embeddings")
    qvecs = _collect_query_vectors(
        vecs.filter(F.col("vec_id").isin(RADIAL_QUERY_IDS))
    )
    return (
        _score_stack(vecs, qvecs)
        .filter(F.col("cos_sim") >= RADIAL_MIN_COS)
        .select("query_id", "vec_id", "cos_sim")
        .orderBy("query_id", F.col("cos_sim").desc(), "vec_id")
    )


KNN_JOIN_QUERIES = 5  # first N label-0 vectors act as the query batch
KNN_JOIN_K = 3


def knn_join_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch kNN join: top-K cosine neighbors for EACH of a batch of
    query vectors (the first KNN_JOIN_QUERIES label-0 vectors) in one
    pass — the building block of embedding-cluster audits and
    retrieval-eval harnesses. All query vectors constant-fold into a
    single corpus scan; ranking is a per-query window with a
    deterministic (rounded score, id) tie-break. At 100 TB the window
    shuffle carries (queries × corpus) scored ROWS, so the production
    path pre-filters with the SRP/IVF candidate structures
    (functions/similarity.py) and only ranks candidates; the exact
    form here is the oracle-checkable verifier."""
    from pyspark.sql import Window

    vecs = load_table(spark, sf_dir, "embeddings")
    qvecs = _collect_query_vectors(
        vecs.filter(F.col("label") == 0).orderBy("vec_id").limit(KNN_JOIN_QUERIES)
    )
    stacked = _score_stack(vecs, qvecs)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id")
    )
    return (
        stacked.select(
            "query_id", "vec_id", "cos_sim", F.row_number().over(w).alias("rank")
        )
        .filter(F.col("rank") <= KNN_JOIN_K)
        .select("query_id", "vec_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
        .orderBy("query_id", "rank")
    )


QUERIES = {
    "length_percentile_filter": length_percentile_filter,
    "mixture_temperature_sample": mixture_temperature_sample,
    "chunk_dedup_stats": chunk_dedup_stats,
    "ann_radial_search": ann_radial_search,
    "knn_join_topk": knn_join_topk,
}

_HASH60_SQL = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
_COS_SQL = (
    "list_dot_product(embedding::DOUBLE[], qv)"
    " / (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(qv, qv)))"
)

ORACLE = {
    "length_percentile_filter": f"""
        WITH band AS (
            SELECT quantile_cont(n_chars, {LEN_P_LO}) AS lo,
                   quantile_cont(n_chars, {LEN_P_HI}) AS hi
            FROM documents
        )
        SELECT lang,
               CAST(SUM(CASE WHEN n_chars BETWEEN lo AND hi
                             THEN 1 ELSE 0 END) AS BIGINT) AS kept,
               CAST(SUM(CASE WHEN n_chars < lo THEN 1 ELSE 0 END)
                    AS BIGINT) AS too_short,
               CAST(SUM(CASE WHEN n_chars > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS too_long,
               ROUND(ANY_VALUE(lo), 2) AS p_lo,
               ROUND(ANY_VALUE(hi), 2) AS p_hi
        FROM documents, band
        GROUP BY lang ORDER BY lang
    """,
    "mixture_temperature_sample": f"""
        WITH lang_n AS (
            SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang
        ), nmin AS (
            SELECT MIN(n_docs) AS n_min FROM lang_n
        ), rates AS (
            SELECT lang, n_docs,
                   CAST(FLOOR(sqrt(n_min / CAST(n_docs AS DOUBLE))
                              * {TEMP_DENOM}) AS BIGINT) AS threshold
            FROM lang_n, nmin
        ), kept AS (
            SELECT d.lang, COUNT(*) AS kept_docs
            FROM documents d JOIN rates r ON d.lang = r.lang
            WHERE {_HASH60_SQL} % {TEMP_DENOM} < r.threshold
            GROUP BY d.lang
        )
        SELECT r.lang, r.n_docs,
               ROUND(r.threshold / CAST({TEMP_DENOM} AS DOUBLE), 4)
                   AS target_rate,
               COALESCE(k.kept_docs, 0) AS kept_docs
        FROM rates r LEFT JOIN kept k ON r.lang = k.lang
        ORDER BY r.lang
    """,
    "chunk_dedup_stats": rf"""
        WITH chunks AS (
            SELECT unnest(regexp_extract_all(
                       lower(text), '(?:\S+ ){{{CHUNK_TOKENS - 1}}}\S+'))
                   AS chunk
            FROM documents
        ), per_chunk AS (
            SELECT chunk, COUNT(*) AS c FROM chunks GROUP BY chunk
        )
        SELECT CAST(SUM(c) AS BIGINT) AS total_chunks,
               COUNT(*) AS distinct_chunks,
               CAST(SUM(c - 1) AS BIGINT) AS dup_occurrences,
               CAST(MAX(c) AS BIGINT) AS max_chunk_freq
        FROM per_chunk
    """,
    "knn_join_topk": f"""
        WITH q AS (
            SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
            FROM embeddings WHERE label = 0
            ORDER BY vec_id LIMIT {KNN_JOIN_QUERIES}
        ), scored AS (
            SELECT q.query_id, e.vec_id,
                   ROUND({_COS_SQL}, 6) AS cos_sim
            FROM embeddings e, q
            WHERE e.vec_id <> q.query_id
        ), ranked AS (
            SELECT query_id, vec_id, cos_sim,
                   row_number() OVER (
                       PARTITION BY query_id
                       ORDER BY cos_sim DESC, vec_id) AS rank
            FROM scored
        )
        SELECT query_id, vec_id, cos_sim, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank <= {KNN_JOIN_K}
        ORDER BY query_id, rank
    """,
    "ann_radial_search": "\nUNION ALL\n".join(
        f"""
        (WITH q AS (
            SELECT embedding::DOUBLE[] AS qv FROM embeddings
            WHERE vec_id = {qid}
        )
        SELECT CAST({qid} AS BIGINT) AS query_id, vec_id,
               ROUND({_COS_SQL}, 6) AS cos_sim
        FROM embeddings, q
        WHERE vec_id <> {qid}
          AND ROUND({_COS_SQL}, 6) >= {RADIAL_MIN_COS})
        """
        for qid in RADIAL_QUERY_IDS
    ),
}
