"""Training-data pipeline governance operators: Gopher-style repetition
quality metrics, PII redaction, and benchmark-contamination detection.

These are the curation passes an LLM-pretraining pipeline runs between
raw crawl and tokenization (Rae et al. 2021 "Scaling Language Models"
[Gopher] App. A for the repetition filters; n-gram-overlap decontam is
the standard eval-hygiene pass). All three are expressed as single
Catalyst plans with value-checked DuckDB oracles.

Scale notes:
- Repetition metrics are computed per-document with higher-order
  functions (transform/filter/aggregate over the token array) — zero
  shuffle, fuses into the scan. The O(distinct×n) inner loop is bounded
  by document length, not corpus size, so it parallelizes embarrassingly
  at 100 TB where an explode→groupBy(doc, gram) formulation would
  shuffle the whole token stream.
- Contamination hashes each n-gram to a fixed-width md5 before the
  join, so the shuffle carries 32-byte keys instead of arbitrary-length
  text; the benchmark side is distinct-ed and broadcast (benchmark sets
  are small by construction).
- PII scrub is a map-only projection (functions/pii.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.functions import pii, text as textfn
from postgres_opensearch_cdc_spark.functions.dedup import _ensure_parallelism
from postgres_opensearch_cdc_spark.registry import load_table

# Gopher-style thresholds (tuned to this corpus' observed spread:
# top-bigram fraction avg 0.04 / max 0.17, dup fraction avg 0.06 / max 0.27).
TOP_BIGRAM_MAX = 0.08
DUP_BIGRAM_MAX = 0.15

CONTAM_N = 4  # n-gram order for decontamination
BENCHMARK_MAX_DOC_ID = 50  # doc_id < 50 plays the held-out benchmark set


def _toks(col: Column) -> Column:
    return F.split(F.lower(col), r"\s+")


def _ngrams(toks: Column, n: int) -> Column:
    """Array of space-joined n-grams (order preserved, duplicates kept).
    Guarded for docs shorter than n tokens: Spark's sequence(1, 0) is
    DESCENDING (yields [1, 0]) and slice(start=0) throws, so the short
    case returns an empty array explicitly."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    empty = F.array().cast("array<string>")
    return F.when(F.size(toks) >= n, grams).otherwise(empty)


def _run_length_stats(sorted_grams: Column) -> Column:
    """One aggregate pass over a SORTED gram array returning
    struct(maxrun, dups): the longest equal-run length and the total
    occurrences belonging to runs longer than 1. Equivalent to
    per-distinct-gram counting but O(n log n) instead of O(distinct×n)
    — higher-order lambdas evaluate interpreted (outside codegen), so
    the quadratic form is 50× slower on real documents."""

    def merge(acc: Column, x: Column) -> Column:
        same = x == acc["prev"]
        closed_max = F.greatest(acc["maxrun"], acc["run"])
        closed_dups = acc["dups"] + F.when(acc["run"] > 1, acc["run"]).otherwise(0)
        return F.when(
            same,
            F.struct(
                x.alias("prev"),
                (acc["run"] + 1).alias("run"),
                acc["maxrun"].alias("maxrun"),
                acc["dups"].alias("dups"),
            ),
        ).otherwise(
            F.struct(
                x.alias("prev"),
                F.lit(1).alias("run"),
                closed_max.alias("maxrun"),
                closed_dups.alias("dups"),
            )
        )

    return F.aggregate(
        sorted_grams,
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("maxrun"),
            F.lit(0).alias("dups"),
        ),
        merge,
        lambda acc: F.struct(
            F.greatest(acc["maxrun"], acc["run"]).alias("maxrun"),
            (acc["dups"] + F.when(acc["run"] > 1, acc["run"]).otherwise(0)).alias(
                "dups"
            ),
        ),
    )


def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition metrics: fraction of bigram occurrences
    taken by the single most frequent bigram, and fraction of bigram
    occurrences that are repeats — documents exceeding either threshold
    are flagged for removal (Gopher App. A analogue for a corpus with
    no line structure)."""
    docs = _ensure_parallelism(load_table(spark, sf_dir, "documents"))
    grams = _ngrams(_toks(F.col("text")), 2)
    # per-doc multiset counts in ONE vectorized Arrow pass (np.unique
    # with counts ≡ run-lengths of the sorted array, exact string
    # equality and integer counts) instead of the interpreted
    # sort+struct-fold the JVM evaluated per row (r14, guide §4.2 —
    # the fold was most of the entry). The fractions stay JVM-side
    # divisions of the SAME integers, so values are unchanged.
    import numpy as np
    import pandas as pd

    def _rep_stats(it):
        for pdf in it:
            n_out, max_out, dup_out = [], [], []
            for hs in pdf["grams"]:
                if hs is None:
                    n_out.append(None); max_out.append(None)
                    dup_out.append(None)
                    continue
                arr = np.asarray(hs, dtype=object)
                n_out.append(len(arr))
                if len(arr) == 0:
                    max_out.append(0); dup_out.append(0)
                    continue
                _, c = np.unique(arr, return_counts=True)
                max_out.append(int(c.max()))
                dup_out.append(int(c[c > 1].sum()))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_bigrams": pd.array(n_out, dtype="Int64"),
                "maxrun": pd.array(max_out, dtype="Int64"),
                "dups": pd.array(dup_out, dtype="Int64"),
            })

    stats = docs.select("doc_id", grams.alias("grams")).mapInPandas(
        _rep_stats,
        schema="doc_id long, n_bigrams long, maxrun long, dups long",
    )
    n_bigrams = F.col("n_bigrams")
    # guard the zero-bigram degenerate doc: ANSI mode turns x/0 into an
    # error, so short docs get NULL metrics (and are never flagged)
    top_frac = F.when(
        n_bigrams > 0, F.round(F.col("maxrun") / n_bigrams, 6)
    )
    dup_frac = F.when(
        n_bigrams > 0, F.round(F.col("dups") / n_bigrams, 6)
    )
    return (
        stats.select(
            "doc_id",
            n_bigrams.alias("n_bigrams"),
            top_frac.alias("top_bigram_frac"),
            dup_frac.alias("dup_bigram_frac"),
        )
        .withColumn(
            "flagged",
            (F.col("top_bigram_frac") > TOP_BIGRAM_MAX)
            | (F.col("dup_bigram_frac") > DUP_BIGRAM_MAX),
        )
        .orderBy("doc_id")
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact PII-shaped spans (emails, phones, entity-ID tags, long
    digit runs) and count redactions per row. On this corpus the
    customer-name ID tag is the live pattern; email/phone rules are
    exercised by unit fixtures."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        pii.scrub(F.col("c_name")).alias("scrubbed_name"),
        pii.redaction_count(F.col("c_name")).cast("long").alias("n_redactions"),
    ).orderBy("c_custkey")


def contamination_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    CONTAM_N-gram with the benchmark set, with the count of distinct
    shared grams. Grams are md5-hashed before the join (fixed-width
    shuffle keys); the benchmark gram set is distinct-ed and broadcast."""
    docs = load_table(spark, sf_dir, "documents")

    # split FIRST, shingle second: filtering above _ensure_parallelism's
    # repartition pins the doc_id predicates above the Exchange, so BOTH
    # sides were scanning and shuffling the full document payload. With
    # the filter on the raw scan each side reads only its own docs
    # (PushedFilters at the parquet scan) and only the corpus side —
    # the CPU-heavy one — pays the parallelism-spreading shuffle.
    def _grams(side: DataFrame) -> DataFrame:
        return side.select(
            "doc_id",
            F.explode(_ngrams(_toks(F.col("text")), CONTAM_N)).alias("gram"),
        ).select("doc_id", F.md5(F.col("gram")).alias("gram_h"))

    bench = (
        _grams(docs.filter(F.col("doc_id") < BENCHMARK_MAX_DOC_ID))
        .select("gram_h")
        .distinct()
    )
    corpus = _grams(_ensure_parallelism(
        docs.filter(F.col("doc_id") >= BENCHMARK_MAX_DOC_ID)
    ))
    return (
        corpus.join(F.broadcast(bench), "gram_h")
        .groupBy("doc_id")
        .agg(F.count_distinct("gram_h").alias("n_shared_grams"))
        .orderBy("doc_id")
    )


def token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token-budget accounting: document counts and summed
    whitespace vs BPE-ish token counts — the bookkeeping query a
    pretraining data pipeline runs before sampling. Map-side partial agg
    on a low-cardinality key; token counting is pure codegen in the
    scan projection."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(textfn.token_count(F.col("text"))).alias("ws_tokens"),
            F.sum(textfn.bpe_token_count(F.col("text"))).alias("bpe_tokens"),
        )
        .orderBy("source")
    )


# Per-language mixture rates (DoReMi-style static domain reweighting):
# fraction of each language's documents kept for the training mix.
# Thresholds are integers out of MIX_DENOM so the keep-predicate is
# exact integer arithmetic in both engines.
MIX_DENOM = 10_000
MIX_RATES = {"en": 10_000, "de": 6_000, "fr": 6_000, "es": 3_000, "zh": 3_000}

SHARD_TOKENS = 1_000  # target whitespace tokens per training shard


def mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic domain-mixture sampling: keep each document iff
    hash60(doc_id) mod MIX_DENOM < rate(lang) — the static-rate domain
    reweighting step (DoReMi/Pile-style mixtures) as a pure map-side
    filter. Hash-based sampling beats rand(): reproducible across runs,
    engines (the md5-backed hash60 replays in DuckDB → value-checked),
    partitionings, and retries, and it composes with incremental
    ingestion (a re-crawled doc keeps its fate). Output is the per-lang
    audit: kept docs, kept whitespace tokens, and the realized rate.
    Plan shape at 100 TB: filter + partial agg on a 5-value key — no
    shuffle beyond 5 rows per partition."""
    from postgres_opensearch_cdc_spark.functions.dedup import hash60

    docs = load_table(spark, sf_dir, "documents")
    rate = F.create_map(
        *[F.lit(x) for kv in MIX_RATES.items() for x in kv]
    )[F.col("lang")]
    bucket = F.pmod(hash60(F.col("doc_id").cast("string")), F.lit(MIX_DENOM))
    kept = docs.filter(bucket < rate)
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"),
            F.sum(textfn.token_count(F.col("text"))).alias("kept_tokens"),
        )
        .orderBy("lang")
    )


def shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard packing: assign documents to ~SHARD_TOKENS-token
    shards per language, in deterministic hash order (the shuffled-
    but-reproducible read order a pretraining run wants). Shard id =
    floor(preceding-token-cumsum / SHARD_TOKENS) via a window cumsum
    partitioned by lang — each language packs in parallel; within a
    language the sort is a range exchange. At 100 TB the partition key
    becomes (lang, worker_bucket) so no single window task sees more
    than a bucket's tokens; the packing semantics are unchanged. Output
    is the shard manifest: docs and tokens per shard."""
    from pyspark.sql import Window

    from postgres_opensearch_cdc_spark.functions.dedup import hash60

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "lang",
        "doc_id",
        textfn.token_count(F.col("text")).alias("tok_cnt"),
        hash60(F.col("doc_id").cast("string")).alias("h"),
    )
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    with_shard = sized.withColumn(
        "shard",
        F.floor(
            (F.sum("tok_cnt").over(w) - F.col("tok_cnt")) / F.lit(SHARD_TOKENS)
        ).cast("long"),
    )
    return (
        with_shard.groupBy("lang", "shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_cnt").alias("shard_tokens"),
        )
        .orderBy("lang", "shard")
    )


def quality_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram language-model quality score — the perplexity-proxy
    filter (KenLM-style scoring with the corpus itself as the LM): per
    document, the mean negative log-probability of its tokens under the
    corpus unigram distribution. Outlier docs (rare-token soup, other
    languages, encoding junk) score high and get filtered upstream.

    Two linear passes: (1) vocabulary build — explode + count, one
    shuffle on token; (2) scoring — token join against the vocabulary
    (shuffle on token; at 100 TB the vocab is Zipf-bounded and the join
    side after aggregation is small enough to broadcast), then one
    groupBy(doc) mean. The corpus total rides a 1-row broadcast
    cross-join, not a driver collect. Output: per-source mean/extremes
    of the doc scores (source-level audit a filtering run reports)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "source", F.explode(textfn.tokens(F.col("text"))).alias("tok")
        # pinned: two consumers (vocabulary build + the scoring join)
        # each re-ran the corpus tokenize+explode (r15, guide §1.2)
    ).localCheckpoint(eager=True)
    vocab = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .withColumn("neg_logp", -F.log(F.col("cnt") / F.col("total")))
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.avg("neg_logp").alias("doc_nlp")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("doc_nlp"), 4).alias("mean_nlp"),
            F.round(F.min("doc_nlp"), 4).alias("min_nlp"),
            F.round(F.max("doc_nlp"), 4).alias("max_nlp"),
        )
        .orderBy("source")
    )


def quality_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional language-model quality score — the stronger
    perplexity proxy over quality_unigram_lm: per document, the mean
    -ln p(w2 | w1) under corpus MLE counts (c(w1 w2) / c_prefix(w1),
    prefix counts taken from the bigram relation itself so the
    conditional normalizes exactly). Repetitive templates score LOW,
    token soup scores HIGH — the two tails a curation run trims.

    The bigram pairs come from arrays_zip over two slices (children
    evaluate once per row — never element_at(toks, i) inside a lambda,
    see SCALE.md §5); counting shuffles on the bigram/prefix hash keys
    and both count relations are Zipf-bounded, broadcastable at scale.
    Output: the per-source audit (mean/extremes of doc scores)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "arrays_zip(slice(split(lower(text), '\\\\s+'), 1, "
                "size(split(lower(text), '\\\\s+')) - 1), "
                "slice(split(lower(text), '\\\\s+'), 2, "
                "size(split(lower(text), '\\\\s+')) - 1))"
            )
        ).alias("s"),
    ).select(
        "doc_id",
        "source",
        F.col("s.0").alias("prev"),
        F.concat(F.col("s.0"), F.lit(" "), F.col("s.1")).alias("bigram"),
        # pinned: three consumers (bigram counts, prefix counts, the
        # scoring join) each re-ran the corpus explode (r15, §1.2)
    ).localCheckpoint(eager=True)
    b_cnt = pairs.groupBy("bigram").agg(F.count(F.lit(1)).alias("bc"))
    p_cnt = pairs.groupBy("prev").agg(F.count(F.lit(1)).alias("pc"))
    scored = (
        pairs.join(b_cnt, "bigram")
        .join(p_cnt, "prev")
        .withColumn("neg_logp", -F.log(F.col("bc") / F.col("pc")))
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.avg("neg_logp").alias("doc_nlp")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("doc_nlp"), 4).alias("mean_nlp"),
            F.round(F.min("doc_nlp"), 4).alias("min_nlp"),
            F.round(F.max("doc_nlp"), 4).alias("max_nlp"),
        )
        .orderBy("source")
    )


QUERIES = {
    "quality_bigram_lm": quality_bigram_lm,
    "quality_repetition": quality_repetition,
    "pii_scrub": pii_scrub,
    "contamination_ngram": contamination_ngram,
    "token_budget": token_budget,
    "mixture_sample": mixture_sample,
    "shard_packing": shard_packing,
    "quality_unigram_lm": quality_unigram_lm,
}

_TOKS_SQL = r"regexp_split_to_array(lower(text), '\s+')"


def _ngrams_sql(toks: str, n: int) -> str:
    return (
        f"list_transform(range(1, len({toks}) - {n - 1} + 1), "
        f"i -> list_aggregate({toks}[i:i+{n - 1}], 'string_agg', ' '))"
    )


ORACLE = {
    "quality_repetition": f"""
        WITH base AS (
            SELECT doc_id, {_ngrams_sql(_TOKS_SQL, 2)} AS grams FROM documents
        ),
        m AS (
            SELECT doc_id,
                   len(grams) AS n_bigrams,
                   list_transform(list_distinct(grams),
                                  g -> len(list_filter(grams, x -> x = g))) AS counts
            FROM base
        )
        SELECT doc_id,
               n_bigrams,
               ROUND(list_max(counts)::DOUBLE / n_bigrams, 6) AS top_bigram_frac,
               ROUND(list_sum(list_transform(counts,
                         c -> CASE WHEN c > 1 THEN c ELSE 0 END))::DOUBLE
                     / n_bigrams, 6) AS dup_bigram_frac,
               (ROUND(list_max(counts)::DOUBLE / n_bigrams, 6) > {TOP_BIGRAM_MAX}
                OR ROUND(list_sum(list_transform(counts,
                           c -> CASE WHEN c > 1 THEN c ELSE 0 END))::DOUBLE
                         / n_bigrams, 6) > {DUP_BIGRAM_MAX}) AS flagged
        FROM m
        ORDER BY doc_id
    """,
    "pii_scrub": f"""
        SELECT c_custkey,
               {pii.scrub_sql("c_name")} AS scrubbed_name,
               {pii.redaction_count_sql("c_name")}::BIGINT AS n_redactions
        FROM customer
        ORDER BY c_custkey
    """,
    "contamination_ngram": f"""
        WITH grams AS (
            SELECT doc_id,
                   md5(unnest({_ngrams_sql(_TOKS_SQL, CONTAM_N)})) AS gram_h
            FROM documents
        ),
        bench AS (
            SELECT DISTINCT gram_h FROM grams WHERE doc_id < {BENCHMARK_MAX_DOC_ID}
        )
        SELECT doc_id, count(DISTINCT gram_h) AS n_shared_grams
        FROM grams
        WHERE doc_id >= {BENCHMARK_MAX_DOC_ID}
          AND gram_h IN (SELECT gram_h FROM bench)
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "token_budget": f"""
        SELECT source,
               count(*) AS n_docs,
               sum(len({_TOKS_SQL}))::BIGINT AS ws_tokens,
               sum({textfn.bpe_token_count_sql("text")})::BIGINT AS bpe_tokens
        FROM documents
        GROUP BY source
        ORDER BY source
    """,
}

_H60_DOCID = "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"
_RATE_CASE = "CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in MIX_RATES.items()
) + " ELSE 0 END"

ORACLE["mixture_sample"] = f"""
        SELECT lang,
               count(*) AS kept_docs,
               sum(len({_TOKS_SQL}))::BIGINT AS kept_tokens
        FROM documents
        WHERE {_H60_DOCID} % {MIX_DENOM} < {_RATE_CASE}
        GROUP BY lang
        ORDER BY lang
    """

ORACLE["shard_packing"] = f"""
        WITH sized AS (
            SELECT lang, doc_id,
                   len({_TOKS_SQL}) AS tok_cnt,
                   {_H60_DOCID} AS h
            FROM documents
        ),
        packed AS (
            SELECT lang,
                   CAST(floor(
                       (sum(tok_cnt) OVER (PARTITION BY lang ORDER BY h, doc_id)
                        - tok_cnt) * 1.0 / {SHARD_TOKENS}
                   ) AS BIGINT) AS shard,
                   tok_cnt
            FROM sized
        )
        SELECT lang, shard,
               count(*) AS n_docs,
               sum(tok_cnt)::BIGINT AS shard_tokens
        FROM packed
        GROUP BY lang, shard
        ORDER BY lang, shard
    """

ORACLE["quality_bigram_lm"] = r"""
        WITH t AS (
            SELECT doc_id, source,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ),
        pairs AS (
            SELECT doc_id, source, toks[i] AS prev,
                   toks[i] || ' ' || toks[i + 1] AS bigram
            FROM t, unnest(range(1, len(toks))) AS u(i)
        ),
        b_cnt AS (SELECT bigram, count(*) AS bc FROM pairs GROUP BY bigram),
        p_cnt AS (SELECT prev, count(*) AS pc FROM pairs GROUP BY prev),
        scored AS (
            SELECT doc_id, source, -ln(bc * 1.0 / pc) AS neg_logp
            FROM pairs JOIN b_cnt USING (bigram) JOIN p_cnt USING (prev)
        ),
        per_doc AS (
            SELECT doc_id, source, avg(neg_logp) AS doc_nlp
            FROM scored GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_docs,
               ROUND(avg(doc_nlp), 4) AS mean_nlp,
               ROUND(min(doc_nlp), 4) AS min_nlp,
               ROUND(max(doc_nlp), 4) AS max_nlp
        FROM per_doc GROUP BY source ORDER BY source
    """

ORACLE["quality_unigram_lm"] = r"""
        WITH toks AS (
            SELECT doc_id, source,
                   unnest(regexp_split_to_array(lower(text), '\s+')) AS tok
            FROM documents
        ),
        vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY tok),
        tot AS (SELECT sum(cnt) AS total FROM vocab),
        scored AS (
            SELECT doc_id, source, -ln(cnt * 1.0 / total) AS neg_logp
            FROM toks JOIN vocab USING (tok), tot
        ),
        per_doc AS (
            SELECT doc_id, source, avg(neg_logp) AS doc_nlp
            FROM scored GROUP BY 1, 2
        )
        SELECT source,
               count(*) AS n_docs,
               ROUND(avg(doc_nlp), 4) AS mean_nlp,
               ROUND(min(doc_nlp), 4) AS min_nlp,
               ROUND(max(doc_nlp), 4) AS max_nlp
        FROM per_doc GROUP BY source ORDER BY source
    """
