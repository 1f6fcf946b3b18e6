"""Q1-Q12: the reference's complete analytics query surface
(reference DASHBOARD_GUIDE.md:30-135; TDD :1624-1653), re-expressed as
declarative DataFrame plans over the driver testdata tables.

Every query here compiles to a single Catalyst plan with predicate
pushdown into the parquet scan, column pruning to exactly the projected
set, partial+final aggregation for the agg shapes, and
TakeOrderedAndProject for the top-N shapes — verified in
tests/test_plans.py. Nothing in this module touches Python row-at-a-time
execution.

Naming: every computed column is aliased identically to the oracle SQL
(driver hash-compares by sorted column name).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

# Full-text fixture query for Q2 (reference example: "wireless bluetooth
# headphones", TDD :1636-1641) translated to the documents-table vocab.
FULLTEXT_TERMS = ["spark", "query", "join"]


def q01_term_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 equality/term filter (TDD :1628-1633): one predicate, pushed to
    the scan. Reference: {"term": {"customer_id": 456}}."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


def q02_fulltext_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 analyzed full-text match with relevance ranking (TDD :1636-1641).

    OpenSearch semantics: analyze the query into terms, OR them, rank by
    relevance. Spark mapping (SURVEY §2.4): token-overlap scoring —
    score = |distinct query terms present in the document token set|,
    keep score > 0, rank descending. BM25 fidelity is documented as out
    of scope (SURVEY §7.4.4); the ranking ORDER here (overlap count) is
    the deterministic, oracle-checkable core.
    """
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    terms = F.array(*[F.lit(t) for t in FULLTEXT_TERMS])
    score = F.size(F.array_intersect(tokens, terms))
    return (
        docs.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
    )


def q02b_fulltext_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 fidelity upgrade: TF-IDF relevance ranking — one step closer to
    OpenSearch's BM25 than raw overlap (SURVEY §7.4.4), still fully
    declarative and oracle-checkable.

    score(doc) = Σ_{t ∈ query ∩ doc} tf(t,doc) · ln(N / df(t)).
    df comes from one aggregation over the exploded term-postings of the
    query terms only (never the full vocabulary — the scan filters to
    the 3 query terms before the explode-aggregate, so the "index build"
    cost is proportional to query selectivity, not corpus vocabulary).
    """
    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in FULLTEXT_TERMS])
    toks = F.split(F.lower(F.col("text")), r"\s+")
    # per-doc term frequencies of the query terms
    tf = docs.select(
        "doc_id",
        F.explode(
            F.filter(toks, lambda t: F.array_contains(terms, t))
        ).alias("term"),
    ).groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # corpus size rides along as a broadcast one-row cross join — the
    # whole query stays a single Spark job (no driver-side count())
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("w", F.col("tf") * F.log(F.col("n_docs") / F.col("df")))
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("tfidf"))
    )
    return scored.orderBy(F.col("tfidf").desc(), F.col("doc_id")).limit(50)


def q02c_fulltext_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 full fidelity: Okapi BM25 (k1=1.2, b=0.75) — the scoring
    function OpenSearch actually uses for relevance (TDD :1636-1641),
    closing the SURVEY §7.4.4 divergence for conjunctive term queries.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·dl/avgdl))
    with idf(t) = ln(1 + (N−df+0.5)/(df+0.5)) — Lucene's formulation.
    Postings are built only for the query terms; doc length and avgdl
    come from one metadata pass. Entirely built-in expressions.
    """
    k1, b = 1.2, 0.75
    docs = load_table(spark, sf_dir, "documents")
    terms = F.array(*[F.lit(t) for t in FULLTEXT_TERMS])
    toks = F.split(F.lower(F.col("text")), r"\s+")
    lengths = docs.select("doc_id", F.size(toks).alias("dl"))
    # N and avgdl as a broadcast one-row stats frame — single job, no
    # driver-side count()/head() metadata actions
    stats = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    tf = (
        docs.select(
            "doc_id",
            F.explode(F.filter(toks, lambda t: F.array_contains(terms, t))).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(lengths, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "w",
            idf
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 6).alias("bm25"))
    )
    return scored.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(50)


# The parameterized query-string surface (reference analyzer TDD
# :527-533; bool/query_string DSL TDD :1636-1641): any query text, with
# should/must boolean semantics. "the joined sparks and queries"
# analyzes (stopword-strip + stem) to the 3 clauses [join, spark, query].
QUERYSTRING_FIXTURE = "the joined sparks and queries"


def q02d_querystring_should(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query_string, should-mode (OR): analyzed multi-clause BM25 —
    documents matching ANY clause, ranked. The generalized, parameterized
    form of q02c's fixed-term query."""
    from postgres_opensearch_cdc_spark.functions.fulltext import query_string_bm25

    docs = load_table(spark, sf_dir, "documents")
    return query_string_bm25(docs, QUERYSTRING_FIXTURE, mode="should")


def q02e_querystring_must(spark: SparkSession, sf_dir: str) -> DataFrame:
    """query_string, must-mode (AND): every analyzed clause required —
    the ≥2-clause boolean conjunction of full-text predicates."""
    from postgres_opensearch_cdc_spark.functions.fulltext import query_string_bm25

    docs = load_table(spark, sf_dir, "documents")
    return query_string_bm25(docs, QUERYSTRING_FIXTURE, mode="must")


def q03_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3 range predicate (DASHBOARD_GUIDE.md:102-109): amount >= bound,
    pushed down to the parquet scan as a min/max-stats filter."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity") >= 45)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


def q04_bool_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 boolean conjunction (DASHBOARD_GUIDE.md:89,122-135):
    status:F AND totalprice > 100000 AND priority:1-URGENT."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderstatus") == "F")
            & (F.col("o_totalprice") > 100000)
            & (F.col("o_orderpriority") == "1-URGENT")
        )
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


def q05_terms_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5 terms aggregation (TDD :1643-1652; DASHBOARD_GUIDE.md:32-35):
    group-by-count, top buckets by count descending — the "Card Status
    Distribution" pie chart. Partial aggregation makes this one narrow
    shuffle of (n_distinct_keys) rows regardless of input size."""
    return (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("event_type"))
        .limit(10)
    )


def q06_date_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6 date-histogram + sum (DASHBOARD_GUIDE.md:37-40): daily buckets
    of sum(amount). date_trunc stays in codegen; at scale this is the
    shape that benefits most from date-partitioned storage (partition
    pruning on the time filter)."""
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("bucket_day"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"))
    )


def q07_filtered_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 filtered metric counts (DASHBOARD_GUIDE.md:42-46): multiple
    conditional aggregates in one panel/pass — count(active) vs
    count(inactive) vs conditional sum, computed as a single partial-agg
    scan, never N scans."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("purchase_cnt"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
        .cast("long")
        .alias("error_cnt"),
        F.round(
            F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(F.lit(0.0))),
            2,
        ).alias("purchase_value_sum"),
    )


def q08_top_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 projection + sort + top-N table (DASHBOARD_GUIDE.md:58-61).
    Catalyst compiles this to TakeOrderedAndProject: per-partition heap of
    N, merged on the driver — no global sort even at 100 TB."""
    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q09_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 size/limit (DASHBOARD_GUIDE.md:99). Paired with a unique sort
    key so the result set is deterministic for the oracle."""
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type")
        .orderBy("event_id")
        .limit(10)
    )


def q10_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 per-index count (reference test.sh:31 — its own correctness
    oracle). Count-star over parquet reads row-group metadata only."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(F.count(F.lit(1)).alias("cnt"))


def q11_time_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 global time-range filter (DASHBOARD_GUIDE.md:87,113-115). On
    date-partitioned storage this predicate prunes partitions before any
    IO happens."""
    return (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("ts").between(
                F.lit("2024-01-03 00:00:00").cast("timestamp"),
                F.lit("2024-01-05 00:00:00").cast("timestamp"),
            )
        )
        .select("event_id", "ts", "user_id", "event_type")
    )


def q12_index_pattern_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12 index-pattern union scan (DASHBOARD_GUIDE.md:21-24): a query
    over pattern `card*` spans several indices with overlapping schemas.
    Spark mapping: unionByName(allowMissingColumns=True) over the matching
    mirror views — missing columns null-fill, exactly OpenSearch's
    missing-field behavior."""
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("key"),
        F.col("c_name").alias("name"),
        F.round(F.col("c_acctbal"), 2).alias("acctbal"),
        F.col("c_mktsegment").alias("mktsegment"),
        F.lit("customer").alias("src"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("key"),
        F.col("s_name").alias("name"),
        F.round(F.col("s_acctbal"), 2).alias("acctbal"),
        F.lit("supplier").alias("src"),
    )
    return cust.unionByName(supp, allowMissingColumns=True)


# custom analyzer chain: letter tokenizer, lowercase, stopwords,
# one-way synonyms, then the shared suffix stemmer — the index-settings
# shape (analysis.analyzer.custom) a reference user configures per field
_CHAIN_TOKENIZER = "letter"
_CHAIN_FILTERS = (
    ("lowercase",),
    ("stop", ("the", "a", "and", "of")),
    ("synonym", (("streaming", "stream"), ("grouped", "group"))),
    ("stemmer",),
)
_CHAIN_QUERY = "Streaming Joins"
# search-as-you-type chain: edge n-grams 2..5 over lowercased tokens
_EDGE_FILTERS = (("lowercase",), ("edge_ngram", 2, 5))
_EDGE_PREFIX = "spar"


def analyzer_custom_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-composable analyzer chain applied at query time: the query
    string runs through the Python replica, documents through the
    column form, and scoring is summed term frequency over the
    analyzed terms. The whole chain is HOF composition in the scan
    projection; only (doc_id, tf) reaches the top-k."""
    from postgres_opensearch_cdc_spark.functions.analysis import (
        analyze_col,
        analyze_text,
    )

    terms = list(dict.fromkeys(
        analyze_text(_CHAIN_QUERY, _CHAIN_TOKENIZER, _CHAIN_FILTERS)
    ))
    docs = load_table(spark, sf_dir, "documents", spread=True)
    arr = analyze_col(F.col("text"), _CHAIN_TOKENIZER, _CHAIN_FILTERS)
    def _eq(term):
        # single-arg factory: a two-parameter lambda would make the HOF
        # pass (element, index) and shadow the closed-over term
        return lambda x: x == term

    tf = None
    for t in terms:
        c = F.size(F.filter(arr, _eq(t)))
        tf = c if tf is None else (tf + c)
    return (
        docs.select("doc_id", tf.cast("long").alias("tf"))
        .filter(F.col("tf") > 0)
        .orderBy(F.col("tf").desc(), "doc_id")
        .limit(20)
    )


def analyzer_edge_ngram_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search-as-you-type via an edge-ngram analyzer: the 2..5-prefix
    grams are the index; a typed prefix exact-matches its gram. Counts
    tokens starting with the prefix, per document."""
    from postgres_opensearch_cdc_spark.functions.analysis import analyze_col

    docs = load_table(spark, sf_dir, "documents", spread=True)
    arr = analyze_col(F.col("text"), "whitespace", _EDGE_FILTERS)
    hits = F.size(F.filter(arr, lambda g: g == _EDGE_PREFIX))
    return (
        docs.select("doc_id", hits.cast("long").alias("prefix_hits"))
        .filter(F.col("prefix_hits") > 0)
        .orderBy(F.col("prefix_hits").desc(), "doc_id")
        .limit(20)
    )


QUERIES = {
    "q01_term_filter": q01_term_filter,
    "q02_fulltext_match": q02_fulltext_match,
    "q02b_fulltext_tfidf": q02b_fulltext_tfidf,
    "q02c_fulltext_bm25": q02c_fulltext_bm25,
    "q02d_querystring_should": q02d_querystring_should,
    "q02e_querystring_must": q02e_querystring_must,
    "q03_range_filter": q03_range_filter,
    "q04_bool_filter": q04_bool_filter,
    "q05_terms_agg": q05_terms_agg,
    "q06_date_histogram": q06_date_histogram,
    "q07_filtered_metrics": q07_filtered_metrics,
    "q08_top_n": q08_top_n,
    "q09_limit": q09_limit,
    "q10_count": q10_count,
    "q11_time_range": q11_time_range,
    "q12_index_pattern_union": q12_index_pattern_union,
    "analyzer_custom_chain": analyzer_custom_chain,
    "analyzer_edge_ngram_prefix": analyzer_edge_ngram_prefix,
}


def _analyzer_oracles() -> dict:
    from postgres_opensearch_cdc_spark.functions.analysis import (
        analyze_chain_sql,
        analyze_text,
    )

    terms = list(dict.fromkeys(
        analyze_text(_CHAIN_QUERY, _CHAIN_TOKENIZER, _CHAIN_FILTERS)
    ))
    chain = analyze_chain_sql("text", _CHAIN_TOKENIZER, _CHAIN_FILTERS)
    tf = " + ".join(
        f"len(list_filter(toks, x -> x = '{t}'))" for t in terms
    )
    edge = analyze_chain_sql("text", "whitespace", _EDGE_FILTERS)
    return {
        "analyzer_custom_chain": f"""
            SELECT doc_id, tf FROM (
                SELECT doc_id, CAST({tf} AS BIGINT) AS tf
                FROM (SELECT doc_id, {chain} AS toks FROM documents)
            ) WHERE tf > 0 ORDER BY tf DESC, doc_id LIMIT 20
        """,
        "analyzer_edge_ngram_prefix": f"""
            SELECT doc_id, prefix_hits FROM (
                SELECT doc_id,
                       CAST(len(list_filter({edge}, g -> g = '{_EDGE_PREFIX}'))
                            AS BIGINT) AS prefix_hits
                FROM documents
            ) WHERE prefix_hits > 0
            ORDER BY prefix_hits DESC, doc_id LIMIT 20
        """,
    }


ORACLE = {
    "q01_term_filter": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders WHERE o_orderstatus = 'O'
    """,
    "q02_fulltext_match": """
        SELECT doc_id, score FROM (
            SELECT doc_id,
                   CAST(len(list_intersect(
                       list_distinct(regexp_split_to_array(lower(text), '\\s+')),
                       ['spark', 'query', 'join'])) AS INTEGER) AS score
            FROM documents
        ) WHERE score > 0
        ORDER BY score DESC, doc_id
    """,
    "q02b_fulltext_tfidf": """
        WITH tf AS (
            SELECT doc_id, term, count(*) AS tf FROM (
                SELECT doc_id, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    t -> list_contains(['spark','query','join'], t))) AS term
                FROM documents
            ) GROUP BY doc_id, term
        ),
        dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        n AS (SELECT count(*) AS n_docs FROM documents)
        SELECT doc_id, ROUND(SUM(tf * ln(n_docs * 1.0 / df)), 6) AS tfidf
        FROM tf JOIN dfc USING (term), n
        GROUP BY doc_id
        ORDER BY tfidf DESC, doc_id LIMIT 50
    """,
    "q02c_fulltext_bm25": """
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t
            FROM documents
        ),
        lens AS (SELECT doc_id, len(t) AS dl FROM toks),
        stats AS (
            SELECT (SELECT count(*) FROM documents) AS n_docs,
                   (SELECT avg(dl) FROM lens) AS avgdl
        ),
        tf AS (
            SELECT doc_id, term, count(*) AS tf FROM (
                SELECT doc_id, unnest(list_filter(
                    t, x -> list_contains(['spark','query','join'], x))) AS term
                FROM toks
            ) GROUP BY doc_id, term
        ),
        dfc AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
        SELECT doc_id,
               ROUND(SUM(
                   ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                   * (tf * 2.2)
                   / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
               ), 6) AS bm25
        FROM tf JOIN dfc USING (term) JOIN lens USING (doc_id), stats
        GROUP BY doc_id
        ORDER BY bm25 DESC, doc_id LIMIT 50
    """,
    "q03_range_filter": """
        SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
        FROM lineitem WHERE l_quantity >= 45
    """,
    "q04_bool_filter": """
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders
        WHERE o_orderstatus = 'F' AND o_totalprice > 100000
          AND o_orderpriority = '1-URGENT'
    """,
    "q05_terms_agg": """
        SELECT event_type, count(*) AS cnt
        FROM events GROUP BY event_type
        ORDER BY cnt DESC, event_type LIMIT 10
    """,
    "q06_date_histogram": """
        SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS bucket_day,
               ROUND(SUM(o_totalprice), 2) AS sum_totalprice
        FROM orders GROUP BY 1
    """,
    "q07_filtered_metrics": """
        SELECT CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_cnt,
               CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_cnt,
               ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value ELSE 0.0 END), 2) AS purchase_value_sum
        FROM events
    """,
    "q08_top_n": """
        SELECT o_orderkey, o_totalprice, o_orderdate
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "q09_limit": """
        SELECT event_id, user_id, event_type
        FROM events ORDER BY event_id LIMIT 10
    """,
    "q10_count": "SELECT count(*) AS cnt FROM lineitem",
    "q11_time_range": """
        SELECT event_id, ts, user_id, event_type
        FROM events
        WHERE ts BETWEEN TIMESTAMP '2024-01-03 00:00:00'
                     AND TIMESTAMP '2024-01-05 00:00:00'
    """,
    "q12_index_pattern_union": """
        SELECT c_custkey AS key, c_name AS name, ROUND(c_acctbal, 2) AS acctbal,
               c_mktsegment AS mktsegment, 'customer' AS src
        FROM customer
        UNION ALL BY NAME
        SELECT s_suppkey AS key, s_name AS name, ROUND(s_acctbal, 2) AS acctbal,
               NULL AS mktsegment, 'supplier' AS src
        FROM supplier
    """,
}

# query-string oracles generated from the same analyzer constants the
# Spark plan uses (functions/fulltext.py) — value-checked end to end
from postgres_opensearch_cdc_spark.functions.fulltext import query_string_bm25_sql  # noqa: E402

ORACLE["q02d_querystring_should"] = query_string_bm25_sql(
    QUERYSTRING_FIXTURE, mode="should"
)
ORACLE["q02e_querystring_must"] = query_string_bm25_sql(
    QUERYSTRING_FIXTURE, mode="must"
)
ORACLE.update(_analyzer_oracles())
