"""Query-DSL batch 7: the remaining OpenSearch query/agg node types a
dashboard user of the reference stack (TDD :1624-1653,
DASHBOARD_GUIDE.md:30-135) reaches for — ``ids``, ``exists``/
``missing`` buckets, ``rank_feature`` (saturation), ``script_score``,
``span_first``, ``match_phrase_prefix``, ``weighted_avg``,
``categorize_text``, ``significant_text``, and
``variable_width_histogram`` (equi-depth form).

Every implementation is a single declarative Catalyst plan (no Python
row path); every entry has a value-checked DuckDB oracle. Scale notes
inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.functions.fulltext import (
    analyze_sql,
    analyze_tokens,
)
from postgres_opensearch_cdc_spark.registry import load_table

# Fixture constants shared by Spark plans and oracle SQL.
IDS = [3, 7, 17, 29, 42]
RECENT_CUTOFF = "2001-01-01"  # orders at/after this date = "recent"
RF_PIVOT, RF_BOOST = 50.0, 2.0  # rank_feature saturation params
SPAN_FIRST_TERM, SPAN_FIRST_END = "spark", 10
SPAN_OR_A, SPAN_OR_B = "merge", "scan"  # span_or clauses
SPAN_NOT_INC, SPAN_NOT_EXC, SPAN_NOT_DIST = "query", "group", 2
SUGGEST_TEXT, SUGGEST_MAX_DIST, SUGGEST_SIZE = "pert", 2, 8
SPAN_CONT_B1, SPAN_CONT_B2, SPAN_CONT_L, SPAN_CONT_SLOP = (
    "join", "merge", "key", 8)
# span_within: little span (L1, L2 within LSLOP) strictly inside the
# big span (B1, B2 within BSLOP)
SPAN_WITHIN_B1, SPAN_WITHIN_B2, SPAN_WITHIN_BSLOP = "hash", "batch", 12
SPAN_WITHIN_L1, SPAN_WITHIN_L2, SPAN_WITHIN_LSLOP = "row", "filter", 3
CONST_SCORE_TYPE, CONST_SCORE_MIN, CONST_SCORE_BOOST = "click", 100.0, 1.2
RANK_EVAL_T1, RANK_EVAL_T2, RANK_EVAL_K = "spark", "streaming", 10
PHRASE_PREFIX_RE = r"\bwindow st[a-z]*"  # match_phrase_prefix "window st"
SIG_TEXT_FG_SOURCE = "src1"
SIG_TEXT_MIN_BG = 25
VWH_BUCKETS = 8


def ids_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ids`` query: fetch documents by an explicit id list. Compiles
    to an IN-filter pushed to the parquet scan (``PushedFilters:
    [In(doc_id, ...)]``) — at 100 TB with id-sorted/bucketed files this
    is a row-group-pruned point lookup, the mirror-side equivalent of
    the reference's ``_mget``."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("doc_id").isin(IDS))
        .select("doc_id", "source", "n_chars")
        .orderBy("doc_id")
    )


def exists_missing_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``exists`` / ``missing`` aggregations over a genuinely sparse
    field: customers' most recent order date since RECENT_CUTOFF (NULL
    for customers with no recent order — the fixture's only natural
    nullable field shape). Per market segment: total customers, those
    where the field exists, and the ``missing`` bucket. The order side
    pre-aggregates to (custkey, max_date) before the join, so only one
    row per customer crosses the shuffle; the final agg is a 5-key
    partial."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    recent = (
        orders.filter(F.col("o_orderdate") >= F.lit(RECENT_CUTOFF).cast("timestamp"))
        .groupBy("o_custkey")
        .agg(F.max("o_orderdate").alias("last_recent"))
    )
    return (
        cust.join(recent, cust["c_custkey"] == recent["o_custkey"], "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.count("last_recent").alias("field_exists"),
            F.sum(F.col("last_recent").isNull().cast("long")).alias(
                "field_missing"
            ),
        )
        .orderBy("c_mktsegment")
    )


def rank_feature_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rank_feature`` with the ``saturation`` function: score =
    boost * value / (value + pivot) — monotone, bounded relevance from
    a numeric feature. Pure scan-stage codegen; the top-k compiles to
    TakeOrderedAndProject (no global sort)."""
    ev = load_table(spark, sf_dir, "events")
    score = F.round(
        F.lit(RF_BOOST) * F.col("value") / (F.col("value") + F.lit(RF_PIVOT)), 6
    )
    return (
        ev.select("event_id", "event_type", score.alias("score"))
        .orderBy(F.col("score").desc(), "event_id")
        .limit(15)
    )


def script_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``script_score``: a custom scoring expression over the organic
    fields and a JSON payload attribute — ``sqrt(value) + sqrt(k)``.
    The script compiles to JVM expressions in the scan projection (the
    exact capability script engines interpret per-doc); top-k is
    TakeOrderedAndProject. sqrt is correctly-rounded IEEE (bitwise
    identical across engines), unlike log/log1p whose libm
    implementations can differ by 1 ULP and tie-flip the rounding."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("double")
    score = F.round(F.sqrt(F.col("value")) + F.sqrt(k), 6)
    return (
        ev.select("event_id", score.alias("score"))
        .orderBy(F.col("score").desc(), "event_id")
        .limit(15)
    )


def span_first_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_first``: the term must occur within the first ``end``
    token positions. ``array_position`` over the whitespace tokenization
    gives the 1-based first occurrence — scan-stage codegen, no explode;
    emits the position so the oracle value-checks it."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")
    first_pos = F.array_position(toks, SPAN_FIRST_TERM)
    return (
        docs.select("doc_id", first_pos.alias("first_pos"))
        .filter((F.col("first_pos") >= 1) & (F.col("first_pos") <= SPAN_FIRST_END))
        .orderBy("doc_id")
    )


def span_or_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_or``: match any clause; emits the earliest first
    occurrence position across the clause terms. ``array_position``
    per term (scan-stage codegen, no explode) with 0-as-absent mapped
    to null, combined by ``least`` (smallest non-null) — the
    multi-term generalization of span_first's position probe."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def first_pos(term: str):
        ap = F.array_position(toks, term)
        return F.when(ap > 0, ap)

    earliest = F.least(first_pos(SPAN_OR_A), first_pos(SPAN_OR_B))
    return (
        docs.select("doc_id", earliest.alias("first_pos"))
        .filter(F.col("first_pos").isNotNull())
        .orderBy("doc_id")
    )


def span_not_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_not``: occurrences of the include term that are NOT
    within ``dist`` tokens of any exclude-term occurrence. Positions
    come from transform's (element, index) lambda (the span_near
    machinery — never element_at inside a lambda, querydsl.py:664);
    the surviving count is a filter over the include positions whose
    min distance to every exclude position exceeds the window
    (vacuously clear when the exclude term is absent). Emits docs with
    >=1 clear occurrence and the count."""
    from postgres_opensearch_cdc_spark.functions.dedup import _ensure_parallelism

    docs = _ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def positions(term: str):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i)),
            lambda x: x.isNotNull(),
        )

    pos_inc, pos_exc = positions(SPAN_NOT_INC), positions(SPAN_NOT_EXC)
    clear = F.filter(
        pos_inc,
        lambda a: F.coalesce(
            F.array_min(F.transform(pos_exc, lambda b: F.abs(a - b)))
            > SPAN_NOT_DIST,
            F.lit(True),  # no exclude occurrences => trivially clear
        ),
    )
    return (
        docs.select("doc_id", F.size(clear).alias("n_clear"))
        .filter(F.col("n_clear") > 0)
        .orderBy("doc_id")
    )


def term_suggester(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``suggest`` with the ``term`` suggester (did-you-mean): corpus
    vocabulary terms within edit distance {SUGGEST_MAX_DIST} of the
    misspelled input, ranked by document frequency then distance. The
    levenshtein filter runs on the AGGREGATED vocabulary (distinct
    terms, tiny vs the corpus), never per corpus row — one explode +
    term-keyed agg, then a vocab-sized scan; engine-portable because
    DuckDB ships the same levenshtein."""
    docs = load_table(spark, sf_dir, "documents")
    term = F.explode(
        F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    ).alias("term")
    vocab = docs.select(term).groupBy("term").agg(
        F.count(F.lit(1)).alias("doc_freq")
    )
    dist = F.levenshtein(F.col("term"), F.lit(SUGGEST_TEXT))
    return (
        vocab.withColumn("distance", dist)
        .filter((F.col("distance") <= SUGGEST_MAX_DIST)
                & (F.col("distance") > 0)
                & (F.length("term") >= 3))
        .orderBy(F.col("doc_freq").desc(), F.col("distance"), F.col("term"))
        .limit(SUGGEST_SIZE)
    )


def span_containing_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_containing``: the big span (two terms within ``slop``)
    must strictly contain an occurrence of the little term. Windows
    come from the span_near pairwise machinery ((element, index)
    transform positions, struct lo/hi per pair, width-filtered); the
    containment test is an exists over the window list per little-term
    position. All array HOFs inside the scan projection — zero
    shuffle, no token explosion. Emits the count of contained little
    positions per matching doc."""
    from postgres_opensearch_cdc_spark.functions.dedup import _ensure_parallelism

    docs = _ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def positions(term: str):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i)),
            lambda x: x.isNotNull(),
        )

    pos1, pos2, posl = (positions(SPAN_CONT_B1), positions(SPAN_CONT_B2),
                        positions(SPAN_CONT_L))
    wins = F.filter(
        F.flatten(F.transform(pos1, lambda a: F.transform(
            pos2, lambda b: F.struct(
                F.least(a, b).alias("lo"), F.greatest(a, b).alias("hi"))
        ))),
        lambda w: (w["hi"] - w["lo"]) <= SPAN_CONT_SLOP,
    )
    contained = F.filter(
        posl,
        lambda p: F.exists(wins, lambda w: (p > w["lo"]) & (p < w["hi"])),
    )
    return (
        docs.select("doc_id", F.size(contained).alias("n_contained"))
        .filter(F.col("n_contained") > 0)
        .orderBy("doc_id")
    )


def span_within_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_within``: the dual of span_containing — the LITTLE span
    (two terms within SPAN_WITHIN_LSLOP) must lie strictly inside a
    BIG span (two terms within SPAN_WITHIN_BSLOP). Both window lists
    come from the span_near pairwise machinery ((element, index)
    transform positions → lo/hi structs → width filter); the match
    test is window-in-window (little.lo > big.lo AND little.hi <
    big.hi), observable as distinct from span_containing because the
    little side is itself a span, not a single position. All array
    HOFs in the scan projection — zero shuffle. Emits the count of
    little windows inside any big window."""
    from postgres_opensearch_cdc_spark.functions.dedup import _ensure_parallelism

    docs = _ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def positions(term: str):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i)),
            lambda x: x.isNotNull(),
        )

    def windows(term_a: str, term_b: str, slop: int):
        return F.filter(
            F.flatten(F.transform(positions(term_a), lambda a: F.transform(
                positions(term_b), lambda b: F.struct(
                    F.least(a, b).alias("lo"), F.greatest(a, b).alias("hi"))
            ))),
            lambda w: (w["hi"] - w["lo"]) <= slop,
        )

    big = windows(SPAN_WITHIN_B1, SPAN_WITHIN_B2, SPAN_WITHIN_BSLOP)
    little = windows(SPAN_WITHIN_L1, SPAN_WITHIN_L2, SPAN_WITHIN_LSLOP)
    within = F.filter(
        little,
        lambda l: F.exists(
            big, lambda w: (l["lo"] > w["lo"]) & (l["hi"] < w["hi"])
        ),
    )
    return (
        docs.select("doc_id", F.size(within).alias("n_within"))
        .filter(F.col("n_within") > 0)
        .orderBy("doc_id")
    )


def constant_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``constant_score``: wrap a filter context and assign every hit
    the fixed ``boost`` as its score (no relevance computation — the
    classic way to mix a pure filter into a scored bool). The filter
    pushes to the parquet scan; the score is a literal projection."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.filter(
            (F.col("event_type") == CONST_SCORE_TYPE)
            & (F.col("value") >= CONST_SCORE_MIN)
        )
        .select("event_id", F.lit(CONST_SCORE_BOOST).alias("score"))
        .orderBy("event_id")
    )


def rank_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``_rank_eval``: precision@5 / precision@10 / MRR for one ranked
    query. Ranking = docs matching either term, ordered by n_chars
    desc (deterministic tie-break doc_id); relevant = docs containing
    BOTH terms. The ranking is a TakeOrderedAndProject top-K — never a
    global sort — and the metrics fold into ONE single-row aggregate
    over those K rows, so evaluation cost is O(K) after the scan
    regardless of corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    has1 = F.lower(F.col("text")).rlike(rf"\b{RANK_EVAL_T1}\b")
    has2 = F.lower(F.col("text")).rlike(rf"\b{RANK_EVAL_T2}\b")
    topk = (
        docs.filter(has1 | has2)
        .select("doc_id", "n_chars", (has1 & has2).alias("rel"))
        .orderBy(F.col("n_chars").desc(), "doc_id")
        .limit(RANK_EVAL_K)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = topk.withColumn("rank", F.row_number().over(w))
    rel_int = F.col("rel").cast("int")
    return ranked.agg(
        F.round(F.sum(F.when(F.col("rank") <= 5, rel_int)) / 5.0, 4)
        .alias("precision_at_5"),
        F.round(F.sum(rel_int) / float(RANK_EVAL_K), 4)
        .alias("precision_at_10"),
        F.round(F.coalesce(
            F.max(F.when(F.col("rel"), 1.0 / F.col("rank"))), F.lit(0.0)
        ), 4).alias("mrr"),
    )


def match_phrase_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_phrase_prefix``: a phrase whose final term is a prefix
    ("window st" → "window stream", "window stats", ...). On the
    whitespace-tokenized corpus the positional constraint folds into a
    word-boundary regex count — map-only scan + TakeOrderedAndProject,
    same shape as ``match_phrase`` (q02f)."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.regexp_count(F.col("text"), F.lit(PHRASE_PREFIX_RE))
    return (
        docs.select("doc_id", n.alias("phrase_count"))
        .filter(F.col("phrase_count") > 0)
        .orderBy(F.col("phrase_count").desc(), "doc_id")
    )


def weighted_avg_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``weighted_avg`` aggregation: per event type, the value average
    weighted by the JSON payload's ``k`` attribute — sum(v*w)/sum(w) as
    two partial-aggregated sums in ONE pass (the engine's scripted
    two-accumulator form, but JVM-side)."""
    ev = load_table(spark, sf_dir, "events")
    w = F.get_json_object(F.col("props"), "$.k").cast("double")
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(F.sum(F.col("value") * w) / F.sum(w), 4).alias("weighted_avg"),
            F.count(F.lit(1)).alias("doc_count"),
        )
        .orderBy("event_type")
    )


def categorize_text_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``categorize_text``: bucket free text by a normalized token
    pattern — here the first two ANALYZED tokens (lowercase, stopword-
    stripped, stemmed), the deterministic core of the log-categorizer.
    The analyzer chain is shared verbatim with the oracle SQL; one
    small-key shuffle over the category dictionary."""
    docs = load_table(spark, sf_dir, "documents")
    toks = analyze_tokens(F.col("text"))
    # try_element_at, not element_at: under ANSI mode (Spark 4 default)
    # element_at THROWS on a doc with <2 analyzed tokens (empty / all
    # stopwords), while the oracle's t[2] quietly returns NULL;
    # concat_ws skips NULLs identically in both engines
    cat = F.concat_ws(
        " ", F.try_element_at(toks, F.lit(1)), F.try_element_at(toks, F.lit(2))
    )
    return (
        docs.select(cat.alias("category"))
        .groupBy("category")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy(F.col("doc_count").desc(), "category")
        .limit(15)
    )


def significant_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``significant_text``: analyzed tokens over-represented in the
    foreground source vs the whole corpus by OCCURRENCE frequency
    (significant_terms uses document frequency — this is the free-text
    twin that re-analyzes the source field). Score = (fg/fg_total) /
    (bg/bg_total). One explode, one term-keyed agg; corpus totals ride
    along as a broadcast one-row cross join. At 100 TB the term
    dictionary is small by Zipf's law and the agg partials combine
    map-side."""
    docs = load_table(spark, sf_dir, "documents")
    is_fg = (F.col("source") == SIG_TEXT_FG_SOURCE).cast("long")
    base = docs.select(
        is_fg.alias("is_fg"),
        F.explode(analyze_tokens(F.col("text"))).alias("term"),
    )
    per_term = base.groupBy("term").agg(
        F.sum("is_fg").alias("fg"), F.count(F.lit(1)).alias("bg")
    )
    # corpus totals from token-array sizes: a map-only 1-row aggregate
    # over a second cheap scan — NOT a second explode of the corpus
    # (sum over terms of occurrences == total analyzed tokens)
    n_toks = F.size(analyze_tokens(F.col("text"))).cast("long")
    totals = docs.select(
        (n_toks * is_fg).alias("fg_toks"), n_toks.alias("toks")
    ).agg(F.sum("fg_toks").alias("fg_total"), F.sum("toks").alias("bg_total"))
    return (
        per_term.crossJoin(F.broadcast(totals))
        .filter((F.col("fg") > 0) & (F.col("bg") >= SIG_TEXT_MIN_BG))
        .select(
            "term",
            "fg",
            "bg",
            F.round(
                (F.col("fg") / F.col("fg_total"))
                / (F.col("bg") / F.col("bg_total")),
                6,
            ).alias("score"),
        )
        .orderBy(F.col("score").desc(), "term")
        .limit(10)
    )


def variable_width_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``variable_width_histogram`` (equi-depth form): buckets sized to
    equal document counts rather than equal value widths — the
    deterministic counterpart of ES's clustering heuristic. Bucket
    assignment is exact NTILE semantics computed DISTRIBUTED
    (round 12): global rank from the two-phase range-partition +
    offset construction (functions/ranking.py), then NTILE as
    arithmetic on (rank, n) — one range shuffle, no single-partition
    window over the event scan; per-bucket min/max/avg/count
    summarize the variable widths. The oracle still uses the ntile
    window built-in, so the distributed form is value-checked against
    the canonical definition."""
    from postgres_opensearch_cdc_spark.functions.ranking import (
        ntile_expr,
        with_global_rank,
    )

    ev = load_table(spark, sf_dir, "events").select("value", "event_id")
    ranked, n = with_global_rank(ev, ["value", "event_id"])
    bucketed = ranked.select(
        "value", ntile_expr("_r", n, VWH_BUCKETS).alias("bucket")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
            F.round(F.avg("value"), 4).alias("centroid"),
            F.count(F.lit(1)).alias("doc_count"),
        )
        .orderBy("bucket")
    )


QUERIES = {
    "ids_query": ids_query,
    "exists_missing_agg": exists_missing_agg,
    "rank_feature_query": rank_feature_query,
    "script_score_query": script_score_query,
    "span_first_query": span_first_query,
    "span_or_query": span_or_query,
    "span_not_query": span_not_query,
    "term_suggester": term_suggester,
    "span_containing_query": span_containing_query,
    "span_within_query": span_within_query,
    "constant_score_query": constant_score_query,
    "rank_eval": rank_eval,
    "match_phrase_prefix": match_phrase_prefix,
    "weighted_avg_agg": weighted_avg_agg,
    "categorize_text_agg": categorize_text_agg,
    "significant_text": significant_text,
    "variable_width_histogram": variable_width_histogram,
}

_IDS_SQL = ", ".join(str(i) for i in IDS)

ORACLE = {
    "ids_query": f"""
        SELECT doc_id, source, n_chars FROM documents
        WHERE doc_id IN ({_IDS_SQL}) ORDER BY doc_id
    """,
    "exists_missing_agg": f"""
        WITH recent AS (
            SELECT o_custkey, MAX(o_orderdate) AS last_recent
            FROM orders WHERE o_orderdate >= TIMESTAMP '{RECENT_CUTOFF}'
            GROUP BY o_custkey
        )
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               COUNT(last_recent) AS field_exists,
               CAST(SUM(CASE WHEN last_recent IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS field_missing
        FROM customer LEFT JOIN recent ON c_custkey = o_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "rank_feature_query": f"""
        SELECT event_id, event_type,
               ROUND({RF_BOOST} * value / (value + {RF_PIVOT}), 6) AS score
        FROM events
        ORDER BY score DESC, event_id LIMIT 15
    """,
    "script_score_query": """
        SELECT event_id,
               ROUND(SQRT(value)
                     + SQRT(CAST(json_extract_string(props, '$.k')
                                 AS DOUBLE)), 6) AS score
        FROM events
        ORDER BY score DESC, event_id LIMIT 15
    """,
    "span_or_query": rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ), p AS (
            SELECT doc_id,
                   NULLIF(list_position(toks, '{SPAN_OR_A}'), 0) AS pa,
                   NULLIF(list_position(toks, '{SPAN_OR_B}'), 0) AS pb
            FROM t
        )
        SELECT doc_id,
               CAST(LEAST(COALESCE(pa, 1 << 30), COALESCE(pb, 1 << 30))
                    AS BIGINT) AS first_pos
        FROM p
        WHERE pa IS NOT NULL OR pb IS NOT NULL
        ORDER BY doc_id
    """,
    "span_not_query": rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ), pos AS (
            SELECT doc_id,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_NOT_INC}') AS pi,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_NOT_EXC}') AS pe
            FROM t
        ), c AS (
            SELECT doc_id,
                   CAST(len(list_filter(pi,
                       a -> COALESCE(list_min(
                                list_transform(pe, b -> abs(a - b)))
                            > {SPAN_NOT_DIST}, true))) AS INT) AS n_clear
            FROM pos
        )
        SELECT doc_id, n_clear FROM c WHERE n_clear > 0 ORDER BY doc_id
    """,
    "term_suggester": rf"""
        WITH vocab AS (
            SELECT tok AS term, COUNT(*) AS doc_freq
            FROM (
                SELECT unnest(list_distinct(
                    regexp_split_to_array(lower(text), '\s+'))) AS tok
                FROM documents
            )
            GROUP BY tok
        )
        SELECT term, doc_freq,
               CAST(levenshtein(term, '{SUGGEST_TEXT}') AS INT) AS distance
        FROM vocab
        WHERE levenshtein(term, '{SUGGEST_TEXT}') <= {SUGGEST_MAX_DIST}
          AND levenshtein(term, '{SUGGEST_TEXT}') > 0
          AND length(term) >= 3
        ORDER BY doc_freq DESC, distance, term
        LIMIT {SUGGEST_SIZE}
    """,
    "span_containing_query": rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ), p AS (
            SELECT doc_id,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_CONT_B1}') AS pa,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_CONT_B2}') AS pb,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_CONT_L}') AS pl
            FROM t
        ), w AS (
            SELECT doc_id, pl,
                   list_filter(
                       flatten(list_transform(pa, a -> list_transform(
                           pb, b -> {{'lo': least(a, b),
                                      'hi': greatest(a, b)}}))),
                       w -> w.hi - w.lo <= {SPAN_CONT_SLOP}) AS wins
            FROM p
        ), c AS (
            SELECT doc_id,
                   CAST(len(list_filter(pl,
                       p -> len(list_filter(wins,
                           w -> p > w.lo AND p < w.hi)) > 0)) AS INT)
                       AS n_contained
            FROM w
        )
        SELECT doc_id, n_contained FROM c
        WHERE n_contained > 0 ORDER BY doc_id
    """,
    # positions are 1-based here vs 0-based in Spark's (element, index)
    # transform — window-in-window strict inequalities are invariant
    # under the constant shift
    "span_within_query": rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ), p AS (
            SELECT doc_id,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_WITHIN_B1}') AS ba,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_WITHIN_B2}') AS bb,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_WITHIN_L1}') AS la,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_WITHIN_L2}') AS lb
            FROM t
        ), w AS (
            SELECT doc_id,
                   list_filter(
                       flatten(list_transform(ba, a -> list_transform(
                           bb, b -> {{'lo': least(a, b),
                                      'hi': greatest(a, b)}}))),
                       w -> w.hi - w.lo <= {SPAN_WITHIN_BSLOP}) AS big,
                   list_filter(
                       flatten(list_transform(la, a -> list_transform(
                           lb, b -> {{'lo': least(a, b),
                                      'hi': greatest(a, b)}}))),
                       w -> w.hi - w.lo <= {SPAN_WITHIN_LSLOP}) AS little
            FROM p
        ), c AS (
            SELECT doc_id,
                   CAST(len(list_filter(little,
                       l -> len(list_filter(big,
                           w -> l.lo > w.lo AND l.hi < w.hi)) > 0)) AS INT)
                       AS n_within
            FROM w
        )
        SELECT doc_id, n_within FROM c
        WHERE n_within > 0 ORDER BY doc_id
    """,
    "constant_score_query": f"""
        SELECT event_id, {CONST_SCORE_BOOST}::DOUBLE AS score FROM events
        WHERE event_type = '{CONST_SCORE_TYPE}'
          AND value >= {CONST_SCORE_MIN}
        ORDER BY event_id
    """,
    "rank_eval": rf"""
        WITH m AS (
            SELECT doc_id, n_chars,
                   regexp_matches(lower(text), '\b{RANK_EVAL_T1}\b') AND
                   regexp_matches(lower(text), '\b{RANK_EVAL_T2}\b') AS rel
            FROM documents
            WHERE regexp_matches(lower(text), '\b{RANK_EVAL_T1}\b')
               OR regexp_matches(lower(text), '\b{RANK_EVAL_T2}\b')
            ORDER BY n_chars DESC, doc_id
            LIMIT {RANK_EVAL_K}
        ), r AS (
            SELECT rel,
                   ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rank
            FROM m
        )
        SELECT ROUND(SUM(CASE WHEN rank <= 5 THEN rel::INT END) / 5.0, 4)
                   AS precision_at_5,
               ROUND(SUM(rel::INT) / {RANK_EVAL_K}.0, 4) AS precision_at_10,
               ROUND(COALESCE(MAX(CASE WHEN rel THEN 1.0 / rank END), 0.0), 4)
                   AS mrr
        FROM r
    """,
    "span_first_query": rf"""
        SELECT doc_id,
               CAST(list_position(regexp_split_to_array(lower(text), '\s+'),
                                  '{SPAN_FIRST_TERM}') AS BIGINT) AS first_pos
        FROM documents
        WHERE list_position(regexp_split_to_array(lower(text), '\s+'),
                            '{SPAN_FIRST_TERM}')
              BETWEEN 1 AND {SPAN_FIRST_END}
        ORDER BY doc_id
    """,
    "match_phrase_prefix": rf"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{PHRASE_PREFIX_RE}'))
                    AS INTEGER) AS phrase_count
        FROM documents
        WHERE len(regexp_extract_all(text, '{PHRASE_PREFIX_RE}')) > 0
        ORDER BY phrase_count DESC, doc_id
    """,
    "weighted_avg_agg": """
        SELECT event_type,
               ROUND(SUM(value * k) / SUM(k), 4) AS weighted_avg,
               COUNT(*) AS doc_count
        FROM (
            SELECT event_type, value,
                   CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k
            FROM events
        )
        GROUP BY event_type ORDER BY event_type
    """,
    "categorize_text_agg": f"""
        WITH toks AS (
            SELECT {analyze_sql('text')} AS t FROM documents
        )
        SELECT concat_ws(' ', t[1], t[2]) AS category,
               COUNT(*) AS doc_count
        FROM toks
        GROUP BY category
        ORDER BY doc_count DESC, category LIMIT 15
    """,
    "significant_text": f"""
        WITH terms AS (
            SELECT CASE WHEN source = '{SIG_TEXT_FG_SOURCE}'
                        THEN 1 ELSE 0 END AS is_fg,
                   unnest({analyze_sql('text')}) AS term
            FROM documents
        ),
        per_term AS (
            SELECT term, CAST(SUM(is_fg) AS BIGINT) AS fg,
                   COUNT(*) AS bg
            FROM terms GROUP BY term
        ),
        totals AS (
            SELECT CAST(SUM(fg) AS DOUBLE) AS fg_total,
                   CAST(SUM(bg) AS DOUBLE) AS bg_total
            FROM per_term
        )
        SELECT term, fg, bg,
               ROUND((fg / fg_total) / (bg / bg_total), 6) AS score
        FROM per_term, totals
        WHERE fg > 0 AND bg >= {SIG_TEXT_MIN_BG}
        ORDER BY score DESC, term LIMIT 10
    """,
    "variable_width_histogram": f"""
        WITH bucketed AS (
            SELECT value,
                   ntile({VWH_BUCKETS}) OVER (ORDER BY value, event_id)
                       AS bucket
            FROM events
        )
        SELECT bucket, ROUND(MIN(value), 2) AS lo, ROUND(MAX(value), 2) AS hi,
               ROUND(AVG(value), 4) AS centroid, COUNT(*) AS doc_count
        FROM bucketed
        GROUP BY bucket ORDER BY bucket
    """,
}
