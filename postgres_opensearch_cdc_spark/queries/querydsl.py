"""OpenSearch query-DSL long tail: phrase / regexp / fuzzy / multi-field
match, keyset pagination, and the aggregation-DSL extras (composite
after-key, top_hits, significant_terms, numeric histogram, pipeline
aggregations).

Reference coverage: these are the query-DSL node types a dashboard user
of the reference stack (OpenSearch behind the CDC mirror, reference
TDD :1624-1653 and DASHBOARD_GUIDE.md) reaches for beyond Q1-Q12:
``match_phrase``, ``regexp``, ``fuzzy``, ``multi_match``,
``search_after``, ``composite`` aggs with ``after``, ``top_hits``,
``significant_terms``, numeric ``histogram``, and the pipeline aggs
(``cumulative_sum`` / ``derivative`` / ``moving_avg``).

Every implementation is a single declarative Catalyst plan (no Python
row path); every entry has a value-checked DuckDB oracle. Scale notes
inline per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from postgres_opensearch_cdc_spark.registry import load_table

# Fixture constants shared by Spark plans and oracle SQL.
PHRASE = "fast sort"
REGEXP_PATTERN = r"(^|\s)vectors?(\s|$)"
FUZZY_TERM, FUZZY_MAX_DIST = "tble", 1
SEARCH_AFTER = (7, 0)  # (user_id, event_id) keyset cursor — mid-range at every SF
COMPOSITE_AFTER = ("error", "2024-01-10")  # (event_type, day) after-key
COMPOSITE_PAGE = 50
HISTOGRAM_INTERVAL = 50.0


def q02f_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_phrase``: adjacent analyzed tokens, ranked by phrase
    frequency. The corpus is whitespace-tokenized, so the positional
    constraint compiles to a word-boundary regex count — pure codegen in
    the scan stage, no explode/shuffle. At 100 TB this is a map-only
    scan + TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.regexp_count(F.col("text"), F.lit(r"\b" + PHRASE + r"\b"))
    return (
        docs.select("doc_id", n.alias("phrase_count"))
        .filter(F.col("phrase_count") > 0)
        .orderBy(F.col("phrase_count").desc(), F.col("doc_id"))
    )


def q01d_regexp_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp`` query on an analyzed text field: docs whose text
    matches a pattern (here: the token ``vector`` with optional plural).
    rlike stays inside codegen; at scale this is a map-only filter."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("text").rlike(REGEXP_PATTERN))
        .select("doc_id", "lang", "source")
    )


def q02g_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``fuzzy`` query: docs containing any token within edit distance
    FUZZY_MAX_DIST of the (misspelled) query term, ranked by how many
    distinct token types matched.

    Implementation: levenshtein inside a higher-order ``filter`` over
    the per-doc distinct token set — one pass, no join. OpenSearch
    expands the term against the index dictionary; at 100 TB the
    equivalent optimization is a two-phase plan (distinct-terms
    dictionary → expand → broadcast semi-join), worth it only when the
    per-doc token set is large; here the single-pass form wins."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    matches = F.filter(
        toks, lambda t: F.levenshtein(t, F.lit(FUZZY_TERM)) <= FUZZY_MAX_DIST
    )
    return (
        docs.select("doc_id", F.size(matches).alias("n_fuzzy_terms"))
        .filter(F.col("n_fuzzy_terms") > 0)
        .orderBy(F.col("n_fuzzy_terms").desc(), F.col("doc_id"))
    )


def q02h_multi_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``multi_match`` with per-field boosts: one query scored across a
    text field (term frequency of 'spark', boost 1.0) and a keyword
    field (exact match source='src1', boost 2.0), summed — OpenSearch's
    ``most_fields`` semantics. All codegen; map-only at scale."""
    docs = load_table(spark, sf_dir, "documents")
    text_score = F.regexp_count(F.col("text"), F.lit(r"\bspark\b")).cast("double")
    source_score = F.when(F.col("source") == "src1", 2.0).otherwise(0.0)
    score = F.round(text_score + source_score, 2)
    return (
        docs.select("doc_id", score.alias("mm_score"))
        .filter(F.col("mm_score") > 0)
        .orderBy(F.col("mm_score").desc(), F.col("doc_id"))
        .limit(50)
    )


def search_after_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``search_after`` keyset pagination: the page of events strictly
    after cursor (user_id, event_id) in sort order. Unlike from/size
    deep paging, the tuple predicate pushes into the scan and cost stays
    O(page) no matter how deep — the reason OpenSearch deprecated
    scroll in favor of search_after, and the same reason it's the right
    shape on 100 TB."""
    ev = load_table(spark, sf_dir, "events")
    after_u, after_e = SEARCH_AFTER
    after = (F.col("user_id") > after_u) | (
        (F.col("user_id") == after_u) & (F.col("event_id") > after_e)
    )
    return (
        ev.filter(after)
        .select("user_id", "event_id", "event_type")
        .orderBy("user_id", "event_id")
        .limit(100)
    )


def composite_agg_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``composite`` aggregation with ``after`` key: multi-source
    buckets (event_type, day) in key order, resuming after a cursor
    bucket, one page. The agg is partial+final (map-side combine); the
    after-key filter applies to bucket keys post-agg, so the page scan
    still aggregates everything once — same as OpenSearch, which makes
    composite pagination restartable, not cheaper."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    after_t, after_d = COMPOSITE_AFTER
    grouped = (
        ev.groupBy(F.col("event_type"), day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )
    after = (F.col("event_type") > after_t) | (
        (F.col("event_type") == after_t) & (F.col("day") > after_d)
    )
    return (
        grouped.filter(after)
        .orderBy("event_type", "day")
        .limit(COMPOSITE_PAGE)
    )


def top_hits_per_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``top_hits`` sub-aggregation: per event_type bucket, the 3
    highest-value documents themselves (not just metrics). row_number
    over a per-bucket window; with AQE this shuffles once on the bucket
    key. At scale, a pre-aggregated partial top-k per map partition
    bounds the shuffle (Spark does this for global top-k via
    TakeOrderedAndProject; per-group needs the window form)."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id")
    )
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("event_type", "rn", "event_id", F.round("value", 4).alias("value"))
        .orderBy("event_type", "rn")
    )


def significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``significant_terms``: tokens over-represented in a foreground
    set (lang='en') vs the whole corpus, scored by the document-frequency
    lift (fg_df/fg_n) / (bg_df/bg_n). One explode of the distinct token
    set, one partial+final agg keyed by term, totals ride along as a
    broadcast one-row cross join — single job, no driver actions. At
    100 TB the term-keyed agg is the only shuffle and the term
    dictionary is small by Zipf's law."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("is_fg"),
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))).alias(
            "term"
        ),
    ).filter(F.length("term") > 0)
    per_term = base.groupBy("term").agg(
        F.sum("is_fg").alias("fg_df"), F.count(F.lit(1)).alias("bg_df")
    )
    totals = docs.agg(
        F.sum((F.col("lang") == "en").cast("int")).alias("fg_n"),
        F.count(F.lit(1)).alias("bg_n"),
    )
    lift = (F.col("fg_df") / F.col("fg_n")) / (F.col("bg_df") / F.col("bg_n"))
    return (
        per_term.crossJoin(F.broadcast(totals))
        .filter(F.col("fg_df") >= 5)
        .select("term", "fg_df", "bg_df", F.round(lift, 6).alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("term"))
        .limit(20)
    )


def histogram_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric ``histogram`` aggregation: fixed-interval buckets over
    events.value with count + sum per bucket. Bucket key is computed in
    the scan projection, agg is partial+final — the canonical map-side
    combine shape."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.round(
        F.floor(F.col("value") / HISTOGRAM_INTERVAL) * HISTOGRAM_INTERVAL, 1
    )
    return (
        ev.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("doc_count"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .orderBy("bucket")
    )


def pipeline_agg_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pipeline aggregations over a date_histogram: per-day sum(value),
    then ``cumulative_sum``, ``derivative`` (diff vs previous bucket),
    and a 3-bucket trailing ``moving_avg`` — OpenSearch's pipeline-agg
    trio as window functions over the bucket series. The bucket series
    is tiny post-agg (one row per day), so the unpartitioned window is
    a single-task no-op at any input scale."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    daily = ev.groupBy(day.alias("day")).agg(
        F.round(F.sum("value"), 4).alias("sum_value")
    )
    w = Window.orderBy("day")
    w3 = w.rowsBetween(-2, 0)
    return daily.select(
        "day",
        "sum_value",
        F.round(F.sum("sum_value").over(w), 4).alias("cumulative_sum"),
        F.round(F.col("sum_value") - F.lag("sum_value", 1).over(w), 4).alias(
            "derivative"
        ),
        F.round(F.avg("sum_value").over(w3), 4).alias("moving_avg_3"),
    ).orderBy("day")


def dis_max_best_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dis_max`` with tie_breaker: relevance = best field score plus
    0.3 × the other fields' scores — OpenSearch's best_fields
    counterpart to q02h's most_fields sum. Same codegen map-only
    shape."""
    docs = load_table(spark, sf_dir, "documents")
    text_score = F.regexp_count(F.col("text"), F.lit(r"\bspark\b")).cast("double")
    source_score = F.when(F.col("source") == "src1", 2.0).otherwise(0.0)
    best = F.greatest(text_score, source_score)
    score = F.round(best + 0.3 * (text_score + source_score - best), 2)
    return (
        docs.select("doc_id", score.alias("dm_score"))
        .filter(F.col("dm_score") > 0)
        .orderBy(F.col("dm_score").desc(), F.col("doc_id"))
        .limit(50)
    )


def function_score_fvf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``function_score`` with a field_value_factor modifier: term
    relevance (tf of 'query') multiplied by ln(1 + n_chars) — the
    standard popularity/length boost. Scoring is pure codegen in the
    scan projection; top-k is TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    tf = F.regexp_count(F.col("text"), F.lit(r"\bquery\b")).cast("double")
    score = F.round(tf * F.log1p(F.col("n_chars")), 4)
    return (
        docs.select("doc_id", score.alias("fs_score"))
        .filter(F.col("fs_score") > 0)
        .orderBy(F.col("fs_score").desc(), F.col("doc_id"))
        .limit(50)
    )


def percentile_ranks_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``percentile_ranks`` aggregation: for each threshold, the exact
    fraction of events.value at or below it. One pass of conditional
    partial aggregates — no sort, no shuffle beyond the single-row
    final agg."""
    ev = load_table(spark, sf_dir, "events")
    thresholds = [50.0, 100.0, 250.0]
    aggs = [
        F.round(
            100.0 * F.sum((F.col("value") <= t).cast("long")) / F.count(F.lit(1)), 4
        ).alias(f"pct_le_{int(t)}")
        for t in thresholds
    ]
    return ev.agg(*aggs)


def collapse_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``collapse``: one representative document per source field value
    (the longest, doc_id as tiebreak) — OpenSearch field collapsing as
    a per-key top-1 window."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("source", "doc_id", "n_chars")
        .orderBy("source")
    )


def suggest_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Completion-suggester analogue: terms with prefix 's' ranked by
    document frequency. Distinct token set per doc, explode, term-keyed
    agg — the prefix filter runs before the explode output shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    term = F.explode(
        F.filter(
            F.array_distinct(F.split(F.lower(F.col("text")), r"\s+")),
            lambda t: t.startswith("s"),
        )
    ).alias("term")
    return (
        docs.select(term)
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.col("doc_freq").desc(), F.col("term"))
        .limit(10)
    )


def highlight_fragment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highlighting: the first ±3-token window around the match — the
    snippet OpenSearch's highlighter returns. Leftmost-greedy extraction
    agrees between Java regex and RE2, so fragments are value-checked."""
    docs = load_table(spark, sf_dir, "documents")
    pat = r"(\S+ ){0,3}vectors?( \S+){0,3}"
    frag = F.regexp_extract(F.col("text"), pat, 0)
    return (
        docs.select("doc_id", frag.alias("fragment"))
        .filter(F.col("fragment") != "")
        .orderBy("doc_id")
    )


def nested_query_same_element(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch ``nested`` query: orders as parent docs with their
    lineitems as nested children, matching orders where SOME SINGLE
    lineitem has quantity >= 45 AND discount >= 0.08 — the predicate a
    flat field-level AND gets wrong (it matches when different items
    satisfy different halves).

    Implementation builds the nested docs (collect_list of structs — the
    document shape the reference's sink would index) then applies
    ``exists`` over the array. The groupBy shuffles once on the join
    key; at 100 TB the nested build is the same co-partitioned shape as
    the mirror compaction. The DuckDB oracle is the equivalent
    correlated EXISTS on the flat child table — semantic equivalence of
    the two formulations is the point of the check."""
    li = load_table(spark, sf_dir, "lineitem")
    nested = (
        li.groupBy(F.col("l_orderkey").alias("orderkey"))
        .agg(
            F.collect_list(
                F.struct(
                    F.col("l_quantity").alias("qty"),
                    F.col("l_discount").alias("disc"),
                )
            ).alias("items")
        )
    )
    hit = F.exists(
        F.col("items"), lambda it: (it["qty"] >= 45) & (it["disc"] >= 0.08)
    )
    return (
        nested.filter(hit)
        .select("orderkey", F.size("items").alias("n_items"))
        .orderBy("orderkey")
    )


def nested_agg_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OpenSearch ``nested`` + ``reverse_nested`` aggregations: orders
    as parent docs with lineitems nested; per order-priority bucket the
    nested scope counts and averages the RETURNED ('R') items, and the
    reverse_nested hop counts how many PARENT orders contain at least
    one such item. Built over the nested document shape
    (collect_list of structs — the same co-partitioned groupBy as the
    mirror compaction), then aggregated by filtering the nested array
    per parent, exactly how the DSL evaluates an agg inside ``nested``
    and hops back out. The DuckDB oracle is the equivalent flat join +
    conditional aggregation — semantic equivalence of the two
    formulations is the point of the check."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nested = li.groupBy(F.col("l_orderkey").alias("orderkey")).agg(
        F.collect_list(
            F.struct(
                F.col("l_quantity").alias("qty"),
                F.col("l_returnflag").alias("rf"),
            )
        ).alias("items")
    )
    matching = F.filter(F.col("items"), lambda it: it["rf"] == "R")
    per_parent = (
        orders.join(nested, orders["o_orderkey"] == nested["orderkey"])
        .select(
            "o_orderpriority",
            F.size(matching).cast("long").alias("n_matching"),
            F.aggregate(
                matching, F.lit(0.0), lambda acc, it: acc + it["qty"]
            ).alias("qty_sum"),
        )
    )
    return (
        per_parent.groupBy("o_orderpriority")
        .agg(
            F.sum("n_matching").alias("item_count"),
            F.round(F.sum("qty_sum") / F.sum("n_matching"), 4).alias("avg_qty"),
            F.sum((F.col("n_matching") > 0).cast("long")).alias("parent_count"),
        )
        .orderBy("o_orderpriority")
    )


def bucket_script_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bucket_script`` pipeline agg: per-day error rate computed from
    two sibling metrics of the same date_histogram (errors / total).
    Both metrics come out of ONE conditional partial agg — no second
    scan, no join."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    return (
        ev.groupBy(day.alias("day"))
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("errors"),
        )
        .select(
            "day",
            "total",
            "errors",
            F.round(F.col("errors") / F.col("total"), 6).alias("error_rate"),
        )
        .orderBy("day")
    )


def avg_bucket_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``avg_bucket`` / ``max_bucket`` / ``min_bucket`` sibling pipeline
    aggs: summary statistics over the daily-sum bucket series — a
    two-level aggregation, both levels partial+final."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd")
    daily = ev.groupBy(day.alias("day")).agg(
        F.round(F.sum("value"), 4).alias("sum_value")
    )
    return daily.agg(
        F.round(F.avg("sum_value"), 4).alias("avg_bucket"),
        F.round(F.max("sum_value"), 4).alias("max_bucket"),
        F.round(F.min("sum_value"), 4).alias("min_bucket"),
        F.count(F.lit(1)).alias("n_buckets"),
    )


def rescore_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``rescore``: cheap retrieval (term-overlap score) selects a
    window of 200 candidates; an expensive signal (phrase frequency,
    weight 2) re-ranks ONLY the window; final top-50. The scale point of
    rescoring: the expensive scorer touches 200 rows regardless of
    corpus size — at 100 TB the window is still 200 rows on one task
    after TakeOrderedAndProject."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))
    terms = F.array(F.lit("spark"), F.lit("query"), F.lit("join"))
    s1 = F.size(F.array_intersect(toks, terms))
    s2 = F.regexp_count(F.col("text"), F.lit(r"\bfast sort\b"))
    window = (
        docs.select("doc_id", s1.alias("s1"), s2.alias("s2"))
        .filter(F.col("s1") > 0)
        .orderBy(F.col("s1").desc(), F.col("doc_id"))
        .limit(200)
    )
    return (
        window.select(
            "doc_id", "s1", (F.col("s1") + 2 * F.col("s2")).alias("rescored")
        )
        .orderBy(F.col("rescored").desc(), F.col("doc_id"))
        .limit(50)
    )


def more_like_this(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``more_like_this``: documents similar to doc 0, scored by the
    summed IDF of shared distinct terms (rare shared vocabulary counts,
    stopword-ish terms contribute little). One explode + two broadcast
    joins + one doc-keyed agg — the like-document's term set and the df
    table are both tiny and broadcast; the corpus term stream shuffles
    once on doc_id for the final sum."""
    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id",
        F.explode(F.array_distinct(F.split(F.lower(F.col("text")), r"\s+"))).alias(
            "term"
        ),
    ).filter(F.length("term") > 0)
    dfc = base.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    totals = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    like_terms = base.filter(F.col("doc_id") == 0).select("term")
    return (
        base.filter(F.col("doc_id") != 0)
        .join(F.broadcast(like_terms), "term")
        .join(F.broadcast(dfc), "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(F.log(F.col("n_docs") / F.col("df"))), 6).alias(
                "mlt_score"
            ),
            F.count(F.lit(1)).alias("n_shared"),
        )
        .orderBy(F.col("mlt_score").desc(), F.col("doc_id"))
        .limit(20)
    )


def filters_named_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``filters`` aggregation: named filter buckets (errors, purchases,
    high_value) each with count + sum — one conditional partial agg over
    a single scan, unpivoted to OpenSearch's bucket-per-filter shape."""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.agg(
        F.sum((F.col("event_type") == "error").cast("long")).alias("err_cnt"),
        F.round(F.sum(F.when(F.col("event_type") == "error", F.col("value")).otherwise(0.0)), 4).alias("err_sum"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("p_cnt"),
        F.round(F.sum(F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(0.0)), 4).alias("p_sum"),
        F.sum((F.col("value") > 400.0).cast("long")).alias("hv_cnt"),
        F.round(F.sum(F.when(F.col("value") > 400.0, F.col("value")).otherwise(0.0)), 4).alias("hv_sum"),
    )
    return agg.select(
        F.expr(
            "stack(3, 'errors', err_cnt, err_sum,"
            " 'purchases', p_cnt, p_sum,"
            " 'high_value', hv_cnt, hv_sum) AS (bucket, doc_count, sum_value)"
        )
    ).orderBy("bucket")


def percolate_stored_queries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolator (reverse search): stored queries are rows, documents
    are probes — every document is evaluated against every stored
    query's predicate and matches are counted per query. Rules here are
    derived from the region table (one subscription per region: a
    source term OR an n_chars band).

    Scale shape: the rule set is broadcast (stored-query sets are small
    relative to document flow), so this is a map-only
    BroadcastNestedLoopJoin over the document scan — each doc evaluates
    all rules in one pass with zero shuffle of documents; only the tiny
    (rule_id, partial count) aggregates move."""
    region = load_table(spark, sf_dir, "region")
    docs = load_table(spark, sf_dir, "documents")
    rules = region.select(
        F.col("r_regionkey").alias("rule_id"),
        F.concat(F.lit("src"), F.col("r_regionkey")).alias("source_term"),
        (F.col("r_regionkey") * 50).alias("min_chars"),
        (F.col("r_regionkey") * 50 + 49).alias("max_chars"),
    )
    matched = docs.join(
        F.broadcast(rules),
        (F.col("source") == F.col("source_term"))
        | (
            (F.col("n_chars") >= F.col("min_chars"))
            & (F.col("n_chars") <= F.col("max_chars"))
        ),
    )
    return (
        matched.groupBy("rule_id")
        .agg(F.count(F.lit(1)).alias("n_matches"))
        .orderBy("rule_id")
    )


TERMS_SET = ["sort", "merge", "vector", "join"]
TERMS_SET_MIN = 3
BOOST_POS, BOOST_NEG, NEG_FACTOR = "query", "slow", 0.5


def wildcard_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``wildcard`` on a keyword field: ``source: src1*`` — compiles to
    a LIKE prefix pattern, which Catalyst rewrites to StartsWith and
    pushes into the parquet scan (PushedFilters: StringStartsWith). At
    100 TB this prunes at the row-group level before any decode."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(F.col("source").like("src1%"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("doc_count"))
        .orderBy("source")
    )


def terms_set_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``terms_set``: docs where at least ``minimum_should_match`` of
    the provided terms occur. Each term is a word-boundary rlike cast to
    int and summed — one codegen'd projection per doc, map-only scan,
    no explode of the token stream."""
    docs = load_table(spark, sf_dir, "documents")
    n_matched = sum(
        F.col("text").rlike(rf"\b{t}\b").cast("int") for t in TERMS_SET
    )
    return (
        docs.select("doc_id", n_matched.alias("n_matched"))
        .filter(F.col("n_matched") >= TERMS_SET_MIN)
        .orderBy("doc_id")
    )


def boosting_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``boosting``: positive-query relevance demoted (not excluded)
    when the negative query also matches — score = tf(positive) *
    negative_boost if the negative term occurs, else tf(positive).
    Map-only scoring + TakeOrderedAndProject top-50."""
    docs = load_table(spark, sf_dir, "documents")
    tf_pos = F.regexp_count(F.col("text"), F.lit(rf"\b{BOOST_POS}\b"))
    has_neg = F.col("text").rlike(rf"\b{BOOST_NEG}\b")
    score = F.round(
        tf_pos * F.when(has_neg, F.lit(NEG_FACTOR)).otherwise(F.lit(1.0)), 2
    )
    return (
        docs.select("doc_id", score.alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(50)
    )


def match_bool_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``match_bool_prefix``: all terms must match, the last one as a
    prefix — ``merge`` as a full token AND any token starting ``vec``.
    Two codegen'd regex predicates on the scan; conjunctive filters
    fused into one map stage."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.col("text").rlike(r"\bmerge\b")
            & F.col("text").rlike(r"(^|\s)vec")
        )
        .select("doc_id", "source", "lang")
        .orderBy("doc_id")
    )


SPAN_TERM_A, SPAN_TERM_B, SPAN_SLOP = "fast", "sort", 3


def span_near_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``span_near``: two terms within ``slop`` token positions (any
    order). Occurrence positions come from a filter over the token
    index array and the pairwise distance matrix from nested
    transforms — all array higher-order functions inside the scan
    projection, so the positional index an inverted-index engine keeps
    is recomputed per document with zero shuffle and no token
    explosion. Emits the minimum span distance per matching doc."""
    from postgres_opensearch_cdc_spark.functions.dedup import _ensure_parallelism

    docs = _ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")
    # positions via transform's (element, index) lambda: the token array
    # (a HOF child) evaluates ONCE per row before iteration. Never index
    # the array from inside a lambda (element_at(toks, i)) — projection
    # collapse inlines the split() there and interpreted HOF evaluation
    # re-tokenizes the document per token position, O(n^2) per doc
    # (measured 28 s vs 1.5 s at sf0.1 for this exact query).
    def positions(term: str):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i)),
            lambda x: x.isNotNull(),
        )

    pos_a, pos_b = positions(SPAN_TERM_A), positions(SPAN_TERM_B)
    dists = F.flatten(
        F.transform(pos_a, lambda a: F.transform(pos_b, lambda b: F.abs(a - b)))
    )
    min_dist = F.array_min(dists)
    return (
        docs.select("doc_id", min_dist.alias("min_span"))
        .filter(F.col("min_span") <= SPAN_SLOP)
        .orderBy("doc_id")
    )


INTERVAL_T1, INTERVAL_T2, INTERVAL_MAX_GAPS = "hash", "join", 2
DF_ANCHOR, DF_PIVOT_DAYS, DF_BOOST = "2024-02-01", 7, 5.0


def intervals_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``intervals`` query (``all_of`` with ``ordered: true`` and
    ``max_gaps``): '{T1}' followed by '{T2}' with at most MAX_GAPS
    tokens between them — the ORDERED counterpart of span_near's
    unordered min-distance. Positions come from transform's
    (element, index) lambda (never element_at from inside a lambda —
    see span_near_query's O(n²) note); per-doc interval count and the
    tightest gap ride out of the same small gap array. All HOFs inside
    the scan projection: zero shuffle, no token explosion."""
    from postgres_opensearch_cdc_spark.functions.dedup import _ensure_parallelism

    docs = _ensure_parallelism(load_table(spark, sf_dir, "documents"))
    toks = F.split(F.lower(F.col("text")), r"\s+")

    def positions(term: str):
        return F.filter(
            F.transform(toks, lambda t, i: F.when(t == term, i)),
            lambda x: x.isNotNull(),
        )

    pos_a, pos_b = positions(INTERVAL_T1), positions(INTERVAL_T2)
    gaps = F.filter(
        F.flatten(
            F.transform(pos_a, lambda a: F.transform(pos_b, lambda b: b - a - 1))
        ),
        lambda g: (g >= 0) & (g <= INTERVAL_MAX_GAPS),
    )
    return (
        docs.select(
            "doc_id",
            F.size(gaps).cast("long").alias("n_intervals"),
            F.array_min(gaps).cast("long").alias("min_gap"),
        )
        .filter(F.col("n_intervals") > 0)
        .orderBy("doc_id")
    )


def distance_feature_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``distance_feature`` query: organic score (value) plus the
    recency boost ``boost * pivot / (pivot + |distance|)`` against an
    anchor date — the decaying-proximity ranking ES applies to date and
    geo fields. Day distance is exact integer math; the top-k order-by
    compiles to TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    dist = F.abs(F.datediff(F.to_date("ts"), F.lit(DF_ANCHOR).cast("date")))
    score = F.round(
        F.col("value") + DF_BOOST * DF_PIVOT_DAYS / (DF_PIVOT_DAYS + dist), 4
    )
    return (
        ev.select("event_id", "event_type", score.alias("score"))
        .orderBy(F.col("score").desc(), "event_id")
        .limit(15)
    )


RANDOM_SCORE_SEED = 42


def random_score_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``function_score`` with ``random_score`` (seed + field): the
    reproducible pseudo-random ranking ES derives from a seeded hash of
    the field — here a portable md5 of seed:event_id mapped to [0, 1),
    so every engine, run, and parallelism ranks identically. Top-k by
    the random score compiles to TakeOrderedAndProject."""
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{RANDOM_SCORE_SEED}:"), F.col("event_id"))),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    rscore = F.round(h / F.lit(float(2**32)), 6)
    return (
        ev.select("event_id", "event_type", rscore.alias("rscore"))
        .orderBy(F.col("rscore").desc(), "event_id")
        .limit(15)
    )


QUERIES = {
    "q02f_match_phrase": q02f_match_phrase,
    "intervals_query": intervals_query,
    "distance_feature_query": distance_feature_query,
    "random_score_query": random_score_query,
    "nested_agg_items": nested_agg_items,
    "q01d_regexp_match": q01d_regexp_match,
    "q02g_fuzzy_match": q02g_fuzzy_match,
    "q02h_multi_match": q02h_multi_match,
    "search_after_page": search_after_page,
    "composite_agg_page": composite_agg_page,
    "top_hits_per_bucket": top_hits_per_bucket,
    "significant_terms": significant_terms,
    "histogram_value": histogram_value,
    "pipeline_agg_cumsum": pipeline_agg_cumsum,
    "dis_max_best_fields": dis_max_best_fields,
    "function_score_fvf": function_score_fvf,
    "percentile_ranks_value": percentile_ranks_value,
    "collapse_by_source": collapse_by_source,
    "suggest_prefix": suggest_prefix,
    "highlight_fragment": highlight_fragment,
    "nested_query_same_element": nested_query_same_element,
    "bucket_script_error_rate": bucket_script_error_rate,
    "avg_bucket_daily": avg_bucket_daily,
    "rescore_two_phase": rescore_two_phase,
    "more_like_this": more_like_this,
    "filters_named_buckets": filters_named_buckets,
    "percolate_stored_queries": percolate_stored_queries,
    "wildcard_query": wildcard_query,
    "terms_set_match": terms_set_match,
    "boosting_query": boosting_query,
    "match_bool_prefix": match_bool_prefix,
    "span_near_query": span_near_query,
}

_TERMS_SET_SQL = " + ".join(
    "regexp_matches(text, '\\b%s\\b')::INT" % t for t in TERMS_SET
)

ORACLE = {
    "nested_agg_items": """
        SELECT o_orderpriority,
               CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                    AS BIGINT) AS item_count,
               ROUND(SUM(CASE WHEN l_returnflag = 'R' THEN l_quantity
                              ELSE 0 END)
                     / SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END),
                     4) AS avg_qty,
               COUNT(DISTINCT CASE WHEN l_returnflag = 'R'
                                   THEN o_orderkey END) AS parent_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY 1 ORDER BY 1
    """,
    "intervals_query": rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ),
        pos AS (
            SELECT doc_id,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{INTERVAL_T1}') AS pa,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{INTERVAL_T2}') AS pb
            FROM t
        ),
        g AS (
            SELECT doc_id,
                   list_filter(flatten(list_transform(pa,
                       a -> list_transform(pb, b -> b - a - 1))),
                       x -> x >= 0 AND x <= {INTERVAL_MAX_GAPS}) AS gaps
            FROM pos
        )
        SELECT doc_id, CAST(len(gaps) AS BIGINT) AS n_intervals,
               CAST(list_min(gaps) AS BIGINT) AS min_gap
        FROM g WHERE len(gaps) > 0 ORDER BY doc_id
    """,
    "distance_feature_query": f"""
        SELECT event_id, event_type,
               ROUND(value + {DF_BOOST} * {DF_PIVOT_DAYS} / ({DF_PIVOT_DAYS}
                     + abs(date_diff('day', DATE '{DF_ANCHOR}', ts::DATE))),
                     4) AS score
        FROM events
        ORDER BY score DESC, event_id LIMIT 15
    """,
    "random_score_query": f"""
        SELECT event_id, event_type,
               ROUND((('0x' || substr(md5('{RANDOM_SCORE_SEED}:'
                       || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
                      / 4294967296.0), 6) AS rscore
        FROM events
        ORDER BY rscore DESC, event_id LIMIT 15
    """,
    "wildcard_query": """
        SELECT source, count(*) AS doc_count
        FROM documents WHERE source LIKE 'src1%'
        GROUP BY source ORDER BY source
    """,
    "terms_set_match": rf"""
        SELECT doc_id, ({_TERMS_SET_SQL}) AS n_matched
        FROM documents
        WHERE ({_TERMS_SET_SQL}) >= {TERMS_SET_MIN}
        ORDER BY doc_id
    """,
    "boosting_query": rf"""
        SELECT doc_id,
               ROUND(len(regexp_extract_all(text, '\b{BOOST_POS}\b'))
                     * CASE WHEN regexp_matches(text, '\b{BOOST_NEG}\b')
                            THEN {NEG_FACTOR} ELSE 1.0 END, 2)::DOUBLE AS score
        FROM documents
        WHERE len(regexp_extract_all(text, '\b{BOOST_POS}\b'))
              * CASE WHEN regexp_matches(text, '\b{BOOST_NEG}\b')
                     THEN {NEG_FACTOR} ELSE 1.0 END > 0
        ORDER BY score DESC, doc_id LIMIT 50
    """,
    "match_bool_prefix": r"""
        SELECT doc_id, source, lang
        FROM documents
        WHERE regexp_matches(text, '\bmerge\b')
          AND regexp_matches(text, '(^|\s)vec')
        ORDER BY doc_id
    """,
    "span_near_query": rf"""
        WITH t AS (
            SELECT doc_id,
                   regexp_split_to_array(lower(text), '\s+') AS toks
            FROM documents
        ),
        pos AS (
            SELECT doc_id,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_TERM_A}') AS pa,
                   list_filter(range(1, len(toks) + 1),
                               i -> toks[i] = '{SPAN_TERM_B}') AS pb
            FROM t
        )
        SELECT doc_id,
               list_min(flatten(list_transform(pa,
                   a -> list_transform(pb, b -> abs(a - b))))) AS min_span
        FROM pos
        WHERE list_min(flatten(list_transform(pa,
                  a -> list_transform(pb, b -> abs(a - b))))) <= {SPAN_SLOP}
        ORDER BY doc_id
    """,
    "q02f_match_phrase": rf"""
        SELECT doc_id,
               len(regexp_extract_all(text, '\b{PHRASE}\b')) AS phrase_count
        FROM documents
        WHERE len(regexp_extract_all(text, '\b{PHRASE}\b')) > 0
        ORDER BY phrase_count DESC, doc_id
    """,
    "q01d_regexp_match": rf"""
        SELECT doc_id, lang, source FROM documents
        WHERE regexp_matches(text, '{REGEXP_PATTERN}')
    """,
    "q02g_fuzzy_match": rf"""
        SELECT doc_id, n_fuzzy_terms FROM (
            SELECT doc_id,
                   len(list_filter(
                       list_distinct(regexp_split_to_array(lower(text), '\s+')),
                       t -> levenshtein(t, '{FUZZY_TERM}') <= {FUZZY_MAX_DIST}
                   )) AS n_fuzzy_terms
            FROM documents
        )
        WHERE n_fuzzy_terms > 0
        ORDER BY n_fuzzy_terms DESC, doc_id
    """,
    "q02h_multi_match": r"""
        SELECT doc_id, mm_score FROM (
            SELECT doc_id,
                   ROUND(len(regexp_extract_all(text, '\bspark\b'))::DOUBLE
                         + CASE WHEN source = 'src1' THEN 2.0 ELSE 0.0 END,
                         2) AS mm_score
            FROM documents
        )
        WHERE mm_score > 0
        ORDER BY mm_score DESC, doc_id
        LIMIT 50
    """,
    "search_after_page": f"""
        SELECT user_id, event_id, event_type FROM events
        WHERE user_id > {SEARCH_AFTER[0]}
           OR (user_id = {SEARCH_AFTER[0]} AND event_id > {SEARCH_AFTER[1]})
        ORDER BY user_id, event_id
        LIMIT 100
    """,
    "composite_agg_page": f"""
        SELECT event_type, day, doc_count, sum_value FROM (
            SELECT event_type,
                   strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) AS doc_count,
                   ROUND(sum(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        )
        WHERE event_type > '{COMPOSITE_AFTER[0]}'
           OR (event_type = '{COMPOSITE_AFTER[0]}' AND day > '{COMPOSITE_AFTER[1]}')
        ORDER BY event_type, day
        LIMIT {COMPOSITE_PAGE}
    """,
    "top_hits_per_bucket": """
        SELECT event_type, rn, event_id, value FROM (
            SELECT event_type,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value DESC, event_id
                   ) AS rn,
                   event_id,
                   ROUND(value, 4) AS value
            FROM events
        )
        WHERE rn <= 3
        ORDER BY event_type, rn
    """,
    "significant_terms": r"""
        WITH base AS (
            SELECT doc_id,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_fg,
                   unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS term
            FROM documents
        ),
        per_term AS (
            SELECT term, sum(is_fg)::BIGINT AS fg_df, count(*) AS bg_df
            FROM base WHERE strlen(term) > 0 GROUP BY term
        ),
        totals AS (
            SELECT sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS fg_n,
                   count(*) AS bg_n
            FROM documents
        )
        SELECT term, fg_df, bg_df,
               ROUND((fg_df::DOUBLE / fg_n) / (bg_df::DOUBLE / bg_n), 6) AS lift
        FROM per_term CROSS JOIN totals
        WHERE fg_df >= 5
        ORDER BY lift DESC, term
        LIMIT 20
    """,
    "histogram_value": f"""
        SELECT ROUND(floor(value / {HISTOGRAM_INTERVAL}) * {HISTOGRAM_INTERVAL}, 1)
                   AS bucket,
               count(*) AS doc_count,
               ROUND(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1
        ORDER BY bucket
    """,
    "dis_max_best_fields": r"""
        SELECT doc_id, dm_score FROM (
            SELECT doc_id,
                   ROUND(
                     greatest(ts, ss) + 0.3 * (ts + ss - greatest(ts, ss)), 2
                   ) AS dm_score
            FROM (
                SELECT doc_id,
                       len(regexp_extract_all(text, '\bspark\b'))::DOUBLE AS ts,
                       CASE WHEN source = 'src1' THEN 2.0 ELSE 0.0 END AS ss
                FROM documents
            )
        )
        WHERE dm_score > 0
        ORDER BY dm_score DESC, doc_id
        LIMIT 50
    """,
    "function_score_fvf": r"""
        SELECT doc_id, fs_score FROM (
            SELECT doc_id,
                   ROUND(len(regexp_extract_all(text, '\bquery\b'))::DOUBLE
                         * ln(1 + n_chars), 4) AS fs_score
            FROM documents
        )
        WHERE fs_score > 0
        ORDER BY fs_score DESC, doc_id
        LIMIT 50
    """,
    "percentile_ranks_value": """
        SELECT
            ROUND(100.0 * sum(CASE WHEN value <= 50.0 THEN 1 ELSE 0 END) / count(*), 4) AS pct_le_50,
            ROUND(100.0 * sum(CASE WHEN value <= 100.0 THEN 1 ELSE 0 END) / count(*), 4) AS pct_le_100,
            ROUND(100.0 * sum(CASE WHEN value <= 250.0 THEN 1 ELSE 0 END) / count(*), 4) AS pct_le_250
        FROM events
    """,
    "collapse_by_source": """
        SELECT source, doc_id, n_chars FROM (
            SELECT source, doc_id, n_chars,
                   row_number() OVER (
                       PARTITION BY source ORDER BY n_chars DESC, doc_id
                   ) AS rn
            FROM documents
        )
        WHERE rn = 1
        ORDER BY source
    """,
    "suggest_prefix": r"""
        SELECT term, count(*) AS doc_freq FROM (
            SELECT unnest(list_filter(
                       list_distinct(regexp_split_to_array(lower(text), '\s+')),
                       t -> t LIKE 's%'
                   )) AS term
            FROM documents
        )
        GROUP BY term
        ORDER BY doc_freq DESC, term
        LIMIT 10
    """,
    "highlight_fragment": r"""
        SELECT doc_id,
               regexp_extract(text, '(\S+ ){0,3}vectors?( \S+){0,3}') AS fragment
        FROM documents
        WHERE regexp_extract(text, '(\S+ ){0,3}vectors?( \S+){0,3}') <> ''
        ORDER BY doc_id
    """,
    "percolate_stored_queries": """
        WITH rules AS (
            SELECT r_regionkey AS rule_id,
                   'src' || r_regionkey AS source_term,
                   r_regionkey * 50 AS min_chars,
                   r_regionkey * 50 + 49 AS max_chars
            FROM region
        )
        SELECT rule_id, count(*) AS n_matches
        FROM documents d
        JOIN rules r
          ON d.source = r.source_term
          OR (d.n_chars >= r.min_chars AND d.n_chars <= r.max_chars)
        GROUP BY rule_id
        ORDER BY rule_id
    """,
    "rescore_two_phase": rf"""
        WITH scored AS (
            SELECT doc_id,
                   len(list_intersect(
                       list_distinct(regexp_split_to_array(lower(text), '\s+')),
                       ['spark', 'query', 'join'])) AS s1,
                   len(regexp_extract_all(text, '\bfast sort\b')) AS s2
            FROM documents
        ),
        window_set AS (
            SELECT * FROM scored
            WHERE s1 > 0
            ORDER BY s1 DESC, doc_id
            LIMIT 200
        )
        SELECT doc_id, s1, s1 + 2 * s2 AS rescored
        FROM window_set
        ORDER BY rescored DESC, doc_id
        LIMIT 50
    """,
    "more_like_this": r"""
        WITH base AS (
            SELECT doc_id,
                   unnest(list_distinct(regexp_split_to_array(lower(text), '\s+'))) AS term
            FROM documents
        ),
        filtered AS (SELECT * FROM base WHERE strlen(term) > 0),
        dfc AS (SELECT term, count(*)::DOUBLE AS df FROM filtered GROUP BY term),
        totals AS (SELECT count(*)::DOUBLE AS n_docs FROM documents),
        like_terms AS (SELECT term FROM filtered WHERE doc_id = 0)
        SELECT f.doc_id,
               ROUND(sum(ln(n_docs / df)), 6) AS mlt_score,
               count(*) AS n_shared
        FROM filtered f
        JOIN like_terms USING (term)
        JOIN dfc USING (term)
        CROSS JOIN totals
        WHERE f.doc_id <> 0
        GROUP BY f.doc_id
        ORDER BY mlt_score DESC, f.doc_id
        LIMIT 20
    """,
    "filters_named_buckets": """
        SELECT bucket, doc_count, sum_value FROM (
            SELECT 'errors' AS bucket, count(*) FILTER (event_type = 'error') AS doc_count,
                   ROUND(coalesce(sum(value) FILTER (event_type = 'error'), 0), 4) AS sum_value
            FROM events
            UNION ALL
            SELECT 'purchases', count(*) FILTER (event_type = 'purchase'),
                   ROUND(coalesce(sum(value) FILTER (event_type = 'purchase'), 0), 4)
            FROM events
            UNION ALL
            SELECT 'high_value', count(*) FILTER (value > 400.0),
                   ROUND(coalesce(sum(value) FILTER (value > 400.0), 0), 4)
            FROM events
        )
        ORDER BY bucket
    """,
    "nested_query_same_element": """
        SELECT l_orderkey AS orderkey, count(*) AS n_items
        FROM lineitem
        GROUP BY l_orderkey
        HAVING bool_or(l_quantity >= 45 AND l_discount >= 0.08)
        ORDER BY orderkey
    """,
    "bucket_script_error_rate": """
        SELECT day, total, errors,
               ROUND(errors::DOUBLE / total, 6) AS error_rate
        FROM (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) AS total,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT
                       AS errors
            FROM events GROUP BY 1
        )
        ORDER BY day
    """,
    "avg_bucket_daily": """
        WITH daily AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   ROUND(sum(value), 4) AS sum_value
            FROM events GROUP BY 1
        )
        SELECT ROUND(avg(sum_value), 4) AS avg_bucket,
               ROUND(max(sum_value), 4) AS max_bucket,
               ROUND(min(sum_value), 4) AS min_bucket,
               count(*) AS n_buckets
        FROM daily
    """,
    "pipeline_agg_cumsum": """
        WITH daily AS (
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   ROUND(sum(value), 4) AS sum_value
            FROM events GROUP BY 1
        )
        SELECT day,
               sum_value,
               ROUND(sum(sum_value) OVER (ORDER BY day), 4) AS cumulative_sum,
               ROUND(sum_value - lag(sum_value, 1) OVER (ORDER BY day), 4)
                   AS derivative,
               ROUND(avg(sum_value) OVER (
                   ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
               ), 4) AS moving_avg_3
        FROM daily
        ORDER BY day
    """,
}
