"""Parameterized full-text search: analyzer + query-string BM25.

Reference semantics (SURVEY §2.4): OpenSearch analyzes text with a
lowercase + stopword + stemming chain (reference analyzer TDD :527-533)
and scores query_string/bool queries with Okapi BM25 over the analyzed
terms (query DSL TDD :1636-1641). This module is the generalized form of
the fixed-term q02b/q02c queries: any query string, should (OR) or must
(AND) boolean semantics.

Engine-portability: the analyzer is a deterministic CASE-chain over
regexes that DuckDB reproduces exactly (oracle_sql() generates the SQL
from the same constants), so every query built here is value-checked,
not rows-only.

Scale shape: postings are built ONLY for the analyzed query terms (the
token filter runs inside the scan projection before the explode), corpus
stats (N, avgdl) ride along as a broadcast one-row cross join — the
whole query is ONE Spark job, no driver-side count()/head() actions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Analyzer constants — shared verbatim by the Spark plan, the Python
# query-string analyzer, and the generated DuckDB oracle SQL.
STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is",
    "are", "was", "for", "on", "with",
]

# (suffix regex, replacement, min token length) — first match wins.
_STEM_RULES = [
    ("ies$", "y", 5),
    ("sses$", "ss", 0),
    ("ss$", None, 0),  # None → keep token unchanged
    ("s$", "", 4),
    ("ing$", "", 6),
    ("ed$", "", 5),
]

K1, B = 1.2, 0.75


def _stem_col(t: Column) -> Column:
    out = None
    for pat, repl, minlen in _STEM_RULES:
        cond = t.rlike(pat)
        if minlen:
            cond = cond & (F.length(t) >= minlen)
        stemmed = t if repl is None else F.regexp_replace(t, pat, repl)
        out = F.when(cond, stemmed) if out is None else out.when(cond, stemmed)
    return out.otherwise(t)


def analyze_tokens(col: Column) -> Column:
    """text → array of analyzed terms (duplicates kept for TF):
    lowercase, whitespace-split, stopword/empty removal, stemming. All
    inside codegen — runs in the scan stage."""
    toks = F.split(F.lower(col), r"\s+")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    kept = F.filter(toks, lambda t: (F.length(t) > 0) & ~F.array_contains(stops, t))
    return F.transform(kept, _stem_col)


def analyze_query(query: str) -> list[str]:
    """Python replica of analyze_tokens for the (constant) query string —
    returns distinct analyzed terms in first-seen order."""
    import re

    out: list[str] = []
    for tok in re.split(r"\s+", query.lower()):
        if not tok or tok in STOPWORDS:
            continue
        for pat, repl, minlen in _STEM_RULES:
            if re.search(pat, tok) and (not minlen or len(tok) >= minlen):
                if repl is not None:
                    tok = re.sub(pat, repl, tok)
                break
        if tok not in out:
            out.append(tok)
    return out


def query_string_bm25(
    docs: DataFrame,
    query: str,
    mode: str = "should",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    top_k: int = 50,
) -> DataFrame:
    """OpenSearch query_string → BM25 top-k as one declarative plan.

    mode='should': any analyzed term may match (OR); scores sum.
    mode='must': the document must contain EVERY analyzed term (AND) —
    the ≥2-clause boolean form of the reference's bool query.

    Returns (id_col, bm25) ordered by score desc, id asc (deterministic).
    """
    terms = analyze_query(query)
    if not terms:
        raise ValueError(f"query {query!r} analyzes to zero terms")
    if mode not in ("should", "must"):
        raise ValueError(f"unknown mode {mode!r}: use 'should' or 'must'")
    term_arr = F.array(*[F.lit(t) for t in terms])
    base = docs.select(
        F.col(id_col), analyze_tokens(F.col(text_col)).alias("_toks")
    )
    lengths = base.select(id_col, F.size("_toks").alias("dl"))
    stats = lengths.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(
            id_col,
            F.explode(
                F.filter(F.col("_toks"), lambda t: F.array_contains(term_arr, t))
            ).alias("term"),
        )
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_counts = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(1.0 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    w = (
        idf
        * (F.col("tf") * F.lit(k1 + 1))
        / (F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    scored = (
        tf.join(F.broadcast(df_counts), "term")
        .join(lengths, id_col)
        .crossJoin(F.broadcast(stats))
        .withColumn("_w", w)
        .groupBy(id_col)
        .agg(
            F.round(F.sum("_w"), 6).alias("bm25"),
            F.count_distinct(F.col("term")).alias("_nt"),
        )
    )
    if mode == "must":
        scored = scored.filter(F.col("_nt") == len(terms))
    return (
        scored.drop("_nt")
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# DuckDB oracle generation — same constants, same operation order
# ---------------------------------------------------------------------------

def _stem_sql(var: str = "t") -> str:
    whens = []
    for pat, repl, minlen in _STEM_RULES:
        cond = f"regexp_matches({var}, '{pat}')"
        if minlen:
            cond += f" AND strlen({var}) >= {minlen}"
        then = var if repl is None else f"regexp_replace({var}, '{pat}', '{repl}')"
        whens.append(f"WHEN {cond} THEN {then}")
    joined = " ".join(whens)
    return f"CASE {joined} ELSE {var} END"


def analyze_sql(text_expr: str = "text") -> str:
    stops = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"
    return (
        f"list_transform(list_filter(regexp_split_to_array(lower({text_expr}), '\\s+'), "
        f"t -> strlen(t) > 0 AND NOT list_contains({stops}, t)), t -> {_stem_sql('t')})"
    )


def query_string_bm25_sql(
    query: str,
    mode: str = "should",
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = K1,
    b: float = B,
    top_k: int = 50,
) -> str:
    """The DuckDB twin of query_string_bm25 — constants (k1+1, 1-b) are
    pre-folded in Python so both engines use bit-identical doubles."""
    terms = analyze_query(query)
    terms_list = "[" + ", ".join(f"'{t}'" for t in terms) + "]"
    must_filter = f"WHERE nt = {len(terms)}" if mode == "must" else ""
    return f"""
        WITH base AS (
            SELECT {id_col}, {analyze_sql(text_col)} AS toks FROM {table}
        ),
        lengths AS (SELECT {id_col}, len(toks) AS dl FROM base),
        stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM lengths),
        tf AS (
            SELECT {id_col}, term, count(*)::BIGINT AS tf
            FROM (
                SELECT {id_col},
                       unnest(list_filter(toks, t -> list_contains({terms_list}, t))) AS term
                FROM base
            )
            GROUP BY 1, 2
        ),
        dfc AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
        scored AS (
            SELECT {id_col},
                   ROUND(sum(
                       ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
                       * (tf * {k1 + 1!r})
                       / (tf + {k1!r} * ({1 - b!r} + {b!r} * dl / avgdl))
                   ), 6) AS bm25,
                   count(DISTINCT term) AS nt
            FROM tf
            JOIN dfc USING (term)
            JOIN lengths USING ({id_col})
            CROSS JOIN stats
            GROUP BY {id_col}
        )
        SELECT {id_col}, bm25 FROM scored
        {must_filter}
        ORDER BY bm25 DESC, {id_col}
        LIMIT {top_k}
    """
