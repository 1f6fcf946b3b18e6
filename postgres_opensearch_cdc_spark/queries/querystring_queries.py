"""Lucene query-string entries: the Dashboards search-bar syntax the
reference's users type (DASHBOARD_GUIDE.md:89 ``status:ACTIVE AND
card_type:DEBIT``; :122-135 ``is_active:true AND pending_amount > 0``,
wildcards ``card*``), executed through the querystring.py parser →
dsl.py compiler path and value-checked against handwritten DuckDB SQL.

One entry per syntax shape: field:term conjunction, spaced numeric
comparison, wildcard (feeding an agg), grouped bool + bracket date/
numeric ranges + NOT + _exists_, and analyzed free text against a
default field. Every filter compiles to built-in Column predicates, so
the scan sees pushed filters identical to the request-body DSL's."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from postgres_opensearch_cdc_spark.dsl import search


def qs_term_conjunction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``status:VALUE AND other:VALUE`` — the DASHBOARD_GUIDE.md:89
    shape on the orders table; hits sorted by price."""
    body = {
        "query": {"query_string": {
            "query": "o_orderstatus:F AND o_orderpriority:1-URGENT",
        }},
        "_source": ["o_orderkey", "o_totalprice", "o_orderpriority"],
        "sort": [{"o_totalprice": {"order": "desc"}},
                 {"o_orderkey": {"order": "asc"}}],
        "size": 20,
    }
    return search(spark, sf_dir, "orders", body, id_col="o_orderkey")


def qs_spaced_comparison(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``is_active:true AND pending_amount > 0`` analog
    (DASHBOARD_GUIDE.md:122-135): spaced comparison + field:term."""
    body = {
        "query": {"query_string": {
            "query": "c_acctbal > 1000.0 AND c_mktsegment:BUILDING",
        }},
        "_source": ["c_custkey", "c_acctbal"],
        "sort": [{"c_acctbal": {"order": "desc"}},
                 {"c_custkey": {"order": "asc"}}],
        "size": 25,
    }
    return search(spark, sf_dir, "customer", body, id_col="c_custkey")


def qs_wildcard_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wildcard clauses (``card*`` shape) OR-ed through field grouping,
    feeding a terms agg — the search-bar-plus-panel combination."""
    body = {
        "query": {"query_string": {
            "query": "p_type:(PROMO* OR ECONOMY*)",
        }},
        "aggs": {"ptype": {"terms": {"field": "p_type", "size": 15}}},
    }
    return search(spark, sf_dir, "part", body, id_col="p_partkey")


def qs_grouped_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping, bracket ranges (inclusive/exclusive ends, ISO date
    bounds), NOT, and _exists_ in one expression."""
    body = {
        "query": {"query_string": {
            "query": "(event_type:purchase OR event_type:signup) "
                     "AND value:[100 TO 500} "
                     "AND ts:[2024-01-05 TO 2024-01-25} "
                     "AND NOT user_id:7 AND _exists_:value",
        }},
        "_source": ["event_id", "event_type", "value"],
        "sort": [{"event_id": {"order": "asc"}}],
        "size": 50,
    }
    return search(spark, sf_dir, "events", body, id_col="event_id")


def qs_free_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bare terms analyzed against default_field (ES query_string
    semantics) mixed with a fielded term."""
    body = {
        "query": {"query_string": {
            "query": "(spark OR streaming) AND lang:en",
            "default_field": "text",
        }},
        "_source": ["doc_id", "lang", "n_chars"],
        "sort": [{"doc_id": {"order": "asc"}}],
        "size": 40,
    }
    return search(spark, sf_dir, "documents", body)


def sqs_required_prohibited(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``simple_query_string`` — the LENIENT search-bar variant (never
    400s on user syntax): ``+`` AND, ``-`` NOT, default_operator=AND.
    All clauses analyzed token matches against the text field."""
    body = {
        "query": {"simple_query_string": {
            "query": "+hash +join -slow",
            "fields": ["text"],
            "default_operator": "AND",
        }},
        "_source": ["doc_id", "source"],
        "sort": [{"doc_id": {"order": "asc"}}],
        "size": 100,
    }
    return search(spark, sf_dir, "documents", body)


def sqs_or_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simple_query_string ``|`` alternation mixing an analyzed term
    with a quoted phrase."""
    body = {
        "query": {"simple_query_string": {
            "query": 'vector | "merge join" | scan',
            "fields": ["text"],
        }},
        "_source": ["doc_id", "n_chars"],
        "sort": [{"doc_id": {"order": "asc"}}],
        "size": 200,
    }
    return search(spark, sf_dir, "documents", body)


def sqs_prefix_keyword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """simple_query_string trailing-``*`` prefix clauses on a keyword
    field (term-level startswith — same node the DSL ``prefix`` query
    compiles to a scan-pushable StringStartsWith)."""
    body = {
        "query": {"simple_query_string": {
            "query": "PROMO* | ECONOMY*",
            "fields": ["p_type"],
        }},
        "_source": ["p_partkey", "p_type"],
        "sort": [{"p_partkey": {"order": "asc"}}],
        "size": 60,
    }
    return search(spark, sf_dir, "part", body, id_col="p_partkey")


QUERIES = {
    "qs_term_conjunction": qs_term_conjunction,
    "qs_spaced_comparison": qs_spaced_comparison,
    "qs_wildcard_terms": qs_wildcard_terms,
    "qs_grouped_ranges": qs_grouped_ranges,
    "qs_free_text": qs_free_text,
    "sqs_required_prohibited": sqs_required_prohibited,
    "sqs_or_phrase": sqs_or_phrase,
    "sqs_prefix_keyword": sqs_prefix_keyword,
}

ORACLE = {
    "qs_term_conjunction": """
        SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
    "qs_spaced_comparison": """
        SELECT c_custkey, c_acctbal FROM customer
        WHERE c_acctbal > 1000.0 AND c_mktsegment = 'BUILDING'
        ORDER BY c_acctbal DESC, c_custkey LIMIT 25
    """,
    "qs_wildcard_terms": """
        SELECT p_type AS ptype, COUNT(*) AS doc_count FROM part
        WHERE p_type LIKE 'PROMO%' OR p_type LIKE 'ECONOMY%'
        GROUP BY p_type
        ORDER BY doc_count DESC, ptype LIMIT 15
    """,
    "qs_grouped_ranges": """
        SELECT event_id, event_type, value FROM events
        WHERE event_type IN ('purchase', 'signup')
          AND value >= 100 AND value < 500
          AND ts >= TIMESTAMP '2024-01-05' AND ts < TIMESTAMP '2024-01-25'
          AND NOT user_id = 7 AND value IS NOT NULL
        ORDER BY event_id LIMIT 50
    """,
    "qs_free_text": r"""
        SELECT doc_id, lang, n_chars FROM documents
        WHERE (regexp_matches(lower(text), '\bspark\b')
               OR regexp_matches(lower(text), '\bstreaming\b'))
          AND lang = 'en'
        ORDER BY doc_id LIMIT 40
    """,
    "sqs_required_prohibited": r"""
        SELECT doc_id, source FROM documents
        WHERE regexp_matches(lower(text), '\bhash\b')
          AND regexp_matches(lower(text), '\bjoin\b')
          AND NOT regexp_matches(lower(text), '\bslow\b')
        ORDER BY doc_id LIMIT 100
    """,
    "sqs_or_phrase": r"""
        SELECT doc_id, n_chars FROM documents
        WHERE regexp_matches(lower(text), '\bvector\b')
           OR regexp_matches(text, '\bmerge join\b')
           OR regexp_matches(lower(text), '\bscan\b')
        ORDER BY doc_id LIMIT 200
    """,
    "sqs_prefix_keyword": """
        SELECT p_partkey, p_type FROM part
        WHERE p_type LIKE 'PROMO%' OR p_type LIKE 'ECONOMY%'
        ORDER BY p_partkey LIMIT 60
    """,
}
