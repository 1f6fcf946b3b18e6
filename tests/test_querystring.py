"""Lucene query-string parser: node-tree shapes, plan equality with
the equivalent request-body DSL JSON (both compile through
dsl.compile_query, so the Catalyst plans must be identical), pushdown,
and error handling. The parity gate value-checks the five qs_*
entries; these pin the parser itself."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.dsl import search
from postgres_opensearch_cdc_spark.querystring import (
    QueryStringError,
    parse_query_string,
)
from postgres_opensearch_cdc_spark.testing import explain_plan


def test_field_term_and_coercion():
    assert parse_query_string("status:ACTIVE") == {
        "term": {"status": "ACTIVE"}
    }
    assert parse_query_string("is_active:true") == {
        "term": {"is_active": True}
    }
    assert parse_query_string("status_enum:0") == {"term": {"status_enum": 0}}
    assert parse_query_string("rate:1.5") == {"term": {"rate": 1.5}}


def test_and_or_not_precedence():
    """a OR b AND c parses as a OR (b AND c) — AND binds tighter."""
    node = parse_query_string("a:1 OR b:2 AND c:3")
    assert node == {
        "bool": {
            "should": [
                {"term": {"a": 1}},
                {"bool": {"must": [{"term": {"b": 2}}, {"term": {"c": 3}}]}},
            ],
            "minimum_should_match": 1,
        }
    }
    assert parse_query_string("NOT a:1") == {
        "bool": {"must_not": [{"term": {"a": 1}}]}
    }


def test_grouping_overrides_precedence():
    node = parse_query_string("(a:1 OR b:2) AND c:3")
    assert node["bool"]["must"][0]["bool"]["should"] == [
        {"term": {"a": 1}},
        {"term": {"b": 2}},
    ]


def test_comparison_forms_agree():
    """field:>N and field > N produce the same range node."""
    assert (
        parse_query_string("amount:>1000")
        == parse_query_string("amount > 1000")
        == {"range": {"amount": {"gt": 1000}}}
    )
    assert parse_query_string("amount:<=2.5") == {
        "range": {"amount": {"lte": 2.5}}
    }


def test_bracket_ranges():
    assert parse_query_string("v:[100 TO 500}") == {
        "range": {"v": {"gte": 100, "lt": 500}}
    }
    assert parse_query_string("v:{1 TO 9]") == {
        "range": {"v": {"gt": 1, "lte": 9}}
    }
    assert parse_query_string("d:[2024-01-05 TO *]") == {
        "range": {"d": {"gte": "2024-01-05"}}
    }
    with pytest.raises(QueryStringError, match="unbounded"):
        parse_query_string("v:[* TO *]")


def test_wildcard_phrase_exists_and_default_field():
    assert parse_query_string("card_type:card*") == {
        "wildcard": {"card_type": "card*"}
    }
    assert parse_query_string('msg:"timed out"') == {
        "match_phrase": {"msg": "timed out"}
    }
    assert parse_query_string("_exists_:value") == {
        "exists": {"field": "value"}
    }
    assert parse_query_string("spark", default_field="text") == {
        "match": {"text": "spark"}
    }
    assert parse_query_string("card*", default_field="text") == {
        "wildcard": {"text": "card*"}
    }
    with pytest.raises(QueryStringError, match="default_field"):
        parse_query_string("spark")


def test_default_operator():
    assert parse_query_string("a b", default_field="t") == {
        "bool": {
            "should": [{"match": {"t": "a"}}, {"match": {"t": "b"}}],
            "minimum_should_match": 1,
        }
    }
    assert parse_query_string("a b", default_field="t",
                              default_operator="AND") == {
        "bool": {"must": [{"match": {"t": "a"}}, {"match": {"t": "b"}}]}
    }


def test_errors():
    for bad in ("", "f:", "f:[1 TO", "(a:1", "AND", "f:AND", "a:1)"):
        with pytest.raises(QueryStringError):
            parse_query_string(bad)


def test_plan_matches_equivalent_dsl_json(spark, sf_dir):
    """The search-bar string and the hand-written request-body JSON
    must compile to the SAME Catalyst plan — one compilation path."""
    qs_body = {
        "query": {"query_string": {
            "query": "o_orderstatus:F AND o_totalprice > 1000.0",
        }},
        "_source": ["o_orderkey"], "size": 10,
        "sort": [{"o_orderkey": {"order": "asc"}}],
    }
    dsl_body = {
        "query": {"bool": {"must": [
            {"term": {"o_orderstatus": "F"}},
            {"range": {"o_totalprice": {"gt": 1000.0}}},
        ]}},
        "_source": ["o_orderkey"], "size": 10,
        "sort": [{"o_orderkey": {"order": "asc"}}],
    }
    import re

    p1 = explain_plan(search(spark, sf_dir, "orders", qs_body,
                             id_col="o_orderkey"))
    p2 = explain_plan(search(spark, sf_dir, "orders", dsl_body,
                             id_col="o_orderkey"))
    # expression IDs (#7L vs #0L) differ per-DataFrame; strip them
    assert re.sub(r"#\d+", "#", p1) == re.sub(r"#\d+", "#", p2)
    assert "EqualTo(o_orderstatus,F)" in p1, "term not pushed to scan"
    assert "GreaterThan(o_totalprice,1000.0)" in p1, "range not pushed"


def test_query_string_accepts_bare_string_body(spark, sf_dir):
    df = search(
        spark, sf_dir, "orders",
        {"query": {"query_string": "o_orderstatus:F"}, "size": 5},
        id_col="o_orderkey",
    )
    assert df.count() == 5


def test_field_grouping_distributes_field():
    """field:(a OR b) — values inside the group are TERMS on the
    field (wildcards/phrases keep their kinds); nesting restores the
    outer context."""
    assert parse_query_string("t:(a OR b)") == {
        "bool": {
            "should": [{"term": {"t": "a"}}, {"term": {"t": "b"}}],
            "minimum_should_match": 1,
        }
    }
    assert parse_query_string("t:(PROMO* OR 7)") == {
        "bool": {
            "should": [{"wildcard": {"t": "PROMO*"}}, {"term": {"t": 7}}],
            "minimum_should_match": 1,
        }
    }
    assert parse_query_string('t:("a b" AND NOT c)') == {
        "bool": {"must": [
            {"match_phrase": {"t": "a b"}},
            {"bool": {"must_not": [{"term": {"t": "c"}}]}},
        ]}
    }
    # explicit field: inside the group still wins over the group field
    assert parse_query_string("t:(a OR u:b)") == {
        "bool": {
            "should": [{"term": {"t": "a"}}, {"term": {"u": "b"}}],
            "minimum_should_match": 1,
        }
    }
    # after the group closes, bare terms are back to default_field rules
    with pytest.raises(QueryStringError, match="default_field"):
        parse_query_string("t:(a) b")


def test_plus_minus_operators():
    """Adjacent +/- clauses are cumulative must/must_not; a leading
    single sign works; mixing signed with bare adjacency raises."""
    assert parse_query_string("+status:ACTIVE -card_type:DEBIT") == {
        "bool": {"must": [
            {"term": {"status": "ACTIVE"}},
            {"bool": {"must_not": [{"term": {"card_type": "DEBIT"}}]}},
        ]}
    }
    assert parse_query_string("-status:CLOSED") == {
        "bool": {"must_not": [{"term": {"status": "CLOSED"}}]}
    }
    # explicit operators can combine signed and bare clauses freely
    assert parse_query_string("a:1 AND -b:2") == {
        "bool": {"must": [
            {"term": {"a": 1}},
            {"bool": {"must_not": [{"term": {"b": 2}}]}},
        ]}
    }
    with pytest.raises(QueryStringError, match="explicit AND/OR"):
        parse_query_string("a:1 +b:2")
    with pytest.raises(QueryStringError, match="explicit AND/OR"):
        parse_query_string("+a:1 b:2", default_field="t")
    # negative numbers are values, not prohibition operators
    assert parse_query_string("delta:-17") == {"term": {"delta": -17}}


def test_backslash_escapes():
    assert parse_query_string(r"path:foo\:bar") == {
        "term": {"path": "foo:bar"}
    }
    assert parse_query_string(r"name:star\*") == {"term": {"name": "star*"}}
    assert parse_query_string(r"f:a\ b") == {"term": {"f": "a b"}}
    with pytest.raises(QueryStringError, match="escaped and live"):
        parse_query_string(r"f:a\*b*")


def test_fuzzy_suffix(spark, sf_dir):
    """term~ / term~1 parse to the fuzzy node (levenshtein filter);
    escaped tilde stays a literal term."""
    assert parse_query_string("lang:en~1") == {
        "fuzzy": {"lang": {"value": "en", "fuzziness": 1}}
    }
    assert parse_query_string("status:ACTIVE~") == {
        "fuzzy": {"status": {"value": "ACTIVE", "fuzziness": 2}}
    }
    assert parse_query_string(r"path:a\~b") == {"term": {"path": "a~b"}}
    # end-to-end: fuzzy matches within the distance only
    rows = search(
        spark, sf_dir, "documents",
        {"query": {"query_string": "lang:fn~1"}, "size": 500,
         "_source": ["lang"]},
    ).collect()
    langs = {r["lang"] for r in rows}
    assert rows and langs <= {"en", "fi", "fr", "fn"}, langs
    assert "zh" not in langs  # distance 2 from 'fn' — outside ~1


def test_fuzzy_suffix_multi_digit_rejected():
    """`term~25` must be a parse error (Lucene caps edit distance at
    2), not a silent literal term or a mis-split fuzziness — the
    greedy suffix split captures the WHOLE numeric tail."""
    with pytest.raises(QueryStringError, match="fuzziness 25"):
        parse_query_string("f:term~25")
    with pytest.raises(QueryStringError, match="fuzziness 3"):
        parse_query_string("f:term~3")
    with pytest.raises(QueryStringError, match="fuzziness 9"):
        parse_query_string("term~9", default_field="text")
    # boundary values still parse
    assert parse_query_string("f:term~0") == {
        "fuzzy": {"f": {"value": "term", "fuzziness": 0}}
    }
    assert parse_query_string("f:term~2") == {
        "fuzzy": {"f": {"value": "term", "fuzziness": 2}}
    }
    # tilde followed by non-digits is NOT a fuzzy suffix — literal term
    assert parse_query_string("f:a~b") == {"term": {"f": "a~b"}}
    # the LAST tilde anchors the split: value may itself contain tildes
    assert parse_query_string("f:a~b~1") == {
        "fuzzy": {"f": {"value": "a~b", "fuzziness": 1}}
    }


def test_simple_query_string_grammar_and_lenience(spark, sf_dir):
    """simple_query_string: + AND, | OR, - NOT, "phrase", trailing *
    prefix, ( ) grouping, whitespace = default_operator; LENIENT —
    garbage input never raises, it degrades to match_all / partial
    trees. Compiles through the same DSL path as every interface."""
    from postgres_opensearch_cdc_spark.querystring import (
        parse_simple_query_string as sqs,
    )

    assert sqs("hash join") == {"bool": {
        "should": [{"match": {"text": "hash"}}, {"match": {"text": "join"}}],
        "minimum_should_match": 1,
    }}
    assert sqs("+hash +join -slow", default_operator="AND") == {"bool": {
        "must": [
            {"bool": {"must": [{"match": {"text": "hash"}},
                               {"match": {"text": "join"}}]}},
            {"bool": {"must_not": [{"match": {"text": "slow"}}]}},
        ]}}
    assert sqs('a | "b c"') == {"bool": {
        "should": [{"match": {"text": "a"}},
                   {"match_phrase": {"text": "b c"}}],
        "minimum_should_match": 1,
    }}
    assert sqs("pro*") == {"prefix": {"text": "pro"}}
    # grouping binds before the fold continues
    assert sqs("(a | b) c", default_operator="AND")["bool"]["must"][0] == {
        "bool": {"should": [{"match": {"text": "a"}},
                            {"match": {"text": "b"}}],
                 "minimum_should_match": 1}}
    # multi-field leaf fans out as a should
    assert sqs("x", fields=["text", "source"]) == {"bool": {
        "should": [{"match": {"text": "x"}}, {"match": {"source": "x"}}],
        "minimum_should_match": 1,
    }}
    # lenience: none of these raise, all produce an executable node
    import random

    from postgres_opensearch_cdc_spark.dsl import compile_query

    rng = random.Random(7)
    alphabet = 'ab" ()|+-*~:<>['
    for _ in range(300):
        junk = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 24)))
        node = sqs(junk)
        compile_query(node)  # must compile to a Column, never raise
    assert sqs("") == {"match_all": {}}
    assert sqs("((( | + -") == {"match_all": {}}
    assert sqs("- -") == {"match_all": {}}


def test_sqs_negation_fold_parse_tree():
    """Negation scope contract (round-8 ADVICE item evaluated and
    REJECTED with evidence): ``-x`` folds as a standalone NOT-x clause
    under the active operator — it is NOT hoisted to a must_not of the
    enclosing boolean. That hoisting is the CLASSIC QueryParser
    (query_string) behavior; Lucene's SimpleQueryParser instead wraps
    the negated branch as BooleanQuery[MUST_NOT x, SHOULD
    MatchAllDocsQuery] (its own TestSimpleQueryParser.testNegationTerm
    pins the wrapper) inside the PRIVATE buildQueryTree, then combines
    it with the default operator like any positive clause. So in
    ES/OpenSearch ``foo -bar`` with default_operator=OR genuinely
    matches ``foo OR NOT bar`` — over-broad by design; exclusion
    semantics need default_operator=AND (the guidance ES gives)."""
    from postgres_opensearch_cdc_spark.querystring import (
        parse_simple_query_string as sqs,
    )

    not_bar = {"bool": {"must_not": [{"match": {"text": "bar"}}]}}
    assert sqs("foo -bar", default_operator="OR") == {"bool": {
        "should": [{"match": {"text": "foo"}}, not_bar],
        "minimum_should_match": 1,
    }}
    assert sqs("foo -bar", default_operator="AND") == {"bool": {
        "must": [{"match": {"text": "foo"}}, not_bar],
    }}
    # explicit separators override the default on either side
    assert sqs("foo + -bar", default_operator="OR") == {"bool": {
        "must": [{"match": {"text": "foo"}}, not_bar],
    }}
    assert sqs("foo | -bar", default_operator="AND") == {"bool": {
        "should": [{"match": {"text": "foo"}}, not_bar],
        "minimum_should_match": 1,
    }}


def test_sqs_negation_fold_execution(spark, sf_dir):
    """End-to-end proof of the fold semantics on real data: with OR,
    ``click -error`` admits every row that is not 'error' (plus the
    clicks); with AND it excludes 'error' from the clicks. The OR
    result being near-corpus-size is the documented Lucene behavior,
    not a bug."""
    import duckdb

    from postgres_opensearch_cdc_spark.dsl import search

    def run(op):
        body = {
            "query": {"simple_query_string": {
                "query": "click -error", "fields": ["event_type"],
                "default_operator": op,
            }},
            "_source": ["event_id"], "sort": [{"event_id": "asc"}],
            "size": 1000000,
        }
        df = search(spark, sf_dir, "events", body, id_col="event_id")
        return [r["event_id"] for r in df.collect()]

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'")

    def oracle(pred):
        return [r[0] for r in con.sql(
            f"SELECT event_id FROM events WHERE {pred} ORDER BY event_id"
        ).fetchall()]

    got_or = run("OR")
    assert got_or == oracle(
        "event_type = 'click' OR NOT event_type = 'error'"
    )
    got_and = run("AND")
    assert got_and == oracle(
        "event_type = 'click' AND NOT event_type = 'error'"
    )
    # sanity of the distinction itself: OR is strictly broader here
    assert len(got_and) < len(got_or)
