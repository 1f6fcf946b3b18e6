"""Request-body DSL compiler: node semantics, pushdown, and error
handling — the parity gate value-checks the three entry bodies; these
pin per-node behavior."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.dsl import DSLError, compile_query, search
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import explain_plan


def test_term_and_range_push_to_scan(spark, sf_dir):
    body = {
        "query": {
            "bool": {
                "must": [{"term": {"event_type": "click"}}],
                "filter": [{"range": {"value": {"gte": 100}}}],
            }
        },
        "size": 5,
    }
    plan = explain_plan(search(spark, sf_dir, "events", body, id_col="event_id"))
    assert "EqualTo(event_type,click)" in plan
    assert "GreaterThanOrEqual(value,100" in plan


def test_date_string_casts_to_timestamp(spark, sf_dir):
    df = search(
        spark,
        sf_dir,
        "events",
        {"query": {"range": {"ts": {"gte": "2024-01-10", "lt": "2024-01-11"}}}},
        id_col="event_id",
    )
    days = {str(r["ts"])[:10] for r in df.collect()}
    assert days == {"2024-01-10"}


def test_must_not_excludes(spark, sf_dir):
    df = search(
        spark,
        sf_dir,
        "events",
        {"query": {"bool": {"must_not": [{"term": {"event_type": "error"}}]}}},
        id_col="event_id",
    )
    assert df.filter("event_type = 'error'").count() == 0


def test_minimum_should_match_two(spark, sf_dir):
    df = search(
        spark,
        sf_dir,
        "documents",
        {
            "query": {
                "bool": {
                    "should": [
                        {"match": {"text": "spark"}},
                        {"match": {"text": "window"}},
                        {"match": {"text": "vector"}},
                    ],
                    "minimum_should_match": 2,
                }
            }
        },
    )
    for r in df.select("text").collect():
        hits = sum(1 for t in ("spark", "window", "vector") if t in r["text"])
        assert hits >= 2


def test_ids_and_wildcard(spark, sf_dir):
    got = {
        r["doc_id"]
        for r in search(
            spark, sf_dir, "documents", {"query": {"ids": {"values": [1, 2, 3]}}}
        ).collect()
    }
    assert got == {1, 2, 3}
    wc = search(
        spark, sf_dir, "documents", {"query": {"wildcard": {"source": "src1*"}}}
    )
    assert all(r["source"].startswith("src1") for r in wc.collect())


def test_terms_bucket_orders_and_sizes(spark, sf_dir):
    df = search(
        spark,
        sf_dir,
        "documents",
        {
            "aggs": {
                "by_lang": {
                    "terms": {"field": "lang", "size": 3},
                    "aggs": {"chars": {"sum": {"field": "n_chars"}}},
                }
            }
        },
    )
    rows = df.collect()
    assert len(rows) == 3
    counts = [r["doc_count"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["chars"] > 0 for r in rows)


def test_unknown_nodes_raise(spark, sf_dir):
    with pytest.raises(DSLError, match="unknown query node"):
        compile_query({"fuzzy_wuzzy": {"f": 1}})
    with pytest.raises(DSLError, match="unknown metric"):
        search(
            spark,
            sf_dir,
            "events",
            {"aggs": {"x": {"terms": {"field": "event_type"},
                            "aggs": {"m": {"median": {"field": "value"}}}}}},
            id_col="event_id",
        )


def test_range_buckets_overlap_independently(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.dsl_queries import (
        dsl_range_buckets,
    )

    rows = {r["bands"]: r["doc_count"] for r in dsl_range_buckets(spark, sf_dir).collect()}
    total = load_table(spark, sf_dir, "events").count()
    # overlapping ranges double-count: the three bucket sums exceed the corpus
    assert sum(rows.values()) > total
    assert set(rows) == {"*-100", "50-300", "300-*"}


def test_histogram_buckets_align_to_interval(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.dsl_queries import (
        dsl_value_histogram,
    )

    for r in dsl_value_histogram(spark, sf_dir).collect():
        assert r["val_bucket"] % 100 == 0
        assert r["val_bucket"] <= r["max_v"] < r["val_bucket"] + 100


def test_nested_terms_ranks_within_outer(spark, sf_dir):
    body = {
        "aggs": {
            "day": {
                "date_histogram": {"field": "ts", "calendar_interval": "day"},
                "aggs": {"et": {"terms": {"field": "event_type", "size": 2}}},
            }
        }
    }
    rows = search(spark, sf_dir, "events", body, id_col="event_id").collect()
    per_day = {}
    for r in rows:
        per_day.setdefault(r["day"], []).append(r["doc_count"])
    for day, counts in per_day.items():
        assert len(counts) <= 2, "inner size not enforced"
        assert counts == sorted(counts, reverse=True), "inner not ranked"


def test_nested_outer_terms_size_keeps_top_totals(spark, sf_dir):
    body = {
        "aggs": {
            "ou": {
                "terms": {"field": "event_type", "size": 2},
                "aggs": {"lang": {"terms": {"field": "user_id", "size": 1}}},
            }
        }
    }
    rows = search(spark, sf_dir, "events", body, id_col="event_id").collect()
    outer = {r["ou"] for r in rows}
    totals = {
        r["event_type"]: r["count"]
        for r in load_table(spark, sf_dir, "events").groupBy("event_type").count().collect()
    }
    top2 = sorted(totals, key=lambda k: (-totals[k], k))[:2]
    assert outer == set(top2), "outer size must keep top-N by total doc_count"


def test_top_hits_requires_sort_and_source(spark, sf_dir):
    with pytest.raises(DSLError, match="sort"):
        search(
            spark, sf_dir, "events",
            {"aggs": {"t": {"terms": {"field": "event_type"},
                            "aggs": {"h": {"top_hits": {"size": 1,
                                                        "_source": ["event_id"]}}}}}},
            id_col="event_id",
        )


def test_composite_pages_are_disjoint_and_exhaustive(spark, sf_dir):
    base = {
        "sources": [
            {"et": {"terms": {"field": "event_type"}}},
            {"u": {"terms": {"field": "user_id"}}},
        ],
        "size": 40,
    }
    seen, after, pages = [], None, 0
    while True:
        body = dict(base)
        if after:
            body["after"] = after
        page = search(
            spark, sf_dir, "events",
            {"aggs": {"p": {"composite": body}}}, id_col="event_id",
        ).collect()
        if not page:
            break
        seen.extend((r["et"], r["u"]) for r in page)
        after = {"et": page[-1]["et"], "u": page[-1]["u"]}
        pages += 1
        assert pages < 100, "pagination did not terminate"
    assert len(seen) == len(set(seen)), "pages overlap"
    truth = {
        (r["event_type"], r["user_id"])
        for r in load_table(spark, sf_dir, "events")
        .select("event_type", "user_id").distinct().collect()
    }
    assert set(seen) == truth, "pagination missed key tuples"


def test_knn_clause_prefilters_and_excludes(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table
    from pyspark.sql import functions as F

    vecs = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in vecs.filter(F.col("vec_id") == 0).head()["embedding"]]
    body = {
        "query": {"bool": {"must_not": [{"ids": {"values": [0]}}]}},
        "knn": {"embedding": {"query_vector": q, "k": 5}},
    }
    out = search(spark, sf_dir, "embeddings", body, id_col="vec_id").collect()
    assert len(out) == 5
    assert all(r["vec_id"] != 0 for r in out), "pre-filter must exclude id 0"
    sims = [r["cos_sim"] for r in out]
    assert sims == sorted(sims, reverse=True)


def test_search_after_pages_are_disjoint_and_ordered(spark, sf_dir):
    base = {
        "_source": ["event_id", "value"],
        "sort": [{"value": {"order": "desc"}}, {"event_id": {"order": "asc"}}],
        "size": 30,
    }
    seen, cursor = [], None
    while True:
        body = dict(base)
        if cursor:
            body["search_after"] = cursor
        page = search(spark, sf_dir, "events", body, id_col="event_id").collect()
        if not page:
            break
        keys = [(r["value"], r["event_id"]) for r in page]
        # strictly descending by (value asc tiebreak id)
        for a, b in zip(keys, keys[1:]):
            assert a[0] > b[0] or (a[0] == b[0] and a[1] < b[1])
        seen.extend(r["event_id"] for r in page)
        cursor = [page[-1]["value"], page[-1]["event_id"]]
        if len(seen) > 200:
            break
    assert len(seen) == len(set(seen)), "pages overlap"


def test_search_after_requires_matching_sort(spark, sf_dir):
    with pytest.raises(DSLError, match="search_after"):
        search(
            spark, sf_dir, "events",
            {"search_after": [1], "_source": ["event_id"]},
            id_col="event_id",
        )


def test_terms_default_size_applies_with_subaggs(spark, sf_dir):
    """Adding a sub-bucket or top_hits must not silently unbound the
    outer terms bucket count (ES default size 10)."""
    nested = {
        "aggs": {"u": {"terms": {"field": "user_id"},
                       "aggs": {"t": {"terms": {"field": "event_type",
                                                "size": 1}}}}}
    }
    rows = search(spark, sf_dir, "events", nested, id_col="event_id").collect()
    assert len({r["u"] for r in rows}) <= 10
    th = {
        "aggs": {"u": {"terms": {"field": "user_id"},
                       "aggs": {"h": {"top_hits": {
                           "size": 1,
                           "sort": [{"event_id": "asc"}],
                           "_source": ["event_id"]}}}}}
    }
    rows = search(spark, sf_dir, "events", th, id_col="event_id").collect()
    assert len({r["u"] for r in rows}) <= 10


def test_knn_rejects_unsupported_clauses(spark, sf_dir):
    body = {
        "knn": {"embedding": {"query_vector": [0.0] * 64, "k": 3}},
        "aggs": {"x": {"terms": {"field": "label"}}},
    }
    with pytest.raises(DSLError, match="knn cannot be combined"):
        search(spark, sf_dir, "embeddings", body, id_col="vec_id")


def test_sort_field_outside_source(spark, sf_dir):
    """ES allows sorting (and cursoring) on fields excluded from
    _source — the projection must happen last."""
    body = {
        "_source": ["event_id"],
        "sort": [{"value": {"order": "desc"}}, {"event_id": "asc"}],
        "search_after": [250.0, 100],
        "size": 5,
    }
    out = search(spark, sf_dir, "events", body, id_col="event_id")
    assert out.columns == ["event_id"]
    assert len(out.collect()) == 5


def test_composite_source_name_shadowing_field(spark, sf_dir):
    """A source whose NAME equals another source's underlying FIELD
    must not corrupt cursor pages (the cursor compiles against key
    expressions, not materialized columns)."""
    body = {
        "aggs": {"p": {"composite": {
            "size": 1000,
            "sources": [
                {"user_id": {"terms": {"field": "event_type"}}},
                {"x": {"terms": {"field": "user_id"}}},
            ],
        }}}
    }
    page1 = search(spark, sf_dir, "events", body, id_col="event_id").collect()
    body["aggs"]["p"]["composite"]["after"] = {
        "user_id": page1[0]["user_id"], "x": page1[0]["x"],
    }
    page2 = search(spark, sf_dir, "events", body, id_col="event_id").collect()
    keys1 = {(r["user_id"], r["x"]) for r in page1}
    keys2 = {(r["user_id"], r["x"]) for r in page2}
    assert keys2 <= keys1 - {(page1[0]["user_id"], page1[0]["x"])}
    assert len(keys1 - keys2) == 1, "page 2 must drop exactly the cursor tuple"


def test_terms_min_doc_count(spark, sf_dir):
    body = {"aggs": {"u": {"terms": {"field": "user_id", "size": 10000,
                                     "min_doc_count": 5}}}}
    rows = search(spark, sf_dir, "events", body, id_col="event_id").collect()
    assert rows and all(r["doc_count"] >= 5 for r in rows)
    # count parity with a manual groupBy
    from postgres_opensearch_cdc_spark.registry import load_table

    manual = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id").count().filter("count >= 5").count()
    )
    assert len(rows) == manual


def test_should_null_clause_counts_as_zero(spark):
    """ES semantics: a should clause evaluating to NULL (e.g. a range
    on a NULL field) counts as 0 hits, not NULL — a doc matching
    another clause must still satisfy minimum_should_match=1."""
    df = spark.createDataFrame(
        [(1, None, "click"), (2, 50.0, "view")],
        "id long, v double, t string",
    )
    cond = compile_query({
        "bool": {
            "should": [
                {"range": {"v": {"gte": 10}}},
                {"term": {"t": "click"}},
            ],
            "minimum_should_match": 1,
        }
    }, id_col="id")
    got = {r["id"] for r in df.filter(cond).collect()}
    assert got == {1, 2}, "NULL clause poisoned the msm sum"


def test_composite_after_missing_key_raises_dsl_error(spark, sf_dir):
    body = {"aggs": {"p": {"composite": {
        "sources": [
            {"et": {"terms": {"field": "event_type"}}},
            {"u": {"terms": {"field": "user_id"}}},
        ],
        "after": {"et": "purchase"},
    }}}}
    with pytest.raises(DSLError, match="missing source key"):
        search(spark, sf_dir, "events", body, id_col="event_id")


def test_composite_source_desc_paginates_backwards(spark, sf_dir):
    """Per-source order: desc is honored in both page ordering and the
    after-cursor direction; pages stay disjoint and exhaustive."""
    base = {"sources": [{"et": {"terms": {"field": "event_type",
                                          "order": "desc"}}}],
            "size": 2}
    p1 = search(spark, sf_dir, "events",
                {"aggs": {"p": {"composite": base}}},
                id_col="event_id").collect()
    keys1 = [r["et"] for r in p1]
    assert keys1 == sorted(keys1, reverse=True)
    body2 = {"aggs": {"p": {"composite": {**base, "after": {"et": keys1[-1]}}}}}
    p2 = search(spark, sf_dir, "events", body2, id_col="event_id").collect()
    keys2 = [r["et"] for r in p2]
    assert keys2 and all(k < keys1[-1] for k in keys2), (
        "desc after-cursor must continue strictly below the last key"
    )


def test_composite_source_missing_bucket_raises(spark, sf_dir):
    """missing_bucket stays unsupported — the cursor predicate assumes
    non-null keys, so accepting it would paginate wrongly."""
    body = {"aggs": {"p": {"composite": {
        "sources": [{"et": {"terms": {"field": "event_type",
                                      "missing_bucket": True}}}],
    }}}}
    with pytest.raises(DSLError, match="composite source option"):
        search(spark, sf_dir, "events", body, id_col="event_id")


def test_nested_terms_outer_order_and_min_doc_count(spark, sf_dir):
    """The nested and top_hits paths honor outer order on _key/_count
    and min_doc_count like the flat terms path; ordering by a metric
    sub-agg (which lives on the INNER buckets) raises."""
    nested = {"aggs": {"t": {
        "terms": {"field": "event_type", "order": {"_key": "asc"},
                  "size": 3},
        "aggs": {"u": {"terms": {"field": "user_id", "size": 1}}},
    }}}
    rows = search(spark, sf_dir, "events", nested, id_col="event_id").collect()
    outer = [r["t"] for r in rows]
    assert outer == sorted(outer) and len(set(outer)) == 3, (
        "_key asc must pick the 3 alphabetically-first buckets"
    )
    th = {"aggs": {"t": {
        "terms": {"field": "event_type", "min_doc_count": 10**9},
        "aggs": {"h": {"top_hits": {
            "size": 1, "sort": [{"value": {"order": "desc"}}],
            "_source": ["event_id"],
        }}},
    }}}
    assert search(spark, sf_dir, "events", th, id_col="event_id").count() == 0
    bad = {"aggs": {"t": {
        "terms": {"field": "event_type", "order": {"avg_v": "desc"}},
        "aggs": {"u": {"terms": {"field": "user_id"}}},
    }}}
    with pytest.raises(DSLError, match="order by"):
        search(spark, sf_dir, "events", bad, id_col="event_id")


def test_composite_desc_cursor_pushes_to_scan(spark, sf_dir):
    """The desc after-cursor compiles to a scan-pushed OR-of-AND
    predicate (PushedFilters), not a post-scan filter only."""
    body = {"aggs": {"p": {"composite": {
        "sources": [
            {"et": {"terms": {"field": "event_type", "order": "desc"}}},
            {"u": {"terms": {"field": "user_id"}}},
        ],
        "after": {"et": "signup", "u": 3},
    }}}}
    plan = explain_plan(search(spark, sf_dir, "events", body,
                               id_col="event_id"))
    assert "PushedFilters: [Or(LessThan(event_type,signup)" in plan, (
        "desc cursor predicate not pushed to the parquet scan"
    )


def test_wrapper_query_decodes_and_recurses(spark, sf_dir):
    import base64
    import json

    inner = {"term": {"event_type": "click"}}
    b64 = base64.b64encode(json.dumps(inner).encode()).decode()
    df = search(spark, sf_dir, "events",
                {"query": {"wrapper": {"query": b64}}, "size": 5},
                id_col="event_id")
    assert all(r["event_type"] == "click" for r in df.collect())
    with pytest.raises(DSLError, match="does not decode"):
        compile_query({"wrapper": {"query": "!!!not-base64-json"}})


def test_fuzzy_is_case_sensitive_with_auto_fuzziness(spark):
    """ES `fuzzy` is a TERM-LEVEL query: case-sensitive, unanalyzed,
    default fuzziness AUTO (0 edits for len 0-2, 1 for 3-5, 2 for
    >= 6) — short terms must not over-match at distance 2."""
    df = spark.createDataFrame(
        [("ab",), ("xy",), ("click",), ("clack",), ("clik",),
         ("CLICK",), ("clucks",)],
        "w string",
    )

    def hits(q):
        return {r["w"] for r in df.filter(compile_query(q)).collect()}

    # AUTO on a 2-char term = 0 edits: exact only
    assert hits({"fuzzy": {"w": "ab"}}) == {"ab"}
    # AUTO on a 5-char term = 1 edit (clucks is 2 edits — excluded)
    assert hits({"fuzzy": {"w": "click"}}) == {"click", "clik", "clack"}
    # case-SENSITIVE: 'CLICK' is 5 edits from 'click', never a match
    assert "CLICK" not in hits({"fuzzy": {"w": {"value": "click", "fuzziness": 2}}})
    # explicit fuzziness still honored
    assert hits({"fuzzy": {"w": {"value": "click", "fuzziness": 2}}}) == {
        "click", "clik", "clack", "clucks"
    }
    with pytest.raises(DSLError, match="bad fuzziness"):
        compile_query({"fuzzy": {"w": {"value": "click", "fuzziness": "MAX"}}})
    # round-8 ADVICE: ES accepts string-encoded integers and
    # AUTO:low,high as well as AUTO / bare ints — verbatim-ported
    # request bodies must keep working
    assert hits({"fuzzy": {"w": {"value": "click", "fuzziness": "2"}}}) == {
        "click", "clik", "clack", "clucks"
    }
    assert hits({"fuzzy": {"w": {"value": "click", "fuzziness": "1"}}}) == {
        "click", "clik", "clack"
    }
    # AUTO:6,9 on a 5-char term = 0 edits (below low); lowercase
    # 'auto' accepted like ES
    assert hits({"fuzzy": {"w": {"value": "click", "fuzziness": "AUTO:6,9"}}}) == {
        "click"
    }
    assert hits({"fuzzy": {"w": {"value": "click", "fuzziness": "auto"}}}) == {
        "click", "clik", "clack"
    }
    with pytest.raises(DSLError, match="bad fuzziness"):
        compile_query({"fuzzy": {"w": {"value": "click", "fuzziness": "AUTO:2"}}})


def test_bucket_labels_and_agg_names_are_injection_safe(spark):
    """filters/range aggs build a stack() SQL string: bucket labels
    with quotes must be escaped (data, not SQL), and agg / metric
    alias names that are not identifiers must raise instead of
    breaking the generated expression."""
    from postgres_opensearch_cdc_spark.dsl import search_frame

    df = spark.createDataFrame(
        [("click", 10.0), ("view", 20.0)], "event_type string, value double"
    )
    body = {"aggs": {"by_kind": {
        "filters": {"filters": {
            "o'brien's, bucket": {"term": {"event_type": "click"}},
            "plain": {"term": {"event_type": "view"}},
        }},
        "aggs": {"v_sum": {"sum": {"field": "value"}}},
    }}}
    rows = {r["by_kind"]: r for r in search_frame(df, body).collect()}
    assert rows["o'brien's, bucket"]["doc_count"] == 1
    assert rows["o'brien's, bucket"]["v_sum"] == 10.0
    assert rows["plain"]["v_sum"] == 20.0
    # non-identifier metric alias → loud error, not broken SQL
    bad_metric = {"aggs": {"by_kind": {
        "filters": {"filters": {"a": {"term": {"event_type": "click"}}}},
        "aggs": {"v sum, x": {"sum": {"field": "value"}}},
    }}}
    with pytest.raises(DSLError, match="not a valid identifier"):
        search_frame(df, bad_metric).collect()
    # non-identifier outer agg name (becomes a column) → same error
    bad_name = {"aggs": {"by kind'": {
        "filters": {"filters": {"a": {"term": {"event_type": "click"}}}},
    }}}
    with pytest.raises(DSLError, match="not a valid identifier"):
        search_frame(df, bad_name).collect()
    # range agg shares the stack() builder — quoted label path works
    rng = {"aggs": {"vr": {
        "range": {"field": "value", "ranges": [{"from": 0, "to": 15}]},
        "aggs": {"v_max": {"max": {"field": "value"}}},
    }}}
    out = search_frame(df, rng).collect()
    assert len(out) == 1 and out[0]["doc_count"] == 1 and out[0]["v_max"] == 10.0


# ---------------------------------------------------------------------------
# strict top-level body validation + from/size + highlight/suggest (r10)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("key", [
    "min_score", "rescore", "collapse", "frm", "explain", "FROM",
])
def test_unknown_top_level_body_key_raises(spark, sf_dir, key):
    """A pasted reference body with a clause we don't serve must raise,
    never degrade silently (returning page 1 for a typoed paging key
    would be a wrong answer, not a fallback)."""
    with pytest.raises(DSLError, match="unknown top-level body keys"):
        search(spark, sf_dir, "documents", {key: 1, "size": 3})


def test_from_size_page_walk_disjoint_exhaustive(spark, sf_dir):
    """Offset paging partitions the sorted result: walking pages of 97
    via from/size yields disjoint pages whose union is exactly the
    unpaged result, in order."""
    base = {"sort": [{"doc_id": {"order": "asc"}}],
            "_source": ["doc_id"]}
    want = [r["doc_id"]
            for r in search(spark, sf_dir, "documents", base).collect()]
    got: list = []
    frm, size = 0, 97
    while True:
        page = [r["doc_id"] for r in search(
            spark, sf_dir, "documents",
            {**base, "from": frm, "size": size}).collect()]
        if not page:
            break
        assert len(set(page)) == len(page)
        assert not set(page) & set(got), "pages overlap"
        got.extend(page)
        frm += size
        assert len(page) == size or frm >= len(want)
    assert got == want


def test_from_rejects_search_after_and_negative(spark, sf_dir):
    body = {"sort": [{"doc_id": {"order": "asc"}}], "size": 5}
    with pytest.raises(DSLError, match="must be 0 when 'search_after'"):
        search(spark, sf_dir, "documents",
               {**body, "from": 10, "search_after": [100]}).collect()
    with pytest.raises(DSLError, match="must be >= 0"):
        search(spark, sf_dir, "documents", {**body, "from": -1})
    # from=0 + search_after is the ES-legal degenerate form
    out = search(spark, sf_dir, "documents",
                 {**body, "from": 0, "search_after": [100]})
    assert [r["doc_id"] for r in out.collect()][0] > 100


def test_from_applies_to_hits_not_aggs(spark, sf_dir):
    with pytest.raises(DSLError, match="applies to hits"):
        search(spark, sf_dir, "events",
               {"from": 5, "aggs": {"n": {"sum": {"field": "value"}}}},
               id_col="event_id")
    with pytest.raises(DSLError, match="applies to hits"):
        search(spark, sf_dir, "documents", {
            "highlight": {"fields": {"text": {}}},
            "query": {"match": {"text": "spark"}},
            "aggs": {"n": {"value_count": {"field": "doc_id"}}},
        })


def test_aggregations_alias_and_double_spelling(spark, sf_dir):
    body_aggs = {"aggs": {"by_type": {
        "terms": {"field": "event_type", "size": 3}}}}
    body_alias = {"aggregations": body_aggs["aggs"]}
    a = search(spark, sf_dir, "events", body_aggs, id_col="event_id").collect()
    b = search(spark, sf_dir, "events", body_alias, id_col="event_id").collect()
    assert a == b
    with pytest.raises(DSLError, match="both 'aggs' and 'aggregations'"):
        search(spark, sf_dir, "events", {**body_aggs, **body_alias},
               id_col="event_id")


def test_knn_from_pages_within_k(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings")
    q = [float(x) for x in vecs.filter("vec_id = 0").head()["embedding"]]
    full = search(spark, sf_dir, "embeddings",
                  {"knn": {"embedding": {"query_vector": q, "k": 10}}},
                  id_col="vec_id").collect()
    page2 = search(spark, sf_dir, "embeddings",
                   {"knn": {"embedding": {"query_vector": q, "k": 10}},
                    "from": 5, "size": 3},
                   id_col="vec_id").collect()
    assert [r["vec_id"] for r in page2] == [r["vec_id"] for r in full[5:8]]
    with pytest.raises(DSLError, match="knn cannot be combined"):
        search(spark, sf_dir, "embeddings",
               {"knn": {"embedding": {"query_vector": q, "k": 3}},
                "highlight": {"fields": {"text": {}}}}, id_col="vec_id")


def test_highlight_fragment_next_to_source(spark, sf_dir):
    body = {
        "query": {"match": {"text": "spark"}},
        "highlight": {"fields": {"text": {}}},
        "sort": [{"doc_id": "asc"}],
        "_source": ["doc_id"],
        "size": 5,
    }
    out = search(spark, sf_dir, "documents", body)
    assert out.columns == ["doc_id", "highlight_text"]
    rows = out.collect()
    assert rows and all("spark" in r["highlight_text"].lower() for r in rows)
    # fragment is bounded: at most 3 tokens either side of the match
    for r in rows:
        toks = r["highlight_text"].split()
        hit = next(i for i, t in enumerate(toks) if "spark" in t.lower())
        assert hit <= 3 and (len(toks) - 1 - hit) <= 3


def test_highlight_requires_query_terms_on_field(spark, sf_dir):
    with pytest.raises(DSLError, match="no positive"):
        search(spark, sf_dir, "documents", {
            "query": {"range": {"n_chars": {"gte": 10}}},
            "highlight": {"fields": {"text": {}}},
        })
    with pytest.raises(DSLError, match="needs a 'fields' object"):
        search(spark, sf_dir, "documents", {
            "query": {"match": {"text": "spark"}}, "highlight": {},
        })
    # must_not terms are never highlighted
    with pytest.raises(DSLError, match="no positive"):
        search(spark, sf_dir, "documents", {
            "query": {"bool": {"must_not": [{"match": {"text": "spark"}}]}},
            "highlight": {"fields": {"text": {}}},
        })


def test_suggest_contract(spark, sf_dir):
    body = {"suggest": {"fix": {
        "text": "smat", "term": {"field": "text", "size": 8}}}}
    out = search(spark, sf_dir, "documents", body)
    rows = out.collect()
    assert out.columns == ["term", "doc_freq", "distance"]
    assert rows and all(1 <= r["distance"] <= 2 for r in rows)
    assert all(r["term"].startswith("s") for r in rows)  # prefix_length=1
    # ranked by similarity first, then doc_freq desc
    ranks = [(r["distance"], -r["doc_freq"], r["term"]) for r in rows]
    assert ranks == sorted(ranks)
    # suggest is its own response frame: mixing with hits clauses raises
    with pytest.raises(DSLError, match="suggest cannot be combined"):
        search(spark, sf_dir, "documents",
               {**body, "query": {"match_all": {}}})
    with pytest.raises(DSLError, match="only 'term' is supported"):
        search(spark, sf_dir, "documents",
               {"suggest": {"fix": {"text": "smat",
                                    "phrase": {"field": "text"}}}})
    with pytest.raises(DSLError, match="exactly one named suggester"):
        search(spark, sf_dir, "documents", {"suggest": {}})
    # top-level 'size' sizes HITS, which a suggest-only body doesn't
    # return — honoring it silently as the suggestion limit would
    # shadow term.size, so it raises (no-silent-degradation contract)
    with pytest.raises(DSLError, match="use term.size"):
        search(spark, sf_dir, "documents", {**body, "size": 3})


def test_track_total_hits_is_lossless_noop(spark, sf_dir):
    body = {"sort": [{"doc_id": "asc"}], "size": 4, "_source": ["doc_id"]}
    a = search(spark, sf_dir, "documents", body).collect()
    b = search(spark, sf_dir, "documents",
               {**body, "track_total_hits": True}).collect()
    assert a == b
