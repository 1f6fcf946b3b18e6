"""Semantics tests for the query-DSL long tail (queries/querydsl.py):
pagination disjointness, after-key exclusivity, fuzzy expansion, and
pushdown evidence. Value-parity vs DuckDB is covered by the driver gate
and tools/check_parity.py; these pin the DSL semantics themselves."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries import querydsl
from postgres_opensearch_cdc_spark.registry import load_table


def test_search_after_pages_are_disjoint_and_ordered(spark, sf_dir):
    page1 = querydsl.search_after_page(spark, sf_dir).collect()
    assert len(page1) == 100
    keys = [(r.user_id, r.event_id) for r in page1]
    assert keys == sorted(keys), "page not in sort order"
    # every key strictly after the cursor
    cu, ce = querydsl.SEARCH_AFTER
    assert all(k > (cu, ce) for k in keys)
    # paging again from the last key of page 1 yields a disjoint page
    last_u, last_e = keys[-1]
    ev = load_table(spark, sf_dir, "events")
    page2 = (
        ev.filter(
            (F.col("user_id") > last_u)
            | ((F.col("user_id") == last_u) & (F.col("event_id") > last_e))
        )
        .select("user_id", "event_id")
        .orderBy("user_id", "event_id")
        .limit(100)
        .collect()
    )
    assert not (set(keys) & {(r.user_id, r.event_id) for r in page2})


def test_search_after_filter_pushed_to_scan(spark, sf_dir):
    plan = querydsl.search_after_page(spark, sf_dir)._jdf.queryExecution().toString()
    assert "PushedFilters" in plan and "user_id" in plan


def test_composite_after_key_is_exclusive(spark, sf_dir):
    rows = querydsl.composite_agg_page(spark, sf_dir).collect()
    assert 0 < len(rows) <= querydsl.COMPOSITE_PAGE
    after_t, after_d = querydsl.COMPOSITE_AFTER
    for r in rows:
        assert (r.event_type, r.day) > (after_t, after_d)


def test_fuzzy_expands_to_edit_distance_neighbors(spark, sf_dir):
    # 'tble' is distance 1 from 'table'; docs containing 'table' match
    matched = querydsl.q02g_fuzzy_match(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    with_table = docs.filter(F.col("text").rlike(r"\btable\b")).select("doc_id")
    missing = with_table.join(matched, "doc_id", "left_anti").count()
    assert missing == 0


def test_top_hits_bounded_per_bucket(spark, sf_dir):
    rows = querydsl.top_hits_per_bucket(spark, sf_dir).collect()
    per_bucket: dict[str, list] = {}
    for r in rows:
        per_bucket.setdefault(r.event_type, []).append(r)
    assert set(per_bucket) == {"click", "error", "purchase", "signup", "view"}
    for hits in per_bucket.values():
        assert [h.rn for h in hits] == [1, 2, 3]
        vals = [h.value for h in hits]
        assert vals == sorted(vals, reverse=True)


def test_keyset_pagination_covers_every_row_exactly_once(spark, sf_dir):
    """Walking search_after pages to exhaustion yields the full sorted
    event set with no duplicates and no gaps — the invariant OpenSearch
    documents for search_after."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id")
    expected = ev.count()
    page_size, cursor, seen = 997, (-1, -1), 0
    while True:
        cu, ce = cursor
        page = (
            ev.filter(
                (F.col("user_id") > cu)
                | ((F.col("user_id") == cu) & (F.col("event_id") > ce))
            )
            .orderBy("user_id", "event_id")
            .limit(page_size)
            .collect()
        )
        if not page:
            break
        keys = [(r.user_id, r.event_id) for r in page]
        assert keys == sorted(keys) and keys[0] > cursor
        seen += len(keys)
        cursor = keys[-1]
    assert seen == expected


def test_collapse_returns_one_doc_per_source(spark, sf_dir):
    rows = querydsl.collapse_by_source(spark, sf_dir).collect()
    sources = [r.source for r in rows]
    assert len(sources) == len(set(sources))
    docs = load_table(spark, sf_dir, "documents")
    assert len(sources) == docs.select("source").distinct().count()
    # representative really is the per-source max n_chars
    max_chars = {
        r.source: r.mx
        for r in docs.groupBy("source").agg(F.max("n_chars").alias("mx")).collect()
    }
    for r in rows:
        assert r.n_chars == max_chars[r.source]


def test_dis_max_leq_sum_and_geq_max(spark, sf_dir):
    """tie_breaker=0.3 keeps dis_max between best-field and sum."""
    dm = {r.doc_id: r.dm_score for r in querydsl.dis_max_best_fields(spark, sf_dir).collect()}
    mm = {r.doc_id: r.mm_score for r in querydsl.q02h_multi_match(spark, sf_dir).collect()}
    common = set(dm) & set(mm)
    assert common
    for d in common:
        assert dm[d] <= mm[d] + 1e-9  # sum (most_fields) is the ceiling


def test_highlight_fragment_contains_match(spark, sf_dir):
    rows = querydsl.highlight_fragment(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert "vector" in r.fragment
        assert len(r.fragment.split()) <= 7  # ±3 tokens around the match


def test_nested_query_differs_from_flat_and(spark, sf_dir):
    """The reason `nested` exists: a flat field-level AND (order has
    some item with qty>=45 AND some item with disc>=0.08, possibly
    different items) matches a strict superset of the same-element
    query."""
    nested_ids = {
        r.orderkey for r in querydsl.nested_query_same_element(spark, sf_dir).collect()
    }
    li = load_table(spark, sf_dir, "lineitem")
    flat = (
        li.groupBy("l_orderkey")
        .agg(
            F.max((F.col("l_quantity") >= 45).cast("int")).alias("has_qty"),
            F.max((F.col("l_discount") >= 0.08).cast("int")).alias("has_disc"),
        )
        .filter((F.col("has_qty") == 1) & (F.col("has_disc") == 1))
    )
    flat_ids = {r.l_orderkey for r in flat.collect()}
    assert nested_ids <= flat_ids
    assert len(nested_ids) < len(flat_ids), (
        "fixture too weak: flat AND equals nested on this data"
    )


def test_retrieval_entries_invariants(spark, sf_dir):
    # more_like_this never returns the like-document itself
    mlt = querydsl.more_like_this(spark, sf_dir).collect()
    assert mlt and all(r.doc_id != 0 for r in mlt)
    # rescore output is drawn from the s1>0 retrieval window and the
    # rescored score never decreases (additive boost)
    rs = querydsl.rescore_two_phase(spark, sf_dir).collect()
    assert rs and all(r.rescored >= r.s1 > 0 for r in rs)
    # filtered ANN results all satisfy the metadata predicate
    from postgres_opensearch_cdc_spark.queries.extensions import ann_filtered_topk

    ids = [r.vec_id for r in ann_filtered_topk(spark, sf_dir).collect()]
    emb = load_table(spark, sf_dir, "embeddings")
    labels = emb.filter(F.col("vec_id").isin(ids)).select("label").distinct().collect()
    assert [r.label for r in labels] == [3]


def test_pipeline_agg_cumsum_is_consistent(spark, sf_dir):
    rows = querydsl.pipeline_agg_cumsum(spark, sf_dir).collect()
    assert rows[0].derivative is None  # no previous bucket
    running = 0.0
    for r in rows:
        running += r.sum_value
        assert abs(r.cumulative_sum - round(running, 4)) < 1e-6


def test_nested_agg_matches_flat_formulation(spark, sf_dir):
    """The nested-scope aggregation over collect_list docs must equal
    the flat join+conditional-agg it models."""
    out = {r["o_orderpriority"]: r for r in querydsl.nested_agg_items(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    flat = {
        r["o_orderpriority"]: r
        for r in orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("o_orderpriority")
        .agg(
            F.sum((F.col("l_returnflag") == "R").cast("long")).alias("item_count"),
            F.countDistinct(
                F.when(F.col("l_returnflag") == "R", F.col("o_orderkey"))
            ).alias("parent_count"),
        )
        .collect()
    }
    assert set(out) == set(flat)
    for k in out:
        assert out[k]["item_count"] == flat[k]["item_count"]
        assert out[k]["parent_count"] == flat[k]["parent_count"]
        # reverse_nested invariant: parents <= items matched
        assert out[k]["parent_count"] <= out[k]["item_count"]
