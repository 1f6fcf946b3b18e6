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


def test_pipeline_agg_cumsum_is_consistent(spark, sf_dir):
    rows = querydsl.pipeline_agg_cumsum(spark, sf_dir).collect()
    assert rows[0].derivative is None  # no previous bucket
    running = 0.0
    for r in rows:
        running += r.sum_value
        assert abs(r.cumulative_sum - round(running, 4)) < 1e-6
