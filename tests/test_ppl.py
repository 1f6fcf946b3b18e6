"""PPL compiler: stage semantics, plan shape, and error handling —
the parity gate checks the five pipeline ENTRIES end-to-end; these
tests pin the compiler's behavior per stage."""

from __future__ import annotations

import pytest

from postgres_opensearch_cdc_spark.ppl import PPLSyntaxError, ppl
from postgres_opensearch_cdc_spark.registry import load_table
from postgres_opensearch_cdc_spark.testing import explain_plan


def test_where_pushes_to_scan(spark, sf_dir):
    df = ppl(spark, sf_dir, "source=events | where value > 400")
    plan = explain_plan(df)
    assert "GreaterThan(value,400" in plan, "filter not pushed to parquet"


def test_sort_head_is_top_k(spark, sf_dir):
    df = ppl(spark, sf_dir, "source=orders | sort -o_totalprice | head 5")
    assert "TakeOrderedAndProject" in explain_plan(df)
    prices = [r["o_totalprice"] for r in df.collect()]
    assert prices == sorted(prices, reverse=True) and len(prices) == 5


def test_where_or_precedence(spark, sf_dir):
    """a and b or c parses as (a and b) or c."""
    df = ppl(
        spark,
        sf_dir,
        "source=events | where event_type = 'click' and value > 400 "
        "or event_type = 'error'",
    )
    for r in df.select("event_type", "value").collect():
        assert (r["event_type"] == "click" and r["value"] > 400) or r[
            "event_type"
        ] == "error"


def test_fields_minus_drops(spark, sf_dir):
    df = ppl(spark, sf_dir, "source=events | fields - props, value")
    assert set(df.columns) == {"event_id", "ts", "user_id", "event_type"}


def test_eval_whitelists_functions(spark, sf_dir):
    with pytest.raises(PPLSyntaxError, match="function not allowed"):
        ppl(spark, sf_dir, "source=events | eval x = reflect('a','b')")


def test_unknown_stage_raises(spark, sf_dir):
    with pytest.raises(PPLSyntaxError, match="unknown PPL stage"):
        ppl(spark, sf_dir, "source=events | frobnicate value")


def test_stats_dc_and_global(spark, sf_dir):
    row = ppl(
        spark, sf_dir, "source=events | stats dc(user_id) as users, count()"
    ).collect()[0]
    ev = load_table(spark, sf_dir, "events")
    assert row["users"] == ev.select("user_id").distinct().count()
    assert row["count"] == ev.count()


def test_top_matches_manual_count(spark, sf_dir):
    rows = ppl(spark, sf_dir, "source=events | top 2 event_type").collect()
    assert len(rows) == 2
    assert rows[0]["count"] >= rows[1]["count"]


def test_parse_extracts_named_groups(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=events | parse props '\"k\": (?<kval>[0-9]+)' "
        "| fields event_id, kval | head 5",
    )
    rows = df.collect()
    assert rows and all(r["kval"].isdigit() for r in rows)


def test_parse_requires_named_group(spark, sf_dir):
    with pytest.raises(PPLSyntaxError, match="named group"):
        ppl(spark, sf_dir, "source=events | parse props '([0-9]+)'")


def test_in_like_not_push_to_scan(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=part | where p_size in (5, 10) and like(p_type, 'P%') "
        "and not p_brand = 'Brand#5'",
    )
    plan = explain_plan(df)
    assert "In(p_size" in plan, "IN filter not pushed to parquet"
    assert "StringStartsWith(p_type,P)" in plan, "LIKE prefix not pushed"
    rows = df.collect()
    assert all(
        r["p_size"] in (5, 10)
        and r["p_type"].startswith("P")
        and r["p_brand"] != "Brand#5"
        for r in rows
    )


def test_eventstats_keeps_rows(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=events | eventstats count() as type_total by event_type",
    )
    base = load_table(spark, sf_dir, "events")
    assert df.count() == base.count(), "eventstats must not collapse rows"
    manual = {
        r["event_type"]: r["n"]
        for r in base.groupBy("event_type").count().withColumnRenamed("count", "n").collect()
    }
    for r in df.select("event_type", "type_total").distinct().collect():
        assert r["type_total"] == manual[r["event_type"]]


def test_fillnull_coalesces(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=events | eval v = value | fillnull with 0.0 in v",
    )
    assert df.filter("v IS NULL").count() == 0


def test_trendline_requires_sort(spark, sf_dir):
    with pytest.raises(PPLSyntaxError, match="sort"):
        ppl(spark, sf_dir, "source=events | trendline sma(3, value)")


def test_trendline_sma_values(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=nation | sort +n_nationkey | trendline sma(3, n_nationkey) as s",
    )
    rows = df.orderBy("n_nationkey").collect()
    keys = [r["n_nationkey"] for r in rows]
    for i, r in enumerate(rows):
        if i < 2:
            assert r["s"] is None, "sma emitted before 3 points seen"
        else:
            expect = sum(keys[i - 2 : i + 1]) / 3.0
            assert abs(r["s"] - expect) < 1e-12


def test_join_and_lookup_broadcasts(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=customer | lookup nation n_nationkey as c_nationkey",
    )
    assert "BroadcastHashJoin" in explain_plan(df), "lookup must broadcast"
    base = load_table(spark, sf_dir, "customer")
    assert df.count() == base.count(), "lookup must be left-preserving"
    joined = ppl(
        spark,
        sf_dir,
        "source=orders | rename o_custkey as c_custkey "
        "| join on c_custkey customer",
    )
    assert "c_mktsegment" in joined.columns


def test_grok_expands_patterns(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=events | grok props '\"k\": %{INT:kv}'",
    )
    rows = df.select("props", "kv").collect()
    import re as _re

    for r in rows:
        m = _re.search(r'"k": ([+-]?\d+)', r["props"])
        assert r["kv"] == (m.group(1) if m else "")


def test_grok_unknown_pattern_raises(spark, sf_dir):
    with pytest.raises(PPLSyntaxError, match="unknown grok pattern"):
        ppl(spark, sf_dir, "source=events | grok props '%{NOPE:x}'")


def test_patterns_masks_alphanumerics(spark, sf_dir):
    df = ppl(spark, sf_dir, "source=events | patterns props as tpl")
    r = df.select("tpl").first()
    assert r["tpl"] == '{"": }'


def test_eval_string_functions(spark, sf_dir):
    df = ppl(
        spark,
        sf_dir,
        "source=nation | eval tag = concat(trim(n_name), '-', 'x') "
        "| eval flag = if(n_regionkey >= 2, 'hi', 'lo') | head 3",
    )
    rows = df.collect()
    for r in rows:
        assert r["tag"] == f"{r['n_name'].strip()}-x"
        assert r["flag"] == ("hi" if r["n_regionkey"] >= 2 else "lo")


def test_eval_still_blocks_unknown_functions(spark, sf_dir):
    with pytest.raises(PPLSyntaxError, match="not allowed"):
        ppl(spark, sf_dir, "source=nation | eval x = reflect('a', 'b')")


def test_grok_snake_case_names(spark, sf_dir):
    """Standard grok style uses snake_case names (%{INT:k_val}) — the
    Java pattern is handed plain groups so underscores work."""
    df = ppl(spark, sf_dir, "source=events | grok props '\"k\": %{INT:k_val}'")
    r = df.select("props", "k_val").first()
    import re as _re

    m = _re.search(r'"k": ([+-]?\d+)', r["props"])
    assert r["k_val"] == m.group(1)


def test_global_eventstats_has_no_single_partition_window(spark, sf_dir):
    df = ppl(spark, sf_dir, "source=events | eventstats count() as total")
    plan = explain_plan(df)
    assert "Window" not in plan, "global eventstats must not use a window"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    base = load_table(spark, sf_dir, "events")
    rows = df.select("total").distinct().collect()
    assert len(rows) == 1 and rows[0]["total"] == base.count()


def test_span_unit_is_case_sensitive(spark, sf_dir):
    """PPL convention: m=minute, M=month. 1M must be a MONTH bucket."""
    monthly = ppl(
        spark, sf_dir,
        "source=events | stats count() as n by span(ts, 1M) as b | sort +b",
    ).collect()
    assert len(monthly) <= 2, "1M parsed as minutes, not months"
    with pytest.raises(PPLSyntaxError, match="1M"):
        ppl(spark, sf_dir, "source=events | stats count() by span(ts, 2M)")
    with pytest.raises(PPLSyntaxError, match=">= 1"):
        ppl(spark, sf_dir, "source=events | stats count() by span(ts, 0m)")


def test_week_spans_share_monday_boundaries(spark, sf_dir):
    """span(ts, 2w) buckets must align with span(ts, 1w)'s Monday
    boundaries (epoch's first Monday anchor), not the Thursday Unix
    origin."""
    w1 = {r["b"] for r in ppl(
        spark, sf_dir,
        "source=events | stats count() as n by span(ts, 1w) as b",
    ).collect()}
    w2 = {r["b"] for r in ppl(
        spark, sf_dir,
        "source=events | stats count() as n by span(ts, 2w) as b",
    ).collect()}
    for b in w1 | w2:
        assert b.weekday() == 0 and (b.hour, b.minute) == (0, 0), (
            f"{b} is not a Monday midnight — wrong week anchor"
        )


def test_global_eventstats_alias_replaces_column(spark, sf_dir):
    df = ppl(
        spark, sf_dir,
        "source=events | eventstats max(value) as value | where value > 10",
    )
    assert df.columns.count("value") == 1
    assert df.count() > 0  # max(value) > 10, all rows keep the replaced col


def test_span_floors_pre_anchor_timestamps(spark, tmp_path):
    """Timestamps BEFORE the span anchor must floor down into the
    earlier bucket (floor division), not truncate toward zero: the
    Unix epoch 1970-01-01..04 precedes the week anchor (Monday
    1970-01-05), so a 1w span must bucket it at Monday 1969-12-29."""
    import datetime

    d = str(tmp_path)
    frame = spark.createDataFrame(
        [
            (1, datetime.datetime(1970, 1, 2, 12, 0, 0), 1, "click", 1.0, "{}"),
            (2, datetime.datetime(1970, 1, 6, 0, 0, 0), 1, "click", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    # INT96 (the writer default) reads as nanos in the footer sniffer;
    # write plain micros like the driver testdata
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType",
                   "TIMESTAMP_MICROS")
    try:
        frame.write.parquet(f"{d}/events.parquet")
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    rows = ppl(
        spark, d,
        "source=events | stats count() as n by span(ts, 1w) as b | sort +b",
    ).collect()
    buckets = [r["b"] for r in rows]
    assert buckets[0] == datetime.datetime(1969, 12, 29), (
        f"pre-anchor ts truncated up to {buckets[0]} instead of flooring"
    )
    assert buckets[1] == datetime.datetime(1970, 1, 5)


def test_join_drops_colliding_right_columns(spark, sf_dir):
    """join/lookup keep only the ENRICHMENT columns: right-side names
    that already exist on the left would otherwise duplicate and make
    any later stage referencing them ambiguous."""
    df = ppl(
        spark, sf_dir,
        # both customer and nation have c_nationkey on the left after
        # the first lookup; a second lookup of the same table must not
        # duplicate the enrichment columns it already appended
        "source=customer | lookup nation n_nationkey as c_nationkey "
        "| lookup nation n_nationkey as c_nationkey "
        "| where n_nationkey >= 0",
    )
    assert df.columns.count("n_name") == 1
    assert df.count() > 0  # the where stage resolves unambiguously
    joined = ppl(
        spark, sf_dir,
        "source=orders | rename o_custkey as c_custkey "
        "| eval c_name = 'x' | join on c_custkey customer "
        "| where c_mktsegment != ''",
    )
    assert joined.columns.count("c_name") == 1
    assert joined.count() > 0


def test_where_parenthesized_grouping(spark, sf_dir):
    """(a or b) and c groups explicitly — parens override the default
    and-binds-tighter precedence; in-lists and like() keep their own
    parens intact."""
    df = ppl(
        spark, sf_dir,
        "source=events | where (event_type = 'click' or "
        "event_type = 'error') and value > 150",
    )
    rows = df.select("event_type", "value").collect()
    assert rows, "grouped where returned nothing"
    for r in rows:
        assert r["event_type"] in ("click", "error") and r["value"] > 150
    nested = ppl(
        spark, sf_dir,
        "source=part | where (p_size in (5, 10) or like(p_type, 'P%')) "
        "and not (p_brand = 'Brand#5' and p_size = 5)",
    )
    for r in nested.select("p_size", "p_type", "p_brand").collect():
        assert r["p_size"] in (5, 10) or r["p_type"].startswith("P")
        assert not (r["p_brand"] == "Brand#5" and r["p_size"] == 5)


def test_where_isnull_isnotnull(spark, sf_dir):
    base = load_table(spark, sf_dir, "events")
    n_null = base.filter("value IS NULL").count()
    got = ppl(spark, sf_dir, "source=events | where isnull(value)").count()
    assert got == n_null
    got_not = ppl(
        spark, sf_dir,
        "source=events | where isnotnull(value) and event_type = 'click'",
    ).count()
    assert got_not == base.filter(
        "value IS NOT NULL AND event_type = 'click'").count()


def test_ad_null_field_scores_zero_not_null(spark, sf_dir):
    """Rows whose detected field is NULL must get score 0.0 / anomaly 0
    (the documented 0/1 contract) — an un-coalesced NULL would make
    `where anomaly = 1` (and `= 0`) silently skip them."""
    frame = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 10.0), (3, "a", 10.0), (4, "a", 99.0),
         (5, "a", None), (6, "b", None)],
        "event_id long, event_type string, value double",
    )

    def resolver(name):
        assert name == "events"
        return frame

    out = {
        r["event_id"]: r
        for r in ppl(
            spark, sf_dir,
            "source=events | ad value threshold=1.5 by event_type",
            resolver=resolver,
        ).collect()
    }
    assert out[5]["score"] == 0.0 and out[5]["anomaly"] == 0
    assert out[6]["score"] == 0.0 and out[6]["anomaly"] == 0
    assert out[4]["anomaly"] == 1  # the real outlier still flags
    # global (no `by`) branch has the same contract
    out2 = {
        r["event_id"]: r
        for r in ppl(
            spark, sf_dir,
            "source=events | ad value threshold=1.5",
            resolver=resolver,
        ).collect()
    }
    assert out2[5]["anomaly"] == 0 and out2[5]["score"] == 0.0
    # anomaly is never NULL anywhere — `where anomaly = 0` keeps nulls
    n_zero = ppl(
        spark, sf_dir,
        "source=events | ad value threshold=1.5 by event_type "
        "| where anomaly = 0",
        resolver=resolver,
    ).count()
    assert n_zero == 5


def test_expand_fans_out_and_aliases(spark, sf_dir):
    """expand: one row per array element; `as alias` keeps the element
    column under the alias and drops the array."""
    frame = spark.createDataFrame(
        [(1, ["a", "b"]), (2, ["c"])], "id long, xs array<string>"
    )

    def resolver(name):
        return frame

    rows = ppl(spark, sf_dir, "source=t | expand xs | sort +id, +xs",
               resolver=resolver).collect()
    assert [(r["id"], r["xs"]) for r in rows] == [(1, "a"), (1, "b"), (2, "c")]
    out = ppl(spark, sf_dir, "source=t | expand xs as x", resolver=resolver)
    assert "x" in out.columns and "xs" not in out.columns
    with pytest.raises(PPLSyntaxError, match="expand needs"):
        ppl(spark, sf_dir, "source=t | expand ", resolver=resolver)


def test_fieldsummary_profile_counts(spark, sf_dir):
    """fieldsummary: count / distinct / min / max / nulls per field in
    one pass; min/max stringified."""
    frame = spark.createDataFrame(
        [(1, "a", 2.0), (2, "a", None), (3, None, 8.5)],
        "id long, s string, v double",
    )

    def resolver(name):
        return frame

    rows = {r["field"]: r for r in ppl(
        spark, sf_dir,
        "source=t | fieldsummary includefields=s, v | sort +field",
        resolver=resolver,
    ).collect()}
    assert rows["s"]["count"] == 2 and rows["s"]["distinct_count"] == 1
    assert rows["s"]["nulls"] == 1 and rows["s"]["min"] == "a"
    assert rows["v"]["count"] == 2 and rows["v"]["nulls"] == 1
    assert rows["v"]["min"] == "2.0" and rows["v"]["max"] == "8.5"
    with pytest.raises(PPLSyntaxError, match="fieldsummary needs"):
        ppl(spark, sf_dir, "source=t | fieldsummary s, v", resolver=resolver)
