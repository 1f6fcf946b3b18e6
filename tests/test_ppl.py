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
