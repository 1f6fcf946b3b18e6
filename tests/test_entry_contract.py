"""Driver-contract invariants for __spark_entry__: key consistency
between queries() and oracle_sql(), no duplicate names across modules,
entry() produces rows with a stable schema."""

from __future__ import annotations

import __spark_entry__ as e


def test_oracle_keys_subset_of_queries():
    qs, oracles = e.queries(), e.oracle_sql()
    missing = set(oracles) - set(qs)
    assert not missing, f"oracle_sql keys without queries: {missing}"


def test_no_duplicate_query_names_across_modules():
    total = sum(len(m.QUERIES) for m in e._MODULES)
    assert total == len(e.queries()), "duplicate query name across modules"


def test_rows_only_queries_are_the_documented_ones():
    """Every query entry carries a value oracle (ann_ivf_topk gained a
    seed-centroid DuckDB oracle and approx_sketches a bounds oracle in
    round 3 — the set of rows-only entries is now empty and must stay
    that way)."""
    qs, oracles = e.queries(), e.oracle_sql()
    rows_only = set(qs) - set(oracles)
    assert rows_only == set(), f"unexpected rows-only queries: {rows_only}"


def test_entry_runs_and_returns_rows(spark):
    df = e.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {
        "user_id",
        "last_event_id",
        "last_event_type",
        "last_value",
    }
