"""Property-based cross-check of the PPL compiler: SEEDED random
pipelines over the events table, executed by the Spark compiler AND by
independently generated DuckDB SQL — 40 deterministic cases per run.
Catches operator-precedence, null-handling, and aggregate-typing bugs
no fixed fixture would."""

from __future__ import annotations

import random

import duckdb
import pytest

from postgres_opensearch_cdc_spark.ppl import ppl

FIELDS = {
    "value": "num",
    "user_id": "int",
    "event_type": "str",
}
STR_VALUES = ["click", "view", "purchase", "error", "signup"]
CMP = ["=", "!=", ">", ">=", "<", "<="]
AGGS = [
    ("count()", "COUNT(*)"),
    ("sum(user_id)", "CAST(SUM(user_id) AS BIGINT)"),
    ("min(value)", "MIN(value)"),
    ("max(value)", "MAX(value)"),
    ("dc(event_type)", "COUNT(DISTINCT event_type)"),
    # dispersion aggregates (round 7): sample forms + exact
    # linear-interpolation percentile — both engines agree well below
    # the 6-decimal comparison on this data scale
    ("stddev(value)", "STDDEV_SAMP(value)"),
    ("var(user_id)", "VAR_SAMP(user_id)"),
    ("percentile(value, 75)", "QUANTILE_CONT(value, 0.75)"),
]


def _rand_cond(rng: random.Random) -> tuple[str, str]:
    """One comparison in (ppl, sql) form."""
    field = rng.choice(list(FIELDS))
    kind = FIELDS[field]
    if kind == "str":
        v = rng.choice(STR_VALUES)
        op = rng.choice(["=", "!="])
        return f"{field} {op} '{v}'", f"{field} {op} '{v}'"
    if kind == "int":
        v = rng.randint(0, 120)
    else:
        v = round(rng.uniform(0, 500), 1)
    op = rng.choice(CMP)
    sql_op = "<>" if op == "!=" else op
    return f"{field} {op} {v}", f"{field} {sql_op} {v}"


def _rand_where(rng: random.Random) -> tuple[str, str]:
    """and/or chain (2-3 comparisons) with PPL precedence (and > or)."""
    n = rng.randint(2, 3)
    parts = [_rand_cond(rng) for _ in range(n)]
    joiners = [rng.choice(["and", "or"]) for _ in range(n - 1)]
    ppl_txt, sql_txt = parts[0]
    for (p, s), j in zip(parts[1:], joiners):
        ppl_txt += f" {j} {p}"
        sql_txt += f" {j.upper()} {s}"
    # PPL/SQL share precedence (AND binds tighter), so the SQL is the
    # literal translation
    return ppl_txt, sql_txt


def _case(seed: int) -> tuple[str, str]:
    rng = random.Random(seed)
    ppl_q = "source=events"
    where_sql = ""
    if rng.random() < 0.8:
        w_ppl, w_sql = _rand_where(rng)
        ppl_q += f" | where {w_ppl}"
        where_sql = f"WHERE {w_sql}"
    n_aggs = rng.randint(1, 3)
    chosen = rng.sample(AGGS, n_aggs)
    agg_ppl = ", ".join(f"{a} as m{i}" for i, (a, _) in enumerate(chosen))
    agg_sql = ", ".join(f"{s} AS m{i}" for i, (_, s) in enumerate(chosen))
    by = rng.choice([None, "event_type", "user_id"])
    if by:
        ppl_q += f" | stats {agg_ppl} by {by} | sort +{by}"
        sql = (
            f"SELECT {by}, {agg_sql} FROM events {where_sql} "
            f"GROUP BY {by} ORDER BY {by}"
        )
    else:
        ppl_q += f" | stats {agg_ppl}"
        sql = f"SELECT {agg_sql} FROM events {where_sql}"
    head = rng.choice([None, 5, 50])
    if head and by:
        ppl_q += f" | head {head}"
        sql += f" LIMIT {head}"
    return ppl_q, sql


def _norm(rows):
    out = []
    for r in rows:
        vals = []
        for v in r:
            if isinstance(v, float):
                vals.append(f"{v:.6f}")
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


@pytest.mark.parametrize("seed", range(40))
def test_random_pipeline_matches_sql(spark, sf_dir, seed):
    ppl_q, sql = _case(seed)
    sdf = ppl(spark, sf_dir, ppl_q)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    rel = con.sql(sql)
    assert sorted(scols) == sorted(rel.columns), (ppl_q, sql)
    # align column order by name before comparing
    sidx = [scols.index(c) for c in sorted(scols)]
    didx = [list(rel.columns).index(c) for c in sorted(rel.columns)]
    drows = rel.fetchall()
    got = _norm([[r[i] for i in sidx] for r in srows])
    want = _norm([[r[i] for i in didx] for r in drows])
    assert got == want, f"divergence for: {ppl_q!r} vs {sql!r}"
