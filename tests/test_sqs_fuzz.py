"""Property-based cross-check of the simple_query_string parser +
compiler: SEEDED random expressions (terms, quoted phrases, trailing-*
prefixes, leading-minus negation, ( ) groups, mixed `+`/`|`/whitespace
separators) are RENDERED twice from the same generated structure — once
as the SQS string executed through parse → DSL compile → Spark, once as
DuckDB SQL applying the documented left-fold contract — and the result
sets must match. Pins the fold (per-separator operators, no hidden
precedence), the lenient leaf shapes, and the negation scope.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from postgres_opensearch_cdc_spark.dsl import search

WORDS = ["click", "view", "purchase", "error", "signup"]
PREFIXES = ["cl", "vi", "pu", "er", "si", "x"]


def _leaf(rng: random.Random) -> tuple[str, str]:
    """(sqs_clause_text, sql_pred) over the event_type column."""
    kind = rng.choice(["word", "word", "phrase", "prefix"])
    if kind == "word":
        w = rng.choice(WORDS)
        # match leaf: analyzed whole-token presence; event_type values
        # are single lowercase tokens, so token presence == equality
        return w, f"event_type = '{w}'"
    if kind == "phrase":
        w = rng.choice(WORDS)
        return f'"{w}"', f"regexp_matches(event_type, '\\b{w}\\b')"
    p = rng.choice(PREFIXES)
    return f"{p}*", f"event_type LIKE '{p}%'"


def _clause(rng: random.Random, depth: int) -> tuple[str, str]:
    r = rng.random()
    if r < 0.15:
        inner_t, inner_s = _clause(rng, depth)
        return f"-{inner_t}", f"(NOT ({inner_s}))"
    if r < 0.35 and depth > 0:
        inner_t, inner_s = _expr(rng, depth - 1)
        return f"({inner_t})", f"({inner_s})"
    return _leaf(rng)


def _expr(rng: random.Random, depth: int) -> tuple[str, str]:
    """Left fold with per-separator operators — the documented
    contract; whitespace separator uses default_operator=OR here."""
    t, s = _clause(rng, depth)
    for _ in range(rng.randint(0, 3)):
        sep = rng.choice(["+", "|", " "])
        ct, cs = _clause(rng, depth)
        if sep == "+":
            t = f"{t} + {ct}"
            s = f"(({s}) AND ({cs}))"
        elif sep == "|":
            t = f"{t} | {ct}"
            s = f"(({s}) OR ({cs}))"
        else:
            t = f"{t} {ct}"
            s = f"(({s}) OR ({cs}))"  # default_operator=OR
    return t, s


@pytest.mark.parametrize("seed", range(40))
def test_random_sqs_matches_sql(spark, sf_dir, seed):
    rng = random.Random(4000 + seed)
    text, sql_where = _expr(rng, 2)
    body = {
        "query": {"simple_query_string": {
            "query": text, "fields": ["event_type"],
        }},
        "_source": ["event_id"],
        "sort": [{"event_id": "asc"}],
        "size": 100000,
    }
    sdf = search(spark, sf_dir, "events", body, id_col="event_id")
    got = [r["event_id"] for r in sdf.collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    want = [
        r[0]
        for r in con.sql(
            f"SELECT event_id FROM events WHERE {sql_where} ORDER BY event_id"
        ).fetchall()
    ]
    assert got == want, f"divergence for seed {seed}: {text!r}"
