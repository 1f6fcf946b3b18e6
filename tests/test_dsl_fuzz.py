"""Property-based cross-check of the DSL query compiler: SEEDED random
bool trees (term/terms/range/exists/prefix/wildcard leaves, nested
must/should/must_not + minimum_should_match) executed by the Spark
compiler AND by independently generated SQL — 40 deterministic cases.
Pins the boolean semantics (msm counting, must_not of nested bools)
against an independent evaluator."""

from __future__ import annotations

import random

import duckdb
import pytest

from postgres_opensearch_cdc_spark.dsl import search

STR_VALUES = ["click", "view", "purchase", "error", "signup"]


def _leaf(rng: random.Random) -> tuple[dict, str]:
    kind = rng.choice(["term", "terms", "range", "exists", "prefix",
                       "wildcard", "fuzzy"])
    if kind == "fuzzy":
        v = rng.choice(["clack", "vie", "purchse", "eror"])
        n = rng.randint(1, 2)
        return (
            {"fuzzy": {"event_type": {"value": v, "fuzziness": n}}},
            f"levenshtein(event_type, '{v}') <= {n}",
        )
    if kind == "term":
        v = rng.choice(STR_VALUES)
        return {"term": {"event_type": v}}, f"event_type = '{v}'"
    if kind == "terms":
        vs = rng.sample(STR_VALUES, rng.randint(1, 3))
        inlist = ", ".join(f"'{v}'" for v in vs)
        return {"terms": {"event_type": vs}}, f"event_type IN ({inlist})"
    if kind == "range":
        f = rng.choice(["value", "user_id"])
        lo = rng.randint(0, 60)
        hi = lo + rng.randint(10, 60)
        body, sqls = {}, []
        if rng.random() < 0.8:
            body["gte"] = lo
            sqls.append(f"{f} >= {lo}")
        if rng.random() < 0.8 or not body:
            body["lt"] = hi
            sqls.append(f"{f} < {hi}")
        return {"range": {f: body}}, "(" + " AND ".join(sqls) + ")"
    if kind == "exists":
        return {"exists": {"field": "value"}}, "value IS NOT NULL"
    if kind == "prefix":
        p = rng.choice(["cl", "vi", "pu", "er", "si"])
        return {"prefix": {"event_type": p}}, f"event_type LIKE '{p}%'"
    # wildcard
    mid = rng.choice(["ic", "ie", "rch", "rro"])
    return (
        {"wildcard": {"event_type": f"*{mid}*"}},
        f"event_type LIKE '%{mid}%'",
    )


def _bool(rng: random.Random, depth: int) -> tuple[dict, str]:
    if depth == 0 or rng.random() < 0.4:
        return _leaf(rng)
    body: dict = {}
    sql_parts = []
    if rng.random() < 0.8:
        subs = [_bool(rng, depth - 1) for _ in range(rng.randint(1, 2))]
        body["must"] = [q for q, _ in subs]
        sql_parts.extend(f"({s})" for _, s in subs)
    if rng.random() < 0.5:
        subs = [_bool(rng, depth - 1) for _ in range(rng.randint(1, 2))]
        body["must_not"] = [q for q, _ in subs]
        sql_parts.extend(f"(NOT ({s}))" for _, s in subs)
    if rng.random() < 0.6:
        n = rng.randint(2, 3)
        subs = [_bool(rng, depth - 1) for _ in range(n)]
        msm = rng.randint(1, n)
        body["should"] = [q for q, _ in subs]
        body["minimum_should_match"] = msm
        hits = " + ".join(f"(CASE WHEN {s} THEN 1 ELSE 0 END)" for _, s in subs)
        sql_parts.append(f"({hits}) >= {msm}")
    if not body:
        return _leaf(rng)
    return {"bool": body}, " AND ".join(sql_parts)


@pytest.mark.parametrize("seed", range(40))
def test_random_bool_tree_matches_sql(spark, sf_dir, seed):
    rng = random.Random(1000 + seed)
    query, sql_where = _bool(rng, 2)
    body = {"query": query, "_source": ["event_id"],
            "sort": [{"event_id": "asc"}]}
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
    assert got == want, f"divergence for seed {seed}: {query!r}"


@pytest.mark.parametrize("seed", range(20))
def test_body_key_combinations_never_silently_degrade(spark, sf_dir, seed):
    """Fuzz the TOP-LEVEL body contract (r10 strict validation): a
    seeded random combination of known hit-path keys plus occasional
    unknown/conflicting ones must either raise DSLError or return a
    frame consistent with the documented composition — never silently
    drop a clause. The returned-page oracle re-derives the expected
    ids from the unpaged sorted run."""
    rng = random.Random(7000 + seed)
    body: dict = {"sort": [{"doc_id": {"order": "asc"}}],
                  "_source": ["doc_id"]}
    if rng.random() < 0.6:
        lo = rng.randint(50, 400)
        body["query"] = {"range": {"n_chars": {"gte": lo}}}
    size = rng.choice([None, 7, 31])
    if size is not None:
        body["size"] = size
    frm = rng.choice([0, 0, 5, 23])
    if frm:
        body["from"] = frm
    if rng.random() < 0.3:
        body["track_total_hits"] = rng.choice([True, False])
    expect_error = None
    if rng.random() < 0.25:
        body[rng.choice(["rescore", "min_score", "collapse"])] = 1
        expect_error = "unknown top-level body keys"
    elif rng.random() < 0.2 and frm:
        body["search_after"] = [0]
        expect_error = "must be 0 when 'search_after'"

    from postgres_opensearch_cdc_spark.dsl import DSLError

    if expect_error:
        with pytest.raises(DSLError, match=expect_error):
            search(spark, sf_dir, "documents", body)
        return
    got = [r["doc_id"] for r in
           search(spark, sf_dir, "documents", body).collect()]
    unpaged = dict(body)
    unpaged.pop("from", None)
    unpaged.pop("size", None)
    unpaged.pop("track_total_hits", None)
    full = [r["doc_id"] for r in
            search(spark, sf_dir, "documents", unpaged).collect()]
    want = full[frm:(frm + size) if size is not None else None]
    assert got == want, f"body {body}: page mismatch"
