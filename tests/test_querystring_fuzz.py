"""Query-string fuzz: generate random boolean expression trees, render
each to (a) Lucene query-string text and (b) the expected DSL node
dict, and assert the parser reproduces the node exactly. Because the
node dict is the DSL compiler's input, node equality IS plan equality
with the JSON-body interface (pinned separately in
test_querystring.py); no Spark session needed here, so the fuzz runs
wide (200 trees)."""

from __future__ import annotations

import random

from postgres_opensearch_cdc_spark.querystring import parse_query_string

FIELDS = ["status", "card_type", "amount", "is_active", "v_1"]


def _leaf(rng: random.Random):
    f = rng.choice(FIELDS)
    kind = rng.randrange(7)
    if kind == 0:
        v = rng.choice(["ACTIVE", "DEBIT", "x9", "true", "17", "2.5"])
        coerced = {"true": True}.get(v, v)
        if v == "17":
            coerced = 17
        elif v == "2.5":
            coerced = 2.5
        return f"{f}:{v}", {"term": {f: coerced}}
    if kind == 1:
        op, key = rng.choice([(">", "gt"), (">=", "gte"), ("<", "lt"),
                              ("<=", "lte")])
        n = rng.randrange(1000)
        text = f"{f}:{op}{n}" if rng.random() < 0.5 else f"{f} {op} {n}"
        return text, {"range": {f: {key: n}}}
    if kind == 2:
        lo, hi = sorted(rng.sample(range(1000), 2))
        ob, ok = rng.choice([("[", "gte"), ("{", "gt")])
        cb, ck = rng.choice([("]", "lte"), ("}", "lt")])
        return (f"{f}:{ob}{lo} TO {hi}{cb}",
                {"range": {f: {ok: lo, ck: hi}}})
    if kind == 3:
        pat = rng.choice(["card*", "a?c", "pre*fix"])
        return f"{f}:{pat}", {"wildcard": {f: pat}}
    if kind == 4:
        phrase = rng.choice(["timed out", "a b c"])
        return f'{f}:"{phrase}"', {"match_phrase": {f: phrase}}
    if kind == 5:
        return f"_exists_:{f}", {"exists": {"field": f}}
    vals = rng.sample(["A", "B9", "c*d", "3"], rng.randrange(2, 4))
    parts = " OR ".join(vals)
    nodes = [
        {"wildcard": {f: v}} if "*" in v
        else {"term": {f: 3 if v == "3" else v}}
        for v in vals
    ]
    return (f"{f}:({parts})",
            {"bool": {"should": nodes, "minimum_should_match": 1}})


def _tree(rng: random.Random, depth: int):
    if depth == 0 or rng.random() < 0.4:
        text, node = _leaf(rng)
        if rng.random() < 0.2:
            return f"NOT {text}", {"bool": {"must_not": [node]}}
        return text, node
    op = rng.choice(["AND", "OR"])
    n = rng.randrange(2, 4)
    subs = [_tree(rng, depth - 1) for _ in range(n)]
    # parenthesize every operand: flat mixed chains have precedence
    # semantics the expected-node builder would have to re-implement
    texts = [f"({t})" for t, _ in subs]
    nodes = [nd for _, nd in subs]
    if op == "AND":
        return " AND ".join(texts), {"bool": {"must": nodes}}
    return (" OR ".join(texts),
            {"bool": {"should": nodes, "minimum_should_match": 1}})


def test_fuzz_parser_reproduces_expected_nodes():
    rng = random.Random(0xC0FFEE)
    for i in range(200):
        text, expected = _tree(rng, rng.randrange(0, 3))
        got = parse_query_string(text)
        assert got == expected, f"case {i}: {text!r}\n{got}\n{expected}"
