"""Configurable per-field analyzer chains — the OpenSearch analysis
pipeline (tokenizer + ordered token filters) as declarative column
expressions (reference analyzer TDD :527-533; closes the "fixed
analyzer" gap: chains are now user-composable per field, like index
settings ``analysis.analyzer.custom``).

A chain is (tokenizer, filters) where filters is an ordered tuple of
specs:

    ("lowercase",)
    ("stop", (word, ...))
    ("length", min_len, max_len)
    ("stemmer",)                      — the suffix-rule stemmer shared
                                        with functions.fulltext
    ("synonym", ((from, to), ...))    — one-way token mapping
    ("edge_ngram", min_gram, max_gram) — search-as-you-type prefixes
                                        (changes token cardinality)

Every chain exists in THREE forms generated from the same spec —
Spark Column (codegen, scan-stage), Python (for constant query
strings), and DuckDB SQL (for the value-check oracle) — so any
analyzer a user composes is oracle-checkable, not rows-only.

Scale shape: the whole chain is higher-order-function composition on
the token array inside the scan projection — no explode until the
caller needs postings, no Python in the row path.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, functions as F

from postgres_opensearch_cdc_spark.functions.fulltext import (
    _STEM_RULES,
    _stem_col,
    _stem_sql,
)

TOKENIZERS = {
    "whitespace": r"\s+",
    # ES "letter" tokenizer: emit maximal letter runs
    "letter": r"[^a-zA-Z]+",
}


def _check(tokenizer: str, filters) -> None:
    if tokenizer not in TOKENIZERS:
        raise ValueError(f"unknown tokenizer: {tokenizer}")
    for f in filters:
        if f[0] not in ("lowercase", "stop", "length", "stemmer",
                        "synonym", "edge_ngram"):
            raise ValueError(f"unknown token filter: {f[0]}")


def analyze_col(col: Column, tokenizer: str = "whitespace",
                filters=(("lowercase",),)) -> Column:
    """text column → array<string> of analyzed terms via the chain."""
    _check(tokenizer, filters)
    arr = F.split(col, TOKENIZERS[tokenizer])
    arr = F.filter(arr, lambda t: F.length(t) > 0)
    for spec in filters:
        kind = spec[0]
        if kind == "lowercase":
            arr = F.transform(arr, F.lower)
        elif kind == "stop":
            stops = F.array(*[F.lit(s) for s in spec[1]])
            arr = F.filter(arr, lambda t: ~F.array_contains(stops, t))
        elif kind == "length":
            mn, mx = spec[1], spec[2]
            arr = F.filter(
                arr, lambda t: (F.length(t) >= mn) & (F.length(t) <= mx)
            )
        elif kind == "stemmer":
            arr = F.transform(arr, _stem_col)
        elif kind == "synonym":
            # bind via factory, not a default arg: higher-order-function
            # lambdas are called by ARITY — a second parameter would
            # receive the element index, not the closure
            def _mapper(mapping):
                def _map(t: Column) -> Column:
                    out = None
                    for src, dst in mapping:
                        c = t == src
                        out = F.when(c, dst) if out is None else out.when(c, dst)
                    return out.otherwise(t) if out is not None else t

                return _map

            arr = F.transform(arr, _mapper(spec[1]))
        elif kind == "edge_ngram":
            mn, mx = spec[1], spec[2]
            kept = F.filter(arr, lambda t: F.length(t) >= mn)
            arr = F.flatten(
                F.transform(
                    kept,
                    lambda t: F.transform(
                        F.sequence(F.lit(mn), F.least(F.lit(mx), F.length(t))),
                        lambda g: F.substring(t, 1, F.lit(0) + g),
                    ),
                )
            )
    return arr


def analyze_text(text: str, tokenizer: str = "whitespace",
                 filters=(("lowercase",),)) -> list[str]:
    """Python replica for constant query strings (same chain, same
    order). Duplicates kept, like the column form."""
    _check(tokenizer, filters)
    toks = [t for t in re.split(TOKENIZERS[tokenizer], text) if t]
    for spec in filters:
        kind = spec[0]
        if kind == "lowercase":
            toks = [t.lower() for t in toks]
        elif kind == "stop":
            stops = set(spec[1])
            toks = [t for t in toks if t not in stops]
        elif kind == "length":
            mn, mx = spec[1], spec[2]
            toks = [t for t in toks if mn <= len(t) <= mx]
        elif kind == "stemmer":
            out = []
            for t in toks:
                for pat, repl, minlen in _STEM_RULES:
                    if re.search(pat, t) and (not minlen or len(t) >= minlen):
                        if repl is not None:
                            t = re.sub(pat, repl, t)
                        break
                out.append(t)
            toks = out
        elif kind == "synonym":
            mapping = dict(spec[1])
            toks = [mapping.get(t, t) for t in toks]
        elif kind == "edge_ngram":
            mn, mx = spec[1], spec[2]
            toks = [
                t[:g]
                for t in toks
                if len(t) >= mn
                for g in range(mn, min(mx, len(t)) + 1)
            ]
    return toks


def analyze_chain_sql(expr: str, tokenizer: str = "whitespace",
                      filters=(("lowercase",),)) -> str:
    """DuckDB replica of the SAME chain, generated from the same spec
    — keeps custom analyzers value-checkable."""
    _check(tokenizer, filters)
    pat = TOKENIZERS[tokenizer]
    sql = f"list_filter(regexp_split_to_array({expr}, '{pat}'), t -> strlen(t) > 0)"
    for spec in filters:
        kind = spec[0]
        if kind == "lowercase":
            sql = f"list_transform({sql}, t -> lower(t))"
        elif kind == "stop":
            stops = "[" + ", ".join(f"'{s}'" for s in spec[1]) + "]"
            sql = f"list_filter({sql}, t -> NOT list_contains({stops}, t))"
        elif kind == "length":
            mn, mx = spec[1], spec[2]
            sql = f"list_filter({sql}, t -> strlen(t) BETWEEN {mn} AND {mx})"
        elif kind == "stemmer":
            sql = f"list_transform({sql}, t -> {_stem_sql('t')})"
        elif kind == "synonym":
            whens = " ".join(
                f"WHEN t = '{src}' THEN '{dst}'" for src, dst in spec[1]
            )
            sql = f"list_transform({sql}, t -> CASE {whens} ELSE t END)"
        elif kind == "edge_ngram":
            mn, mx = spec[1], spec[2]
            sql = (
                f"flatten(list_transform("
                f"list_filter({sql}, t -> strlen(t) >= {mn}), "
                f"t -> list_transform(range({mn}, least({mx}, strlen(t)) + 1), "
                f"g -> substr(t, 1, g))))"
            )
    return sql
