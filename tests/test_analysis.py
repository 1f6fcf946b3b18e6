"""Configurable analyzer chains: tri-form consistency (Column vs
Python replica vs DuckDB SQL), filter ordering, and cardinality-
changing filters. The parity gate value-checks the two dashboard
entries; these pin the chain semantics."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.analysis import (
    analyze_chain_sql,
    analyze_col,
    analyze_text,
)

CHAIN = (
    ("lowercase",),
    ("stop", ("the", "of")),
    ("synonym", (("streaming", "stream"),)),
    ("stemmer",),
)
EDGE = (("lowercase",), ("edge_ngram", 2, 4))
SAMPLES = [
    "The Streaming JOINS of sparks",
    "stream processing; the re-grouped tables!",
    "ab x yz",
    "",
]


@pytest.mark.parametrize("tokenizer,filters", [
    ("whitespace", CHAIN),
    ("letter", CHAIN),
    ("whitespace", EDGE),
    ("letter", EDGE),
])
def test_three_forms_agree(spark, tokenizer, filters):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["text"])
    got_col = [
        r["a"] for r in
        df.select(analyze_col(F.col("text"), tokenizer, filters).alias("a")).collect()
    ]
    got_py = [analyze_text(s, tokenizer, filters) for s in SAMPLES]
    sql = analyze_chain_sql("text", tokenizer, filters)
    con = duckdb.connect()
    got_sql = [
        con.execute(f"SELECT {sql} AS a FROM (SELECT ? AS text)", [s]).fetchone()[0]
        for s in SAMPLES
    ]
    assert got_col == got_py, "Column form diverges from Python replica"
    assert got_py == got_sql, "Python replica diverges from DuckDB SQL"


def test_filter_order_matters(spark):
    # stop BEFORE lowercase must not strip capitalized stopwords
    early_stop = (("stop", ("the",)), ("lowercase",))
    late_stop = (("lowercase",), ("stop", ("the",)))
    s = "The the word"
    assert analyze_text(s, "whitespace", early_stop) == ["the", "word"]
    assert analyze_text(s, "whitespace", late_stop) == ["word"]


def test_edge_ngram_expands_prefixes(spark):
    out = analyze_text("spark go", "whitespace", (("edge_ngram", 2, 4),))
    assert out == ["sp", "spa", "spar", "go"]


def test_synonym_is_one_way(spark):
    chain = (("synonym", (("streaming", "stream"),)),)
    assert analyze_text("streaming stream", "whitespace", chain) == [
        "stream", "stream"
    ]


def test_letter_tokenizer_splits_punctuation(spark):
    assert analyze_text("re-grouped; tables!", "letter", (("lowercase",),)) == [
        "re", "grouped", "tables"
    ]


def test_unknown_filter_raises(spark):
    with pytest.raises(ValueError, match="unknown token filter"):
        analyze_text("x", "whitespace", (("bogus",),))


def _rand_chain(rng):
    import random as _r  # noqa: F401

    filters = []
    pool = [
        ("lowercase",),
        ("stop", ("the", "of", "and")),
        ("length", 2, 8),
        ("stemmer",),
        ("synonym", (("streaming", "stream"), ("tables", "table"))),
        ("edge_ngram", 2, 4),
    ]
    for f in pool:
        if rng.random() < 0.5:
            filters.append(f)
    if not filters:
        filters.append(("lowercase",))
    tok = rng.choice(["whitespace", "letter"])
    return tok, tuple(filters)


def test_random_chains_tri_form_equality(spark):
    """20 seeded random chains: Column, Python, and SQL forms must agree
    on every sample — the analyzer contract holds for ANY composition,
    not just the fixtures."""
    import random

    import duckdb as _duck

    con = _duck.connect()
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["text"])
    for seed in range(20):
        rng = random.Random(seed)
        tok, filters = _rand_chain(rng)
        got_col = [
            r["a"]
            for r in df.select(
                analyze_col(F.col("text"), tok, filters).alias("a")
            ).collect()
        ]
        got_py = [analyze_text(s, tok, filters) for s in SAMPLES]
        sql = analyze_chain_sql("text", tok, filters)
        got_sql = [
            con.execute(
                f"SELECT {sql} AS a FROM (SELECT ? AS text)", [s]
            ).fetchone()[0]
            for s in SAMPLES
        ]
        assert got_col == got_py == got_sql, (seed, tok, filters)
