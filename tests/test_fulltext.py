"""Parameterized full-text surface: analyzer determinism (Spark column
form ≡ Python query form), should/must boolean semantics, and the
query-string API's error contract."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.fulltext import (
    analyze_query,
    analyze_tokens,
    query_string_bm25,
)


def test_analyzer_rules():
    # stopword strip + each stemmer rule
    assert analyze_query("the joined sparks and queries") == ["join", "spark", "query"]
    assert analyze_query("dresses") == ["dress"]       # sses → ss
    assert analyze_query("pass") == ["pass"]           # ss → keep
    assert analyze_query("running") == ["runn"]        # ing dropped (no dedup step)
    assert analyze_query("worked") == ["work"]         # ed dropped
    assert analyze_query("cats") == ["cat"]            # s dropped (len ≥ 4)
    assert analyze_query("its") == ["its"]             # len 3 < 4: unstemmed
    assert analyze_query("is") == []                   # stopword
    assert analyze_query("as") == ["as"]               # too short to stem


def test_spark_analyzer_matches_python(spark):
    samples = [
        "The Joined SPARKS and queries",
        "dresses pass running worked its",
        "  leading  spaces   ",
        "mixes unstemmed tokens like zebra",
    ]
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    rows = df.select("text", analyze_tokens(F.col("text")).alias("toks")).collect()
    for r in rows:
        # column analyzer keeps duplicates; the query analyzer dedups —
        # compare first-seen-ordered distinct
        seen = list(dict.fromkeys(r["toks"]))
        assert seen == analyze_query(r["text"]), r["text"]


def test_analyzer_three_way_agreement_randomized(spark):
    """The analyzer exists in three implementations that must agree
    token-for-token: the Spark column chain (analyze_tokens), the Python
    query replica (analyze_query), and the generated DuckDB SQL
    (analyze_sql). Randomized word soup over stopwords, stemmable and
    unstemmable tokens, mixed case and ragged whitespace."""
    import random

    import duckdb

    from postgres_opensearch_cdc_spark.functions.fulltext import analyze_sql

    vocab = [
        "the", "and", "of", "with",          # stopwords
        "queries", "dresses", "passes",      # ies/sses stems
        "running", "working", "jumped",      # ing/ed stems
        "sparks", "joins", "cats",           # plural stems
        "ss", "boss", "as", "is",            # short/ss edge cases
        "zebra", "Table", "QUERY", "mIxEd",  # case + unstemmed
    ]
    rng = random.Random(1234)
    samples = []
    for _ in range(60):
        words = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        sep = rng.choice([" ", "  ", "\t", " \t "])
        samples.append(sep.join(words) + rng.choice(["", " ", "  "]))
    df = spark.createDataFrame([(s,) for s in samples], "text string")
    spark_out = {
        r["text"]: list(r["toks"])
        for r in df.select(
            "text", analyze_tokens(F.col("text")).alias("toks")
        ).collect()
    }
    con = duckdb.connect()
    for s in samples:
        duck = con.execute(
            f"SELECT {analyze_sql('t')} FROM (SELECT ? AS t)", [s]
        ).fetchone()[0]
        assert spark_out[s] == list(duck), f"spark vs duckdb diverge on {s!r}"
        assert list(dict.fromkeys(spark_out[s])) == analyze_query(s), (
            f"spark vs python diverge on {s!r}"
        )


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "spark joins queries on big tables"),          # all 3 stems
        (2, "spark only here"),                             # 1 stem
        (3, "the queries were joined by spark workers"),    # all 3
        (4, "nothing relevant whatsoever"),                 # 0
        (5, "join query"),                                  # 2 of 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_should_vs_must(corpus):
    q = "the joined sparks and queries"
    should = {r["doc_id"] for r in query_string_bm25(corpus, q, mode="should").collect()}
    must = {r["doc_id"] for r in query_string_bm25(corpus, q, mode="must").collect()}
    assert should == {1, 2, 3, 5}
    assert must == {1, 3}
    assert must < should


def test_must_scores_rank_full_matches(corpus):
    out = query_string_bm25(corpus, "sparks queries joined", mode="must").collect()
    assert [r["doc_id"] for r in out] == sorted(
        [r["doc_id"] for r in out],
        key=lambda d: -[r["bm25"] for r in out if r["doc_id"] == d][0],
    )
    assert all(r["bm25"] > 0 for r in out)


def test_error_contract(corpus):
    with pytest.raises(ValueError, match="zero terms"):
        query_string_bm25(corpus, "the and of")
    with pytest.raises(ValueError, match="unknown mode"):
        query_string_bm25(corpus, "spark", mode="filter")
