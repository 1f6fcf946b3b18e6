"""BPE merge training (functions/bpe.py): the Sennrich algorithm on
the distinct-word frequency table under the module's DEFINED
single-pass-replace merge semantics (see the bpe.py semantics note on
self-adjacent runs), checked against an independent pure-Python model
of those semantics, plus the canonical low/lower/newest/widest
example where they coincide exactly with classic BPE."""

from __future__ import annotations

from collections import Counter

from postgres_opensearch_cdc_spark.functions.bpe import (
    bpe_token_counts,
    bpe_train,
    merges_frame,
)


def _reference_bpe(texts: list[str], num_merges: int):
    """Driver-loop model of the module's semantics: pair counts from
    the current tokenization, argmax with (count desc, pair lexic)
    tie-break, merge applied as ONE left-to-right str.replace pass on
    the sentinel-padded symbol string."""
    wf = Counter(w for t in texts for w in t.lower().split() if w)
    syms = {w: " " + " ".join(w) + " " for w in wf}
    out = []
    for rank in range(num_merges):
        pc = Counter()
        for w, cnt in wf.items():
            toks = syms[w].split()
            for i in range(len(toks) - 1):
                pc[(toks[i], toks[i + 1])] += cnt
        if not pc:
            break
        best = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
        out.append((rank, best[0], best[1]))
        l, r = best
        for w in syms:
            syms[w] = syms[w].replace(f" {l} {r} ", f" {l}{r} ")
    per_word = {w: len(s.split()) for w, s in syms.items()}
    return out, per_word


def test_bpe_train_matches_reference_on_canonical_corpus(spark):
    texts = [
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest",
        "low lower widest newest",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe_train(docs, "text", num_merges=6)
    want, per_word = _reference_bpe(texts, 6)
    assert got == want
    # the canonical example learns 'es' -> 'est' -> ... -> 'newest'
    assert got[0][1:] == ("e", "s") and got[1][1:] == ("es", "t")
    counts = {r["id"]: (r["n_words"], r["n_tokens_bpe"])
              for r in bpe_token_counts(docs, "text", "doc_id", got).collect()}
    for i, t in enumerate(texts):
        words = t.lower().split()
        assert counts[i] == (len(words),
                             sum(per_word[w] for w in words))


def test_bpe_train_seeded_fuzz_matches_reference(spark):
    import random

    rng = random.Random(1107)
    alphabet = "abcde"
    texts = [
        " ".join(
            "".join(rng.choice(alphabet)
                    for _ in range(rng.randint(1, 6)))
            for _ in range(rng.randint(3, 30))
        )
        for _ in range(40)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = bpe_train(docs, "text", num_merges=10)
    want, per_word = _reference_bpe(texts, 10)
    assert got == want
    counts = {r["id"]: r["n_tokens_bpe"]
              for r in bpe_token_counts(docs, "text", "doc_id", got).collect()}
    for i, t in enumerate(texts):
        assert counts[i] == sum(per_word[w] for w in t.lower().split())


def test_bpe_early_stop_and_frame_shape(spark):
    docs = spark.createDataFrame([(1, "ab ab")], "doc_id long, text string")
    merges = bpe_train(docs, "text", num_merges=10)
    # 'ab' fully merges after one step; nothing else to merge
    assert merges == [(0, "a", "b")]
    mf = merges_frame(spark, merges)
    assert mf.columns == ["rank", "left", "right", "merged"]
    assert mf.head()["merged"] == "ab"
    # min_freq gate: demand more support than the corpus has
    assert bpe_train(docs, "text", num_merges=5, min_freq=3) == []


def test_bpe_train_local_matches_distributed(spark):
    """The driver-side merge loop (one distributed word-count pass,
    then local incremental pair maintenance) must produce IDENTICAL
    merges to the per-iteration Spark loop — on the canonical corpus,
    a run-heavy corpus (self-adjacent pairs whose merged pair SURVIVES
    a single replace pass), and a seeded fuzz corpus at a merge count
    far past what the distributed loop is run at."""
    from postgres_opensearch_cdc_spark.functions.bpe import bpe_train_local

    texts = [
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest",
        "low lower widest newest",
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    assert bpe_train_local(docs, "text", 6) == bpe_train(docs, "text", 6)

    runs = spark.createDataFrame(
        [(1, "aaaa aaaa aa b"), (2, "aaaaaaa b aa")],
        "doc_id long, text string",
    )
    assert (bpe_train_local(runs, "text", 6)
            == bpe_train(runs, "text", 6))

    import random
    rng = random.Random(2026)
    fuzz = [
        " ".join(
            "".join(rng.choice("abcdef")
                    for _ in range(rng.randint(1, 8)))
            for _ in range(rng.randint(3, 40))
        )
        for _ in range(60)
    ]
    fdocs = spark.createDataFrame(
        list(enumerate(fuzz)), "doc_id long, text string"
    )
    want, _ = _reference_bpe(fuzz, 24)
    got_local = bpe_train_local(fdocs, "text", 24)
    assert got_local == want == bpe_train(fdocs, "text", 24)

    # past the reference model: local trains 100+ merges in one Spark
    # job; spot-check prefix-stability (merge k is independent of the
    # requested total) and early exhaustion behavior
    got_200 = bpe_train_local(fdocs, "text", 200)
    assert got_200[:24] == got_local
    assert len({(l, r) for _, l, r in got_200}) == len(got_200)

    # min_freq gate matches
    assert (bpe_train_local(docs, "text", 5, min_freq=1000)
            == bpe_train(docs, "text", 5, min_freq=1000) == [])


def test_bpe_arrow_encoder_matches_expression_form(spark):
    """The mapInPandas encoder must return row-identical
    (id, n_words, n_tokens_bpe) to the chained-replace expression form
    at n=8, and stay consistent with itself at a merge count the
    expression form is not built for."""
    from postgres_opensearch_cdc_spark.functions.bpe import (
        bpe_token_counts_arrow,
        bpe_train_local,
    )

    import random
    rng = random.Random(31)
    texts = [
        " ".join(
            "".join(rng.choice("abcdefgh")
                    for _ in range(rng.randint(1, 9)))
            for _ in range(rng.randint(1, 50))
        )
        for _ in range(80)
    ] + ["", "   ", "AAaa Bb aaAA"]  # empties + case folding
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = bpe_train_local(docs, "text", 8)
    expr = {tuple(r) for r in
            bpe_token_counts(docs, "text", "doc_id", merges).collect()}
    arrow = {tuple(r) for r in
             bpe_token_counts_arrow(docs, "text", "doc_id", merges)
             .collect()}
    assert arrow == expr

    # at 100 merges: totals must be monotonically <= the 8-merge
    # tokenization (more merges never add tokens) and >= n_words
    m100 = bpe_train_local(docs, "text", 100)
    assert len(m100) > 8
    t100 = {r["id"]: (r["n_words"], r["n_tokens_bpe"]) for r in
            bpe_token_counts_arrow(docs, "text", "doc_id", m100)
            .collect()}
    t8 = {r[0]: (r[1], r[2]) for r in expr}
    for i in t100:
        assert t100[i][1] <= t8[i][1]
        assert t100[i][1] >= t100[i][0]
