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
