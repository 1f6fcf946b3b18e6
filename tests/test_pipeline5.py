"""Reference-model and property tests for training-pipeline batch 5
(WordPiece training, CCNet bucketing, winnowing fingerprints,
perceptual-hash groups) — pure-Python reimplementations pin the same
math the DuckDB oracles value-check, plus the guarantees the oracles
cannot express (winnowing's shared-run detection, tertile balance)."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from postgres_opensearch_cdc_spark.functions.bpe import wordpiece_train
from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
    WIN_CAP,
    WIN_K,
    WIN_MIN_SHARED,
    WIN_W,
    ahash_table,
    quality_ccnet_buckets,
    winnow_shared_pairs,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# WordPiece reference model
# ---------------------------------------------------------------------------


def _ref_wordpiece(texts: list[str], n: int):
    wf: Counter = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.lower(), flags=re.ASCII):
            if w:
                wf[w] += 1
    syms = [[" " + " ".join(w) + " ", c] for w, c in wf.items()]
    merges = []
    for rank in range(n):
        pc: Counter = Counter()
        sc: Counter = Counter()
        for s, c in syms:
            toks = s.strip().split(" ")
            for tok in toks:
                sc[tok] += c
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] += c
        if not pc:
            break
        # argmax by (score desc, l, r) — score is one double division
        best = min(
            pc, key=lambda p: (-(pc[p] / (sc[p[0]] * sc[p[1]])), p)
        )
        score = pc[best] / (sc[best[0]] * sc[best[1]])
        merges.append((rank, best[0], best[1], score))
        pat, rep = f" {best[0]} {best[1]} ", f" {best[0]}{best[1]} "
        for row in syms:
            row[0] = row[0].replace(pat, rep)
    return merges


def test_wordpiece_matches_reference_model(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "the quick brown fox naps",
        "lazy dogs nap quickly under the brown tree",
        "zq zq unique bigrams here",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = wordpiece_train(docs, "text", num_merges=6)
    want = _ref_wordpiece(texts, 6)
    assert [(r, l, x) for r, l, x, _ in got] == [
        (r, l, x) for r, l, x, _ in want
    ]
    for (_, _, _, gs), (_, _, _, ws) in zip(got, want):
        assert gs == ws  # identical IEEE doubles, not just close


def test_wordpiece_max_munch_matches_reference(spark):
    # hand-check greedy longest-match-first against a crafted merge
    # list: vocab {ab, abc, bc}; "abcabc" -> [abc][abc] (2), never
    # the [ab][c]... shorter-first split; "cab" -> [c][ab] (2);
    # unknown chars fall back to one token per char.
    from postgres_opensearch_cdc_spark.functions.bpe import (
        wordpiece_token_counts_arrow,
    )

    merges = [(0, "a", "b", 0.5), (1, "ab", "c", 0.25),
              (2, "b", "c", 0.125)]
    docs = spark.createDataFrame(
        [(0, "abcabc cab xyz abab"), (1, "bc a")],
        "doc_id long, text string",
    )
    got = {
        r["id"]: (r["n_words"], r["n_tokens_wp"])
        for r in wordpiece_token_counts_arrow(
            docs, "text", "doc_id", merges
        ).collect()
    }
    # abcabc=2, cab=2, xyz=3 (no merges apply), abab=2 -> 9 tokens
    assert got[0] == (4, 9)
    # bc=1, a=1
    assert got[1] == (2, 2)


def test_wordpiece_prefers_rare_symbol_pairs(spark):
    # 'zq' appears once and its symbols appear nowhere else -> its
    # likelihood score is maximal (1.0) and must win the first merge
    # over the much more frequent 'th' pair.
    docs = spark.createDataFrame(
        [(0, "the the the the zq")], "doc_id long, text string"
    )
    got = wordpiece_train(docs, "text", num_merges=1)
    assert (got[0][1], got[0][2]) == ("z", "q")
    assert got[0][3] == 1.0


# ---------------------------------------------------------------------------
# CCNet bucketing properties
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def ccnet(spark):
    return quality_ccnet_buckets(spark, SF).collect()


def test_ccnet_tertiles_balanced(ccnet):
    sizes = Counter()
    for r in ccnet:
        sizes[r["bucket"]] += r["n_docs"]
    assert set(sizes) == {"head", "middle", "tail"}
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_ccnet_buckets_ordered_by_score(ccnet):
    # every head doc scores <= every middle doc <= every tail doc
    # (ties at the boundary split by doc_id, so <= not <)
    hi = {b: max(r["max_nlp_e6"] for r in ccnet if r["bucket"] == b)
          for b in ("head", "middle", "tail")}
    lo = {b: min(r["min_nlp_e6"] for r in ccnet if r["bucket"] == b)
          for b in ("head", "middle", "tail")}
    assert hi["head"] <= lo["middle"] + 1e-9
    assert hi["middle"] <= lo["tail"] + 1e-9


def test_ccnet_covers_all_scorable_docs(spark, ccnet):
    import duckdb

    n_scorable = duckdb.sql(
        f"""SELECT count(*) FROM '{SF}/documents.parquet'
            WHERE len(regexp_split_to_array(lower(text), '\\s+')) >= 2"""
    ).fetchone()[0]
    assert sum(r["n_docs"] for r in ccnet) == n_scorable


# ---------------------------------------------------------------------------
# Winnowing reference model + guarantee
# ---------------------------------------------------------------------------


def _ref_winnow_pairs(texts_by_id: dict[int, str]):
    fps: dict[int, set] = {}
    for did, t in texts_by_id.items():
        toks = [w for w in re.split(r"\s+", t.lower(), flags=re.ASCII)
                if w]
        if len(toks) < WIN_K:
            continue
        grams = [" ".join(toks[i:i + WIN_K])
                 for i in range(len(toks) - WIN_K + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in grams]
        ng = len(grams)
        sel = set()
        for s in range(max(ng - WIN_W, 0) + 1):
            window = [(hs[p], -p) for p in range(s, min(s + WIN_W, ng))]
            sel.add(min(window)[0])  # rightmost min: (h asc, pos desc)
        fps[did] = sel
    dfc: Counter = Counter()
    for s in fps.values():
        dfc.update(s)
    ok = {h for h, c in dfc.items() if 2 <= c <= WIN_CAP}
    out = {}
    ids = sorted(fps)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            shared = len(fps[a] & fps[b] & ok)
            if shared >= WIN_MIN_SHARED:
                out[(a, b)] = shared
    return out


def test_winnowing_matches_reference_model(spark):
    texts = {
        0: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        1: "intro words alpha beta gamma delta epsilon zeta eta theta "
           "iota kappa trailing bits",
        2: "completely different content with no shared runs at all "
           "nothing matches here",
        3: "another doc that also has completely different content "
           "with no shared runs at all",
        4: "tiny doc",  # < WIN_K tokens: must drop out
        5: "alpha beta gamma delta epsilon zeta eta theta iota kappa",
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["n_shared"]
        for r in winnow_shared_pairs(docs).collect()
    }
    assert got == _ref_winnow_pairs(texts)
    assert (0, 5) in got  # identical docs always pair
    assert (0, 1) in got  # a shared >= w+k-1 token run must be caught


def test_winnowing_guarantee_on_fixture(spark):
    # winnowing's contract: every window of WIN_W gram positions
    # contributes one fingerprint, so per-doc fingerprint count is
    # within [ceil(ng/WIN_W) / ng, 2/(WIN_W+1) * ~...]; assert the
    # coarse bound that no doc with >= WIN_K tokens selects zero
    # fingerprints and the density never exceeds 1.
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, SF, "documents").limit(50)
    pairs = winnow_shared_pairs(docs)
    assert pairs.filter("doc_a >= doc_b").count() == 0


# ---------------------------------------------------------------------------
# Count-min sketch: one-sided error + mergeability
# ---------------------------------------------------------------------------


def test_count_min_overestimates_never_negative(spark):
    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        sketch_count_min,
    )

    rows = sketch_count_min(spark, SF).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["overestimate"] >= 0, r  # CM error is one-sided
        assert r["cm_est"] >= r["true_cnt"]


def test_count_min_sketch_is_mergeable(spark):
    # the defining distributed property: sketch(A ∪ B) ==
    # element-wise sum of sketch(A) and sketch(B) — what makes the
    # partial-then-final aggregation correct under ANY partitioning.
    import hashlib
    from collections import Counter

    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        CM_DEPTH,
        CM_WIDTH,
    )

    def sketch(words):
        grid = Counter()
        for w in words:
            for r in range(CM_DEPTH):
                h = int(
                    hashlib.md5(f"{w}:{r}".encode()).hexdigest()[:15],
                    16,
                )
                grid[(r, h % CM_WIDTH)] += 1
        return grid

    a = ["x", "y", "x", "z"] * 7
    b = ["y", "q", "x"] * 5
    merged = sketch(a) + sketch(b)
    assert merged == sketch(a + b)


# ---------------------------------------------------------------------------
# Content-defined chunking: reference model + shift robustness
# ---------------------------------------------------------------------------


def _ref_cdc_chunks(text: str):
    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        CDC_MASK,
        CDC_W,
    )

    toks = [w for w in re.split(r"\s+", text.lower(), flags=re.ASCII)
            if w]
    chunks, cur = [], []
    for i, tok in enumerate(toks):
        cur.append(tok)
        if i >= CDC_W - 1:
            gram = " ".join(toks[i - CDC_W + 1:i + 1])
            h = int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)
            if h % CDC_MASK == 0:
                chunks.append(" ".join(cur))
                cur = []
    if cur:
        chunks.append(" ".join(cur))
    return chunks


def test_cdc_chunks_match_reference_model(spark):
    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        cdc_chunks,
    )

    texts = {
        0: "the quick brown fox jumps over the lazy dog and runs far "
           "away into the deep dark forest tonight",
        1: "short one",
        2: "a b c d e f g h i j k l m n o p q r s t u v w x y z",
    }
    docs = spark.createDataFrame(
        [(i, "src", t) for i, t in texts.items()],
        "doc_id long, source string, text string",
    )
    got = {}
    for r in cdc_chunks(docs).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk"])
        )
    for did, text in texts.items():
        want = _ref_cdc_chunks(text)
        have = [c for _, c in sorted(got[did])]
        assert have == want, f"doc {did}: {have} != {want}"


def test_cdc_chunking_is_shift_robust(spark):
    # the defining property vs fixed-size chunking: prepending tokens
    # re-chunks only the prefix neighborhood; the chunk multiset of
    # the shifted doc must overwhelmingly overlap the original's,
    # while fixed-size chunking would shift EVERY boundary.
    base = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
            "psi omega one two three four five six seven eight nine "
            "ten eleven twelve thirteen fourteen fifteen sixteen") * 3
    a = _ref_cdc_chunks(base)
    b = _ref_cdc_chunks("inserted prefix words " + base)
    # only the first chunk (the one containing the insertion point)
    # may change; every other chunk string survives verbatim
    assert set(a) - set(b) <= {a[0]}
    assert set(b) - set(a) <= {b[0]}
    assert a[1:] == b[1:]  # identical chunk sequence past the edit


def test_ahash_matches_reference_model(spark):
    import duckdb

    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet' "
        f"ORDER BY doc_id LIMIT 100"
    ).fetchall()
    want = {}
    for did, text in rows:
        content = text.encode("utf-8")
        buckets = [0] * 16
        for byte in content:
            buckets[byte % 16] += 1
        n = max(len(content), 1)
        f = [b * 1_000_000 // n for b in buckets]
        tot = sum(f)
        want[did] = sum(
            (1 << i) for i in range(16) if 16 * f[i] > tot
        )
    from postgres_opensearch_cdc_spark.functions.multimodal import (
        media_from_documents,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, SF, "documents").filter(
        f"doc_id IN ({','.join(str(d) for d in want)})"
    )
    got = {
        r["media_id"]: r["ahash"]
        for r in ahash_table(media_from_documents(docs)).collect()
    }
    assert got == want


def test_ahash_entropy_is_nontrivial(spark):
    # the hash must actually discriminate: over the fixture it should
    # produce more than one distinct value and not be unique per doc
    # (text docs share language statistics -> some collisions).
    from postgres_opensearch_cdc_spark.functions.multimodal import (
        media_from_documents,
    )
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, SF, "documents")
    tab = ahash_table(media_from_documents(docs))
    n = tab.count()
    distinct = tab.select("ahash").distinct().count()
    assert 1 < distinct < n


# ---------------------------------------------------------------------------
# Hypothesis properties (python reference models; Spark == reference
# is pinned by the equivalence tests above, so the properties transfer)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_words_st = st.lists(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(_words_st)
def test_cdc_chunks_reconstruct_the_document(toks):
    text = " ".join(toks)
    chunks = _ref_cdc_chunks(text)
    assert " ".join(chunks).split() == [t.lower() for t in toks if t]
    assert all(c for c in chunks)  # never an empty chunk


@settings(max_examples=100, deadline=None)
@given(_words_st, _words_st, _words_st)
def test_winnowing_shared_run_guarantee(prefix_a, prefix_b, run):
    # robust winnowing's contract: two docs sharing a run of
    # >= WIN_W + WIN_K - 1 tokens select at least one common
    # fingerprint from inside the run (pre-cap property).
    if len(run) < WIN_W + WIN_K - 1:
        run = run + ["shared"] * (WIN_W + WIN_K - 1 - len(run))
    a = " ".join(prefix_a + run)
    b = " ".join(prefix_b + run)

    def fps(text):
        toks = [w for w in text.lower().split() if w]
        grams = [" ".join(toks[i:i + WIN_K])
                 for i in range(len(toks) - WIN_K + 1)]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16)
              for g in grams]
        ng = len(grams)
        sel = set()
        for s in range(max(ng - WIN_W, 0) + 1):
            sel.add(min((hs[p], -p)
                        for p in range(s, min(s + WIN_W, ng)))[0])
        return sel

    assert fps(a) & fps(b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from("abcde"), min_size=1, max_size=40),
       st.lists(st.sampled_from("abcde"), min_size=0, max_size=40))
def test_count_min_mergeable_under_any_split(a, b):
    import hashlib as hl
    from collections import Counter

    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        CM_DEPTH,
        CM_WIDTH,
    )

    def sk(ws):
        g = Counter()
        for w in ws:
            for r in range(CM_DEPTH):
                h = int(hl.md5(f"{w}:{r}".encode()).hexdigest()[:15], 16)
                g[(r, h % CM_WIDTH)] += 1
        return g

    merged = sk(a) + sk(b)
    assert merged == sk(a + b)
    # one-sided error for every key
    truth = Counter(a + b)
    for w, c in truth.items():
        est = min(
            merged[(r, int(hl.md5(f"{w}:{r}".encode()).hexdigest()[:15],
                           16) % CM_WIDTH)]
            for r in range(CM_DEPTH)
        )
        assert est >= c


# ---------------------------------------------------------------------------
# Kneser-Ney smoothing: proper-distribution property
# ---------------------------------------------------------------------------


def test_kneser_ney_is_a_proper_distribution():
    # For every context w1, summing the interpolated-KN probability
    # over the ENTIRE continuation vocabulary must give exactly 1:
    # sum(max(c-d,0)) = c(w1.) - d*N1+(w1.) over observed pairs, and
    # the lambda mass d*N1+(w1.) flows to p_cont which itself sums to
    # 1 (sum of N1+(.w2) over w2 = |types|). Checks the discount
    # bookkeeping the entry relies on.
    from collections import Counter

    corpus = ("the cat sat on the mat the cat ran to the mat "
              "a dog sat on a log the dog ran").split()
    pairs = list(zip(corpus, corpus[1:]))
    bc = Counter(pairs)
    pc = Counter(p for p, _ in pairs)
    types = set(pairs)
    np1 = Counter(p for p, _ in types)
    nn1 = Counter(n for _, n in types)
    tot = len(types)
    nxt_vocab = set(nn1)
    for w1 in pc:
        s = 0.0
        for w2 in nxt_vocab:
            disc = max(bc.get((w1, w2), 0) * 4 - 3, 0) / 4
            lam = (np1[w1] * 3) / 4
            s += (disc + lam * (nn1[w2] / tot)) / pc[w1]
        assert abs(s - 1.0) < 1e-9, (w1, s)


# ---------------------------------------------------------------------------
# Bloom decontamination: one-sided error, exact-column agreement
# ---------------------------------------------------------------------------


def test_bloom_contamination_is_one_sided_and_nonvacuous(spark):
    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        contamination_bloom,
    )

    rows = contamination_bloom(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["n_bloom"] >= r["n_exact"] >= 0  # never a false negative
        assert r["fp_grams"] == r["n_bloom"] - r["n_exact"]
    # the filter is sized so the FIXTURE exercises the FP path: if this
    # starts failing the bloom has gone vacuous (exact-equal) and the
    # oracle no longer value-checks the interesting branch
    assert sum(r["fp_grams"] for r in rows) > 0


def test_bloom_exact_column_agrees_with_exact_entry(spark):
    # same split + gram semantics as contamination_ngram by import,
    # so the exact columns must coincide doc for doc
    from postgres_opensearch_cdc_spark.queries.training_pipeline import (
        contamination_ngram,
    )
    from postgres_opensearch_cdc_spark.queries.training_pipeline5 import (
        contamination_bloom,
    )

    exact = {
        r["doc_id"]: r["n_shared_grams"]
        for r in contamination_ngram(spark, SF).collect()
    }
    bloom = {
        r["doc_id"]: r["n_exact"]
        for r in contamination_bloom(spark, SF).collect()
        if r["n_exact"] > 0
    }
    assert bloom == exact


# ---------------------------------------------------------------------------
# Weighted sampling: probability-proportional-to-size behavior
# ---------------------------------------------------------------------------


def test_weighted_sampling_favors_heavy_items():
    # Efraimidis-Spirakis with the derandomized hash draw: across many
    # salts, an item with 10x the weight must be selected much more
    # often than a light one (exact inclusion probs are complex; the
    # monotone trend is the contract worth pinning).
    import hashlib as hl
    import math

    items = [("heavy", 1000)] + [(f"light{i}", 100) for i in range(19)]
    wins = {name: 0 for name, _ in items}
    for salt in range(300):
        keyed = []
        for name, w in items:
            h = int(hl.md5(f"{name}:{salt}".encode()).hexdigest()[:15],
                    16)
            u = (h + 1) / float(1 << 60)
            keyed.append((math.log(u) / w, name))
        top = {n for _, n in sorted(keyed, reverse=True)[:5]}
        for n in top:
            wins[n] += 1
    light_mean = sum(v for k, v in wins.items()
                     if k.startswith("light")) / 19
    assert wins["heavy"] > 2.5 * light_mean
    # and the deterministic fixed-salt draw is reproducible
    assert wins["heavy"] <= 300
