"""Reference-model and property tests for training-pipeline batch 6
(HLL registers, KMV sketches, fixed-point PageRank, unigram Viterbi)
— pure-Python reimplementations pin the math the DuckDB oracles
value-check, plus the guarantees the oracles cannot express:
sketch MERGEABILITY (the property that makes them 100 TB-shaped),
PageRank mass conservation, and the Viterbi DP's agreement with
brute-force enumeration over all segmentations."""

from __future__ import annotations

import hashlib
import itertools
import math

import pytest

from postgres_opensearch_cdc_spark.queries.training_pipeline6 import (
    HLL_M,
    HLL_RHO_MAX,
    HLL_SUFFIX_BITS,
    KMV_K,
    PR_ITERS,
    PR_SCALE,
    hll_registers,
    kmv_sketches,
    pagerank_fixed_point,
    unigram_vocab,
    viterbi_segment,
)

SF = "/root/testdata/sf0.001"


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# HLL registers: reference model + mergeability
# ---------------------------------------------------------------------------


def _ref_registers(values: list[str]) -> dict[int, int]:
    regs: dict[int, int] = {}
    for v in values:
        h = _h60(v)
        bucket = h >> HLL_SUFFIX_BITS
        suffix = h % (1 << HLL_SUFFIX_BITS)
        rho = HLL_RHO_MAX if suffix == 0 else HLL_RHO_MAX - suffix.bit_length()
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _collect_regs(spark, rows):
    df = spark.createDataFrame(rows, "source string, w string")
    return {
        (r["g"], r["bucket"]): r["register"]
        for r in hll_registers(df).collect()
    }


def test_hll_registers_match_reference(spark):
    vals = [f"v{i}" for i in range(200)]
    got = _collect_regs(spark, [("s", v) for v in vals])
    want = _ref_registers(vals)
    assert got == {("s", b): r for b, r in want.items()}


def test_hll_registers_merge_as_elementwise_max(spark):
    """The 100 TB property: registers of a union are the elementwise
    max of the parts' registers — partial sketches from any
    partitioning combine without rescanning."""
    a = [f"a{i}" for i in range(150)]
    b = [f"b{i}" for i in range(150)]
    ra = _ref_registers(a)
    rb = _ref_registers(b)
    ru = _ref_registers(a + b)
    merged = {
        k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)
    }
    assert merged == ru
    got = _collect_regs(spark, [("u", v) for v in a + b])
    assert got == {("u", b_): r for b_, r in ru.items()}


def test_hll_multi_column_group_keys_stay_separate(spark):
    """Regression for the round-12 ADVICE finding: a source name
    containing the old '/' pack separator must survive a multi-column
    group key intact (no string packing/re-splitting anywhere)."""
    rows = [("a/b", "word", f"v{i}") for i in range(40)] + [
        ("a", "b/word", f"v{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, "source string, domain string, w string")
    regs = hll_registers(df, group_cols=["source", "domain"])
    assert regs.columns[:2] == ["source", "domain"]
    got = {
        (r["source"], r["domain"]) for r in regs.select(
            "source", "domain").distinct().collect()
    }
    assert got == {("a/b", "word"), ("a", "b/word")}
    from postgres_opensearch_cdc_spark.functions.sketch import hll_estimates

    est = hll_estimates(regs, group_cols=["source", "domain"])
    by_key = {
        (r["source"], r["domain"]): r["sum_num"] for r in est.collect()
    }
    assert len(by_key) == 2
    # both groups saw the same 40 values -> identical registers
    assert by_key[("a/b", "word")] == by_key[("a", "b/word")]


def test_hll_duplicates_do_not_move_registers(spark):
    vals = [f"v{i}" for i in range(50)]
    once = _collect_regs(spark, [("s", v) for v in vals])
    thrice = _collect_regs(spark, [("s", v) for v in vals * 3])
    assert once == thrice


def test_hll_estimate_accuracy_reference():
    """At m=16 the relative error bound is ~1.04/sqrt(16) = 26%;
    assert the estimator lands inside 3x that on a 500-value set
    (deterministic hash family, so this can never flake)."""
    vals = [f"item-{i}" for i in range(500)]
    regs = _ref_registers(vals)
    sum_num = sum(
        1 << (HLL_RHO_MAX - regs.get(b, 0)) for b in range(HLL_M)
    )
    est = 0.673 * HLL_M * HLL_M * float(1 << HLL_RHO_MAX) / sum_num
    assert abs(est - 500) / 500 < 0.78


# ---------------------------------------------------------------------------
# KMV: exactness below k, mergeability, estimator sanity
# ---------------------------------------------------------------------------


def test_kmv_sketch_is_bottom_k(spark):
    vals = [f"x{i}" for i in range(60)]
    df = spark.createDataFrame(
        [("s", v) for v in vals], "source string, w string"
    )
    got = sorted(r["h"] for r in kmv_sketches(df).collect())
    want = sorted(_h60(v) for v in set(vals))[:KMV_K]
    assert got == want


def test_kmv_merge_is_bottom_k_of_concat():
    """Sketch of a union == bottom-k of the two sketches' hashes —
    the mergeability that lets per-shard sketches combine at the
    coordinator without touching the shards again."""
    a = {f"a{i}" for i in range(40)}
    b = {f"b{i}" for i in range(40)}
    ska = sorted(_h60(v) for v in a)[:KMV_K]
    skb = sorted(_h60(v) for v in b)[:KMV_K]
    sku = sorted(_h60(v) for v in a | b)[:KMV_K]
    assert sorted(ska + skb)[:KMV_K] == sku


def test_kmv_distinct_estimate_exact_below_k():
    vals = [f"y{i}" for i in range(KMV_K - 3)]
    hashes = sorted(_h60(v) for v in vals)
    # fewer than k hashes: the sketch IS the set
    assert len(hashes) == KMV_K - 3


def test_kmv_jaccard_estimator_reference():
    """Bottom-k of the union sampled from both sketches estimates
    Jaccard; with the deterministic hash family the estimate on a
    60/40 overlap set is fixed — pin it close to truth."""
    a = {f"common{i}" for i in range(30)} | {f"a{i}" for i in range(20)}
    b = {f"common{i}" for i in range(30)} | {f"b{i}" for i in range(20)}
    ska = dict.fromkeys(sorted(_h60(v) for v in a)[:KMV_K])
    skb = dict.fromkeys(sorted(_h60(v) for v in b)[:KMV_K])
    union_sample = sorted(set(ska) | set(skb))[:KMV_K]
    matches = sum(1 for h in union_sample if h in ska and h in skb)
    est = matches / len(union_sample)
    true = len(a & b) / len(a | b)
    assert abs(est - true) <= 0.25


# ---------------------------------------------------------------------------
# Fixed-point PageRank
# ---------------------------------------------------------------------------


def _ref_pagerank(edges: list[tuple[str, str]], iters: int = PR_ITERS):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    out: dict[str, list[str]] = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    rank = {w: PR_SCALE // n for w in nodes}
    for _ in range(iters):
        dsum = sum(r for w, r in rank.items() if w not in out)
        base = (3 * PR_SCALE) // (20 * n) + (17 * dsum) // (20 * n)
        nxt = {w: base for w in nodes}
        for u, targets in out.items():
            c = (rank[u] * 17) // (20 * len(targets))
            for v in targets:
                nxt[v] += c
        rank = nxt
    return rank


def _spark_pagerank(spark, edges):
    e = spark.createDataFrame(edges, "src string, dst string")
    nodes = (
        e.select(e.src.alias("w"))
        .unionByName(e.select(e.dst.alias("w")))
        .distinct()
    )
    return {
        r["w"]: r["rank"]
        for r in pagerank_fixed_point(e.distinct(), nodes).collect()
    }


def test_pagerank_matches_reference_model(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"), ("e", "a"), ("e", "d"),  # f only as a sink
        ("b", "f"),
    ]
    assert _spark_pagerank(spark, edges) == _ref_pagerank(edges)


def test_pagerank_cycle_is_uniform(spark):
    """On a directed cycle every node keeps exactly the same rank —
    any asymmetry would expose order- or partition-dependence."""
    cyc = [("n0", "n1"), ("n1", "n2"), ("n2", "n3"), ("n3", "n0")]
    ranks = _spark_pagerank(spark, cyc)
    assert len(set(ranks.values())) == 1


def test_pagerank_mass_is_conserved_up_to_floor_loss():
    """Integer floors only ever LOSE mass: total rank stays within
    N * iters units below PR_SCALE and never above it."""
    edges = [(f"w{i}", f"w{(i * 7 + 1) % 23}") for i in range(23)]
    rank = _ref_pagerank(edges)
    total = sum(rank.values())
    n = len(rank)
    assert total <= PR_SCALE
    # each node can floor-lose <1 unit per term, 3 terms per iteration
    assert total >= PR_SCALE - 3 * n * (PR_ITERS + 1) * 20


def test_pagerank_dangling_sink_outranks_its_feeders():
    """A dangling node fed by everyone collects more rank than any
    single feeder; its mass re-enters through the dangling term
    (which the fixed-point iteration redistributes uniformly)."""
    edges = [("a", "sink"), ("b", "sink"), ("c", "sink"), ("a", "b")]
    rank = _ref_pagerank(edges)
    assert rank["sink"] > rank["b"] > rank["c"]


# ---------------------------------------------------------------------------
# Unigram Viterbi segmentation
# ---------------------------------------------------------------------------


def _brute_force(word: str, table: dict[str, int]):
    """Enumerate every segmentation; argmax on (score, seg-string) —
    the spec the DP must match (and what the recursive-CTE oracle
    evaluates in SQL)."""
    best = None
    nmax = max(len(p) for p in table)

    def rec(pos: int, score: int, parts: list[str]):
        nonlocal best
        if pos == len(word):
            seg = "|".join(parts)
            cand = (score, seg)
            if best is None or cand > best:
                best = cand
            return
        for L in range(1, min(nmax, len(word) - pos) + 1):
            p = word[pos:pos + L]
            if p in table:
                rec(pos + L, score + table[p], parts + [p])

    rec(0, 0, [])
    return best


def _segment(spark, words: list[str], vocab: dict[str, int]):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    return {
        r["w"]: (r["best_score"], r["seg"], r["n_pieces"])
        for r in viterbi_segment(df, list(vocab.items())).collect()
    }


def test_viterbi_matches_brute_force_on_corpus_vocab(spark, sf_dir):
    """The full-circle check: induce the real corpus vocabulary, then
    verify the Arrow DP equals exhaustive enumeration word by word."""
    from postgres_opensearch_cdc_spark.registry import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents")
    words_df = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    vocab = {
        r["p"]: r["score"] for r in unigram_vocab(words_df).collect()
    }
    words = [r["w"] for r in words_df.collect()]
    got = _segment(spark, words, vocab)
    for w in words:
        want = _brute_force(w, vocab)
        assert got[w][:2] == want, w
        assert got[w][2] == want[1].count("|") + 1


def test_viterbi_single_char_vocab_segments_per_char(spark):
    vocab = {c: -100 for c in "abc"}
    got = _segment(spark, ["abcab"], vocab)
    assert got["abcab"] == (-500, "a|b|c|a|b", 5)


def test_viterbi_prefers_higher_total_score(spark):
    # "ab" piece is cheap enough that one piece beats two singles
    vocab = {"a": -10, "b": -10, "ab": -15}
    got = _segment(spark, ["ab"], vocab)
    assert got["ab"] == (-15, "ab", 1)
    # now make the pair expensive: two singles win
    vocab2 = {"a": -10, "b": -10, "ab": -25}
    got2 = _segment(spark, ["ab"], vocab2)
    assert got2["ab"] == (-20, "a|b", 2)


def test_viterbi_tiebreak_is_lexicographically_greatest(spark):
    # both segmentations score -20; '|' > letters, so "a|b" > "ab"
    vocab = {"a": -10, "b": -10, "ab": -20}
    got = _segment(spark, ["ab"], vocab)
    assert got["ab"] == (-20, "a|b", 2)


def test_viterbi_unsegmentable_word_yields_nulls(spark):
    vocab = {"a": -1}
    got = _segment(spark, ["ax"], vocab)
    assert got["ax"] == (None, None, None)


def test_viterbi_tiebreak_composes_under_extension():
    """The docstring's composability claim: if partial segs s1 > s2
    cover the same prefix, appending a common suffix never flips the
    comparison — exhaustively over short strings."""
    for chars in itertools.product("ab", repeat=4):
        w = "".join(chars)
        # all 2^(n-1) segmentations of w
        segs = []
        for mask in range(1 << (len(w) - 1)):
            parts, start = [], 0
            for i in range(len(w) - 1):
                if mask & (1 << i):
                    parts.append(w[start:i + 1])
                    start = i + 1
            parts.append(w[start:])
            segs.append("|".join(parts))
        for s1, s2 in itertools.combinations(segs, 2):
            if s1 == s2:
                continue
            hi, lo = (s1, s2) if s1 > s2 else (s2, s1)
            for suffix in ("", "|c", "x", "|zz"):
                assert (hi + suffix) > (lo + suffix), (hi, lo, suffix)


def test_hll_estimator_edge_cases(spark):
    """Estimator branch edges: a group whose every register is
    present (zero_registers = 0 must NEVER take linear counting, even
    when raw_est is small) and a single-value group (15 zero
    registers, LC branch, estimate near 1)."""
    from pyspark.sql import functions as F

    from postgres_opensearch_cdc_spark.functions.sketch import (
        HLL_M,
        HLL_RHO_MAX,
        hll_estimates,
        hll_registers,
    )

    # synthetic register table: group "full" has all m registers at a
    # high rho (tiny sum_num -> raw_est large), group "low" has all m
    # registers at rho 1 (sum_num = m * 2^(RHO_MAX-1) -> raw_est
    # small but V = 0, so the raw branch must hold)
    full = [("full", b, 30) for b in range(HLL_M)]
    low = [("low", b, 1) for b in range(HLL_M)]
    regs = spark.createDataFrame(
        full + low, "g string, bucket long, register int"
    )
    est = {r["g"]: r for r in hll_estimates(regs).collect()}
    assert est["full"]["zero_registers"] == 0
    assert not est["full"]["used_linear_counting"]
    assert est["low"]["zero_registers"] == 0
    assert not est["low"]["used_linear_counting"]
    assert est["low"]["raw_est"] == est["low"]["hll_est"]

    # real single-value group: exactly one register set -> LC branch
    one = spark.createDataFrame([("g1", "only")], "source string, w string")
    est1 = hll_estimates(hll_registers(one)).head()
    assert est1["zero_registers"] == HLL_M - 1
    assert est1["used_linear_counting"]
    # m * ln(m / (m-1)) ~ 1.03 for m=16
    assert 0.5 < est1["hll_est"] < 2.0
