"""Reference-model and property tests for training-pipeline batch 7
(label propagation, DP count release, Zipf fit)."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline7 import (
    DP_EPS,
    DP_SALT,
    LPA_ITERS,
    ZIPF_QUANT,
    dp_noised_counts,
    label_propagation,
    vocab_zipf_fit,
)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# Label propagation
# ---------------------------------------------------------------------------


def _ref_lpa(edges, iters=LPA_ITERS):
    und = set()
    for a, b in edges:
        if a != b:
            und.add((a, b))
            und.add((b, a))
    nodes = sorted({u for e in und for u in e})
    nbrs: dict = {}
    for a, b in und:
        nbrs.setdefault(b, []).append(a)  # b adopts from its sources
    label = {w: w for w in nodes}
    for _ in range(iters):
        nxt = {}
        for v in nodes:
            cnt = Counter(label[u] for u in nbrs.get(v, []))
            if cnt:
                top = max(cnt.values())  # most frequent, tie -> smallest
                nxt[v] = min(l for l, n in cnt.items() if n == top)
            else:
                nxt[v] = label[v]
        label = nxt
    return label


def _spark_lpa(spark, edges):
    e = spark.createDataFrame(edges, "src string, dst string")
    nodes = (
        e.select(F.col("src").alias("w"))
        .unionByName(e.select(F.col("dst").alias("w")))
        .distinct()
    )
    return {
        r["w"]: r["label"]
        for r in label_propagation(e, nodes).collect()
    }


def test_lpa_matches_reference_model(spark):
    edges = [
        # two dense triangles bridged by one edge
        ("a", "b"), ("b", "c"), ("c", "a"),
        ("x", "y"), ("y", "z"), ("z", "x"),
        ("c", "x"),
        # a pendant
        ("z", "pend"),
    ]
    assert _spark_lpa(spark, edges) == _ref_lpa(edges)


def test_lpa_two_cliques_converge_to_two_communities(spark):
    k1 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    k2 = [(a, b) for a in "mnop" for b in "mnop" if a < b]
    got = _spark_lpa(spark, k1 + k2 + [("d", "m")])
    # each clique collapses to one label; the bridge does not merge them
    labels1 = {got[c] for c in "abcd"}
    labels2 = {got[c] for c in "mnop"}
    assert len(labels1) == 1 and len(labels2) == 1
    assert labels1 != labels2


def test_lpa_is_deterministic_across_runs(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("b", "d")]
    assert _spark_lpa(spark, edges) == _spark_lpa(spark, edges)


# ---------------------------------------------------------------------------
# DP release
# ---------------------------------------------------------------------------


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def test_dp_noise_matches_inverse_cdf_reference(spark):
    rows = dp_noised_counts(spark, SF).collect()
    assert rows
    for r in rows:
        u = _h60(f"{r['source']}:{r['lang']}:{DP_SALT}") / float(1 << 60)
        c = u - 0.5
        want = -(1.0 / DP_EPS) * math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c)) if c != 0 else 0.0
        assert r["noise"] == pytest.approx(round(want, 6), abs=1e-6)
        assert r["released"] == pytest.approx(
            round(r["true_count"] + want, 6), abs=1e-6
        )


def test_dp_noise_distribution_is_laplace_shaped():
    """Inverse-CDF sanity over the derandomized uniform family: median
    ~0, mean |noise| ~ 1/eps (Laplace b = 1/eps), symmetric tails."""
    draws = []
    for i in range(4000):
        u = _h60(f"probe:{i}:{DP_SALT}") / float(1 << 60)
        c = u - 0.5
        draws.append(-math.copysign(1.0, c) * math.log(1.0 - 2.0 * abs(c)))
    n = len(draws)
    assert abs(sorted(draws)[n // 2]) < 0.05             # median ≈ 0
    assert abs(sum(map(abs, draws)) / n - 1.0) < 0.05    # E|x| = b = 1
    assert abs(sum(1 for d in draws if d > 0) / n - 0.5) < 0.03


def test_dp_epsilon_scales_noise():
    # the mechanism's b = 1/eps: doubling eps halves every noise value
    # (pure algebra on the same u draws — pinned so a refactor can't
    # silently decouple eps from the released numbers)
    for i in range(50):
        u = _h60(f"e:{i}:{DP_SALT}") / float(1 << 60)
        c = u - 0.5
        n1 = -(1.0 / 1.0) * math.copysign(1.0, c) * math.log(1 - 2 * abs(c))
        n2 = -(1.0 / 2.0) * math.copysign(1.0, c) * math.log(1 - 2 * abs(c))
        assert n2 == pytest.approx(n1 / 2)


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------


def test_zipf_fit_matches_numpy_reference(spark, sf_dir):
    from postgres_opensearch_cdc_spark.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    freqs = (
        docs.select(
            F.explode(F.split(F.lower(F.col("text")), r"\s+")).alias("w")
        )
        .filter(F.length("w") > 0)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("f"))
        .collect()
    )
    ranked = sorted(freqs, key=lambda r: (-r["f"], r["w"]))
    xs = [math.floor(ZIPF_QUANT * math.log(i + 1)) for i in range(len(ranked))]
    ys = [math.floor(ZIPF_QUANT * math.log(r["f"])) for r in ranked]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    got = vocab_zipf_fit(spark, sf_dir).head()
    assert got["vocab_size"] == n
    assert got["zipf_slope"] == pytest.approx(round(slope, 6), abs=1e-6)


def test_zipf_slope_is_negative_and_sane(spark, sf_dir):
    got = vocab_zipf_fit(spark, sf_dir).head()
    assert -3.0 < got["zipf_slope"] < 0.0


def test_zipf_fit_large_vocab_no_int64_overflow(spark, tmp_path):
    """Regression for the round-12 ADVICE finding: with Q=10^6
    micro-nats, n·Σxy overflows int64 once the vocabulary passes ~600
    distinct words (the sf fixtures hold ~31, so sweeps can't catch
    it) — under ANSI mode that's a runtime throw, and the old BIGINT
    casts in the oracle overflowed past ~10^4. The decimal128
    cross-product path must survive a 3,000-word vocabulary and match
    (a) an exact Python-bigint reference and (b) the DuckDB oracle."""
    import duckdb
    import pandas as pd

    from postgres_opensearch_cdc_spark.queries.training_pipeline7 import (
        ORACLE,
    )

    n_words = 3000
    texts = [
        " ".join([f"w{i:05d}"] * (1 + n_words // (i + 1)))
        for i in range(n_words)
    ]
    pd.DataFrame(
        {
            "doc_id": range(n_words),
            "text": texts,
            "lang": "en",
            "source": "synthetic",
            "n_chars": [len(t) for t in texts],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    got = vocab_zipf_fit(spark, str(tmp_path)).head()
    assert got["vocab_size"] == n_words

    # exact reference in Python bigints (never overflows)
    freqs = sorted(
        ((1 + n_words // (i + 1)), f"w{i:05d}") for i in range(n_words)
    )
    freqs.sort(key=lambda t: (-t[0], t[1]))
    xs = [math.floor(ZIPF_QUANT * math.log(r + 1)) for r in range(n_words)]
    ys = [math.floor(ZIPF_QUANT * math.log(f)) for f, _ in freqs]
    n, sx, sy = n_words, sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    assert n * sxy > (1 << 63) - 1  # the fixture really does exceed int64
    slope = float(n * sxy - sx * sy) / float(n * sxx - sx * sx)
    assert got["zipf_slope"] == pytest.approx(round(slope, 6), abs=1e-6)

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle = con.execute(ORACLE["vocab_zipf_fit"]).fetchone()
    assert oracle[0] == n_words
    assert f"{got['zipf_slope']:.6f}" == f"{oracle[1]:.6f}"
    assert f"{got['ln_c_intercept']:.6f}" == f"{oracle[2]:.6f}"


def test_zipf_perfect_power_law_recovers_exponent():
    # freq = 1000 / rank  =>  slope exactly -1 up to quantization
    xs = [math.floor(ZIPF_QUANT * math.log(r)) for r in range(1, 40)]
    ys = [
        math.floor(ZIPF_QUANT * math.log(round(10000 / r)))
        for r in range(1, 40)
    ]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert slope == pytest.approx(-1.0, abs=0.01)


def test_heaps_beta_is_in_natural_range(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.training_pipeline7 import (
        vocab_heaps_fit,
    )

    got = vocab_heaps_fit(spark, sf_dir).head()
    # the synthetic corpus draws from a small closed vocabulary, so
    # beta sits near 0 (vocab saturates) — assert the fit is a real
    # number in [0, 1) and n_sources matches the corpus
    assert got["n_sources"] == 20
    assert 0.0 <= got["heaps_beta"] < 1.0
