"""Reference-model and property tests for training-pipeline batch 9
(HLL intersection, Neyman allocation, MIPS reduction)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.queries.training_pipeline9 import (
    MIPS_K,
    NEYMAN_BUDGET,
    ann_mips_topk,
    sample_neyman_allocation,
    sketch_hll_intersection,
)
from postgres_opensearch_cdc_spark.registry import load_table


# ---------------------------------------------------------------------------
# HLL intersection
# ---------------------------------------------------------------------------


def test_hll_intersection_identity_and_disjoint(spark):
    """Inclusion-exclusion endpoints: identical sets estimate their
    own cardinality (union registers == each side's registers), and
    disjoint sets clamp at >= 0 (the known negative-drift caveat)."""
    from postgres_opensearch_cdc_spark.functions.sketch import (
        hll_estimates,
        hll_registers,
    )

    same = spark.createDataFrame(
        [(s, f"v{i}") for s in ("a", "b") for i in range(300)],
        "source string, w string",
    )
    regs = hll_registers(same, group_col="source")
    est = {r["g"]: r["hll_est"] for r in hll_estimates(regs).collect()}
    # identical inputs -> identical registers -> est(A∪B) = est(A)
    assert est["a"] == est["b"]
    # inter_est = ea + eb - eu = est(A) exactly when A == B
    merged = regs.groupBy("bucket").agg(
        F.max("register").alias("register")
    ).withColumn("g", F.lit("u"))
    eu = hll_estimates(merged).head()["hll_est"]
    assert abs((est["a"] + est["b"] - eu) - est["a"]) < 1e-9


def test_hll_intersection_entry_properties(spark, sf_dir):
    rows = sketch_hll_intersection(spark, sf_dir).collect()
    assert rows, "source pairs expected"
    for r in rows:
        assert r["inter_est"] >= 0.0  # clamped
        # inclusion-exclusion identity on the reported columns
        raw = r["est_a"] + r["est_b"] - r["est_union"]
        assert abs(max(raw, 0.0) - r["inter_est"]) < 5e-6
        # union estimate is at least each side's (max-merge grows
        # registers monotonically)
        assert r["est_union"] >= max(r["est_a"], r["est_b"]) - 1e-9


# ---------------------------------------------------------------------------
# Neyman allocation
# ---------------------------------------------------------------------------


def test_neyman_matches_python_reference(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", "n_chars"
    ).collect()
    strata: dict = {}
    for r in docs:
        strata.setdefault(r["lang"], []).append(r["n_chars"])
    wq = {}
    for lang, xs in strata.items():
        n = len(xs)
        var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (
            float(n) * n
        )
        wq[lang] = n * math.floor(1e6 * math.sqrt(max(var, 0.0)))
    wtot = sum(wq.values())
    expect = {
        lang: min(
            len(strata[lang]),
            max(1, math.floor(NEYMAN_BUDGET * float(w) / float(wtot))),
        )
        for lang, w in wq.items()
    }
    got = sample_neyman_allocation(spark, sf_dir)
    alloc = {
        r["lang"]: r["alloc"]
        for r in got.select("lang", "alloc").distinct().collect()
    }
    assert alloc == expect
    # the sample actually honors the allocation per stratum
    counts = {
        r["lang"]: r["n"]
        for r in got.groupBy("lang").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert counts == expect


def test_neyman_zero_variance_falls_back_to_equal_split(spark, tmp_path):
    """Every stratum constant-length -> w_tot = 0; the guarded
    fallback allocates the equal split instead of letting a 0/0 NaN
    flow engine-dependently through floor/least (review finding)."""
    import duckdb
    import pandas as pd

    from postgres_opensearch_cdc_spark.queries.training_pipeline9 import (
        ORACLE,
    )

    rows = []
    for lang, n in (("aa", 30), ("bb", 70)):
        for i in range(n):
            rows.append((len(rows), "x y z", lang, "s", 5))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = sample_neyman_allocation(spark, str(tmp_path))
    alloc = {
        r["lang"]: r["alloc"]
        for r in got.select("lang", "alloc").distinct().collect()
    }
    assert alloc == {"aa": 30, "bb": 50}  # floor(100/2)=50, capped at N_h
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{tmp_path}/documents.parquet'"
    )
    oracle = con.execute(ORACLE["sample_neyman_allocation"]).fetchall()
    assert len(oracle) == got.count()


def test_neyman_budget_and_bounds(spark, sf_dir):
    got = sample_neyman_allocation(spark, sf_dir)
    per = got.select("lang", "alloc").distinct().collect()
    n_strata = len(per)
    total = sum(r["alloc"] for r in per)
    # floor() under-shoots, max(1,·) over-shoots: both bounded
    assert total <= NEYMAN_BUDGET + n_strata
    assert all(r["alloc"] >= 1 for r in per)


# ---------------------------------------------------------------------------
# MIPS reduction
# ---------------------------------------------------------------------------


def test_mips_ranking_matches_exact_inner_product(spark, sf_dir):
    vecs = load_table(spark, sf_dir, "embeddings").collect()
    q = next(list(r["embedding"]) for r in vecs if r["vec_id"] == 0)
    mips = sorted(
        (
            (
                -sum(float(a) * float(b) for a, b in zip(r["embedding"], q)),
                r["vec_id"],
            )
            for r in vecs
            if r["vec_id"] != 0
        )
    )[:MIPS_K]
    expect_ids = [vid for _, vid in mips]
    got = ann_mips_topk(spark, sf_dir).collect()
    assert [r["vec_id"] for r in got] == expect_ids
    # the reduction's invariant: mips_cos == mip / (M * |q|), so the
    # two score columns are a positive affine map of each other —
    # check monotonicity across the returned rows
    pairs = [(r["mip"], r["mips_cos"]) for r in got]
    for (m1, c1), (m2, c2) in zip(pairs, pairs[1:]):
        assert (m1 >= m2) == (c1 >= c2) or abs(m1 - m2) < 2e-6


# ---------------------------------------------------------------------------
# Greedy k-center coreset
# ---------------------------------------------------------------------------


def test_kcenter_matches_python_greedy(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.training_pipeline9 import (
        KCENTER_K,
        coreset_kcenter_greedy,
    )

    vecs = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def d2(a, b):
        # same dot-composition as the entry: vv - 2*vb + bb
        def dot_(x, y):
            acc = 0.0
            for p, q in zip(x, y):
                acc += p * q
            return acc

        return dot_(a, a) - 2.0 * dot_(a, b) + dot_(b, b)

    first = min(vecs)
    chosen = [(0, first, None)]
    mind = {
        vid: d2(v, vecs[first]) for vid, v in vecs.items() if vid != first
    }
    for t in range(1, KCENTER_K):
        pick = max(mind.items(), key=lambda kv: (kv[1], -kv[0]))[0]
        chosen.append((t, pick, mind[pick]))
        c = vecs[pick]
        del mind[pick]
        for vid in mind:
            mind[vid] = min(mind[vid], d2(vecs[vid], c))
    got = coreset_kcenter_greedy(spark, sf_dir).collect()
    assert [(r["sel_round"], r["vec_id"]) for r in got] == [
        (t, vid) for t, vid, _ in chosen
    ]
    # radii are non-increasing after round 1 (coverage shrinks)
    radii = [r["radius"] for r in got if r["radius"] is not None]
    assert all(a >= b for a, b in zip(radii, radii[1:]))


# ---------------------------------------------------------------------------
# Cohen's kappa agreement
# ---------------------------------------------------------------------------


def test_kappa_matches_python_reference(spark, sf_dir):
    from postgres_opensearch_cdc_spark.queries.training_pipeline9 import (
        quality_label_agreement_kappa,
    )

    got = quality_label_agreement_kappa(spark, sf_dir).head()
    n = got["n_docs"]
    assert n == (
        got["n_both_pass"] + got["n_both_fail"]
        + got["n_rules_only"] + got["n_score_only"]
    )
    po = (got["n_both_pass"] + got["n_both_fail"]) / n
    pe = (
        (got["n_both_pass"] + got["n_rules_only"])
        * (got["n_both_pass"] + got["n_score_only"])
        + (got["n_both_fail"] + got["n_rules_only"])
        * (got["n_both_fail"] + got["n_score_only"])
    ) / (n * n)
    assert abs(got["observed_agreement"] - po) < 5e-6
    assert abs(got["chance_agreement"] - pe) < 5e-6
    if pe < 1.0:
        assert abs(got["kappa"] - (po - pe) / (1 - pe)) < 5e-6
    assert -1.0 <= got["kappa"] <= 1.0


def test_mips_plan_is_scan_plus_topk(spark, sf_dir):
    from tests.test_plans import plan

    p = plan(ann_mips_topk(spark, sf_dir))
    assert "TakeOrderedAndProject" in p
    assert "BatchEvalPython" not in p


def test_mips_and_kcenter_guard_degenerate_fixtures(spark, tmp_path):
    """r13 ADVICE: .head() on a fixture missing vec_id 0 (or an empty
    embeddings table) must raise a descriptive error, not a NoneType
    subscript."""
    import pytest

    from postgres_opensearch_cdc_spark.queries.training_pipeline9 import (
        coreset_kcenter_greedy,
    )

    no_zero = spark.createDataFrame(
        [(7, [1.0, 0.0], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    d = str(tmp_path / "no_zero")
    no_zero.write.parquet(f"{d}/embeddings.parquet")
    with pytest.raises(ValueError, match="vec_id=0 not found"):
        ann_mips_topk(spark, d)

    empty = no_zero.limit(0)
    d2 = str(tmp_path / "empty")
    empty.write.parquet(f"{d2}/embeddings.parquet")
    with pytest.raises(ValueError, match="embeddings: .*is empty"):
        coreset_kcenter_greedy(spark, d2)

    # fewer rows than KCENTER_K: loud at the round that runs dry
    d3 = str(tmp_path / "tiny")
    spark.createDataFrame(
        [(i, [float(i), 1.0], 0) for i in range(3)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{d3}/embeddings.parquet")
    with pytest.raises(ValueError, match="ran out of vectors"):
        coreset_kcenter_greedy(spark, d3)
