"""Production-size sketch tests (round-12 verdict ask #6): the oracle
entries run HLL at p=4 / CMS at 4x256 so the tiny fixtures exercise
every estimator branch; these tests pin that the SAME kernels hold at
the documented production sizes — HLL p=14 (16 KiB/group) and CMS
width 2^16 — including the int64 exactness argument
(sum_num <= m · 2^rho_max = 2^61 < 2^63 at every p)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.functions.sketch import (
    hll_estimates,
    hll_params,
    hll_registers,
)

P_PROD = 14


def test_hll_int64_bound_holds_at_every_precision():
    """The harmonic-mean denominator bound is precision-invariant:
    m · 2^rho_max = 2^p · 2^(61-p) = 2^61 < 2^63 for all p."""
    for p in (4, 10, 14, 16):
        m, suffix_bits, rho_max, alpha = hll_params(p)
        assert m == 1 << p
        assert rho_max == 61 - p
        assert m * (1 << rho_max) == 1 << 61 < 1 << 63
        assert 0.6 < alpha < 0.73


def _regs(spark, values, p):
    df = spark.createDataFrame(
        [("s", v) for v in values], "source string, w string"
    )
    return hll_registers(df, group_col="source", p=p)


def test_hll_p14_harmonic_branch_accuracy(spark):
    """50k distinct values at p=14: raw_est > 2.5m so the harmonic
    branch runs; relative error bound is 1.04/sqrt(16384) = 0.8%,
    assert within 3x that. sum_num must sit under the exact-int64
    ceiling 2^61."""
    n = 50_000
    est = hll_estimates(
        _regs(spark, (f"v{i}" for i in range(n)), P_PROD), p=P_PROD
    ).head()
    assert est["sum_num"] <= 1 << 61
    assert not est["used_linear_counting"]
    assert abs(est["hll_est"] - n) / n < 0.025


def test_hll_p14_linear_counting_branch_accuracy(spark):
    """1k distinct values at p=14: raw_est << 2.5m = 40960 and most
    registers are zero, so linear counting runs — and at this load
    factor it is near-exact."""
    n = 1_000
    est = hll_estimates(
        _regs(spark, (f"x{i}" for i in range(n)), P_PROD), p=P_PROD
    ).head()
    assert est["used_linear_counting"]
    assert abs(est["hll_est"] - n) / n < 0.02


def test_hll_p14_registers_merge_as_elementwise_max(spark):
    """Mergeability is precision-independent: the p=14 register table
    of a union equals the elementwise max of the parts' tables."""
    a = [f"a{i}" for i in range(2_000)]
    b = [f"b{i}" for i in range(2_000)]

    def collect(vals):
        return {
            r["bucket"]: r["register"]
            for r in _regs(spark, vals, P_PROD).collect()
        }

    ra, rb, ru = collect(a), collect(b), collect(a + b)
    merged = {k: max(ra.get(k, 0), rb.get(k, 0)) for k in set(ra) | set(rb)}
    assert merged == ru


def test_cms_production_width_is_near_exact_and_guarded(spark, tmp_path):
    """CMS at width 2^16: a 500-distinct-value stream collides almost
    nowhere, so min-over-rows estimates are exact for (deterministic
    hash family) all probes; the one-sided >= contract holds
    regardless; and a reopen under a different geometry refuses."""
    from postgres_opensearch_cdc_spark.streaming.sketch import CmsRollupSink

    sink = CmsRollupSink(path=str(tmp_path / "cms"), width=1 << 16)
    rows = [(f"u{i}",) for i in range(500) for _ in range((i % 7) + 1)]
    batch = spark.createDataFrame(rows, "v string")
    sink.apply_batch(batch, batch_id=0, writer_id="w1")

    probes = spark.createDataFrame(
        [(f"u{i}", (i % 7) + 1) for i in range(500)], "v string, true long"
    )
    got = {
        r["v"]: r["cm_est"]
        for r in sink.estimates(probes.select("v")).collect()
    }
    exact = 0
    for r in probes.collect():
        assert got[r["v"]] >= r["true"]  # one-sided always
        exact += got[r["v"]] == r["true"]
    assert exact >= 495  # deterministic hashes; near-zero collisions

    other = CmsRollupSink(path=str(tmp_path / "cms"), width=256)
    with pytest.raises(ValueError, match="geometries"):
        other.apply_batch(batch, batch_id=1, writer_id="w1")
    # the READ path is guarded too: a default-width reader over the
    # 2^16 store would probe wrong buckets and could UNDER-estimate
    with pytest.raises(ValueError, match="geometry"):
        other.estimates(probes.select("v")).collect()


def test_hll_precision_mismatch_refuses_to_merge(spark, tmp_path):
    from postgres_opensearch_cdc_spark.streaming.sketch import HllRollupSink

    batch = spark.createDataFrame(
        [("g1", f"v{i}") for i in range(50)], "g string, v string"
    )
    sink = HllRollupSink(path=str(tmp_path / "hll"), group_col="g",
                         value_col="v", p=P_PROD)
    sink.apply_batch(batch, batch_id=0, writer_id="w1")
    est = {r["g"]: r for r in sink.estimates(spark).collect()}
    assert abs(est["g1"]["hll_est"] - 50) / 50 < 0.05

    default_p = HllRollupSink(path=str(tmp_path / "hll"), group_col="g",
                              value_col="v")
    with pytest.raises(ValueError, match="precisions"):
        default_p.apply_batch(batch, batch_id=1, writer_id="w1")
    # read path guarded too (a p=4 reader over a p=14 store computes
    # zero_registers = 16 - count: nonsense, must refuse instead)
    with pytest.raises(ValueError, match="precision"):
        default_p.estimates(spark).collect()


def test_hll_params_rejects_out_of_range_precision():
    """r13 ADVICE: p outside [4, 18] must fail loudly — p <= 3 would
    silently use the generic alpha outside Flajolet's validated range
    (m >= 16), huge p would shift past hash60's 60 bits."""
    for bad in (0, 1, 3, 19, 61, 64):
        with pytest.raises(ValueError, match="4 <= p <= 18"):
            hll_params(bad)
    for ok in (4, 14, 18):
        hll_params(ok)


def test_hll_registers_rejects_group_col_and_group_cols(spark):
    """r13 ADVICE: mixing the single-column and list group-key forms
    is ambiguous (the list silently won) — now it raises."""
    df = spark.createDataFrame([("s", "a", "w1")],
                               "source string, domain string, w string")
    with pytest.raises(ValueError, match="not both"):
        hll_registers(df, group_col="domain", group_cols=["source"])
    # the None-sentinel default means even group_col equal to the old
    # "source" default is caught when combined with group_cols (the
    # r14 review found the string default made that case undetectable)
    with pytest.raises(ValueError, match="not both"):
        hll_registers(df, group_col="source", group_cols=["domain"])
    # each form alone still works, as does the bare default
    assert hll_registers(df, group_col="domain").columns == [
        "g", "bucket", "register"]
    assert hll_registers(df, group_cols=["source", "domain"]).columns == [
        "source", "domain", "bucket", "register"]
