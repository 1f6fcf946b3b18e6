"""Mergeable distinct-count sketches: the HyperLogLog register/
estimator kernel shared by the batch audit entry
(queries/training_pipeline6.sketch_hyperloglog) and the streaming
rollup sink (streaming/sketch.HllRollupSink).

Everything here is engine-portable and ORDER-INDEPENDENT by
construction — registers are MAX aggregates of pure-int64 rho values
derived from the md5-backed hash60 family, and the harmonic-mean
denominator is an exact int64 sum (16 * 2^57 < 2^63) — which is what
lets DuckDB value-check both the batch entry and the streamed store,
and what makes register tables mergeable across any partitioning or
micro-batch split (union = elementwise max; pinned by tests)."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from postgres_opensearch_cdc_spark.functions.dedup import hash60

HLL_P = 4                     # 2^p registers (production: 14; 4 keeps
                              # test output on both estimator branches)


def hll_params(p: int) -> tuple[int, int, int, float]:
    """(m, suffix_bits, rho_max, alpha) for precision ``p``. The int64
    exactness argument holds at EVERY p: the harmonic-mean denominator
    sum_num ≤ m · 2^rho_max = 2^p · 2^(61-p) = 2^61 < 2^63 — so the
    production size p=14 (16 KiB/group) is as exactly summable as the
    test size p=4 (pinned by test_hll_production_precision). alpha
    constants per Flajolet et al. 2007 Fig. 3.

    Valid range: 4 <= p <= 18 — hash60 supplies 60 hash bits, and the
    paper's alpha constants / bias analysis assume m >= 16; p < 4
    would silently use the generic alpha formula outside its
    validated range, and large p would make suffix_bits meaningless
    long before the shift itself broke (p >= 61)."""
    if not 4 <= p <= 18:
        raise ValueError(
            f"HLL precision p={p} out of range: need 4 <= p <= 18 "
            "(hash60 provides 60 bits; alpha constants assume m >= 16)"
        )
    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(
        m, 0.7213 / (1.0 + 1.079 / m)
    )
    return m, 60 - p, 60 - p + 1, alpha


HLL_M, HLL_SUFFIX_BITS, HLL_RHO_MAX, HLL_ALPHA = hll_params(HLL_P)


def hll_registers(values: DataFrame, group_col: str | None = None,
                  value_col: str = "w",
                  group_cols: list[str] | None = None,
                  p: int = HLL_P) -> DataFrame:
    """(g, bucket, register) HLL register table: bucket = the top
    HLL_P bits of hash60(value), register = max over values of
    rho(suffix) where rho = leading-zero count of the remaining
    HLL_SUFFIX_BITS bits + 1. Duplicates are harmless (max-based), so
    the input needs no distinct. One fixed-size map-side-combined agg
    off the scan — the mergeable-summary shape.

    ``group_cols`` keeps a MULTI-column group key as separate columns
    (no lossy string packing — a separator character appearing in a
    value would mis-parse on re-split); the single ``group_col`` form
    aliases to ``g`` for the streaming sink's flat store layout.
    ``p`` is the register precision (default the test size HLL_P;
    production 14 — see hll_params for the any-p int64 bound).

    ``group_col`` and ``group_cols`` are mutually exclusive: ANY
    explicitly-passed combination raises (the None sentinel — rather
    than a "source" default — means even group_col="source" alongside
    group_cols is caught; the list silently winning was the API
    footgun). ``group_col`` defaults to "source" when neither is
    given."""
    if group_cols is not None and group_col is not None:
        raise ValueError(
            "pass either group_col or group_cols, not both "
            f"(got group_col={group_col!r} and group_cols={group_cols!r})"
        )
    if group_col is None and group_cols is None:
        group_col = "source"
    _, suffix_bits, rho_max, _ = hll_params(p)
    h = hash60(F.col(value_col))
    suffix = h % F.lit(1 << suffix_bits)
    # bit length via the minimal binary string: both engines print
    # bin(x) without leading zeros, so rho = (bits+1) - length(bin)
    rho = F.when(suffix == 0, F.lit(rho_max)).otherwise(
        F.lit(rho_max) - F.length(F.bin(suffix))
    )
    groups = group_cols if group_cols is not None else ["g"]
    head = (
        [F.col(c) for c in group_cols]
        if group_cols is not None
        else [F.col(group_col).alias("g")]
    )
    return (
        values.select(
            *head,
            # top p bits — integer shift, never float division
            # (h is not exactly representable in a double)
            F.shiftright(h, suffix_bits).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimates(regs: DataFrame,
                  group_cols: list[str] | None = None,
                  p: int = HLL_P) -> DataFrame:
    """Per-group HLL estimate from a (g, bucket, register) table:

        sum_num = sum over all m registers of 2^(RHO_MAX - register)
                  (absent buckets carry register 0) — exact int64
        raw_est = alpha * m^2 * 2^RHO_MAX / sum_num
        hll_est = m * ln(m / V) when raw_est <= 2.5m and V > 0
                  (linear counting, V = zero registers), else raw_est

    Output: (group cols, zero_registers, sum_num, raw_est, hll_est,
    used_linear_counting). ``group_cols`` mirrors hll_registers —
    multi-column keys stay separate columns; ``p`` must match the
    precision the register table was built with."""
    m, _, rho_max, alpha = hll_params(p)
    groups = group_cols if group_cols is not None else ["g"]
    per_group = regs.groupBy(*groups).agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {rho_max} - register)"))
            + (F.lit(m) - F.count(F.lit(1)))
            * F.lit(1 << rho_max)
        ).alias("sum_num"),
        (F.lit(m) - F.count(F.lit(1))).alias("zero_registers"),
    )
    raw = F.lit(alpha * m * m) * F.lit(
        float(1 << rho_max)
    ) / F.col("sum_num")
    out = per_group.withColumn("raw_est", raw)
    lc = F.lit(float(m)) * F.log(
        F.lit(float(m)) / F.col("zero_registers")
    )
    use_lc = (F.col("raw_est") <= F.lit(2.5 * m)) & (
        F.col("zero_registers") > 0
    )
    return out.select(
        *groups,
        "zero_registers",
        "sum_num",
        "raw_est",
        F.when(use_lc, lc).otherwise(F.col("raw_est")).alias("hll_est"),
        use_lc.cast("boolean").alias("used_linear_counting"),
    )
