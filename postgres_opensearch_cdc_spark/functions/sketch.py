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
HLL_M = 1 << HLL_P            # 16 registers
HLL_SUFFIX_BITS = 60 - HLL_P  # rho is counted over these bits
HLL_RHO_MAX = HLL_SUFFIX_BITS + 1
# alpha_16 from Flajolet et al. 2007 Fig. 3 (m=16)
HLL_ALPHA = 0.673


def hll_registers(values: DataFrame, group_col: str = "source",
                  value_col: str = "w",
                  group_cols: list[str] | None = None) -> DataFrame:
    """(g, bucket, register) HLL register table: bucket = the top
    HLL_P bits of hash60(value), register = max over values of
    rho(suffix) where rho = leading-zero count of the remaining
    HLL_SUFFIX_BITS bits + 1. Duplicates are harmless (max-based), so
    the input needs no distinct. One fixed-size map-side-combined agg
    off the scan — the mergeable-summary shape.

    ``group_cols`` keeps a MULTI-column group key as separate columns
    (no lossy string packing — a separator character appearing in a
    value would mis-parse on re-split); the single ``group_col`` form
    aliases to ``g`` for the streaming sink's flat store layout."""
    h = hash60(F.col(value_col))
    suffix = h % F.lit(1 << HLL_SUFFIX_BITS)
    # bit length via the minimal binary string: both engines print
    # bin(x) without leading zeros, so rho = (bits+1) - length(bin)
    rho = F.when(suffix == 0, F.lit(HLL_RHO_MAX)).otherwise(
        F.lit(HLL_RHO_MAX) - F.length(F.bin(suffix))
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
            # top HLL_P bits — integer shift, never float division
            # (h is not exactly representable in a double)
            F.shiftright(h, HLL_SUFFIX_BITS).alias("bucket"),
            rho.alias("rho"),
        )
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").alias("register"))
    )


def hll_estimates(regs: DataFrame,
                  group_cols: list[str] | None = None) -> DataFrame:
    """Per-group HLL estimate from a (g, bucket, register) table:

        sum_num = sum over all m registers of 2^(RHO_MAX - register)
                  (absent buckets carry register 0) — exact int64
        raw_est = alpha * m^2 * 2^RHO_MAX / sum_num
        hll_est = m * ln(m / V) when raw_est <= 2.5m and V > 0
                  (linear counting, V = zero registers), else raw_est

    Output: (group cols, zero_registers, sum_num, raw_est, hll_est,
    used_linear_counting). ``group_cols`` mirrors hll_registers —
    multi-column keys stay separate columns."""
    groups = group_cols if group_cols is not None else ["g"]
    per_group = regs.groupBy(*groups).agg(
        (
            F.sum(F.expr(f"shiftleft(1L, {HLL_RHO_MAX} - register)"))
            + (F.lit(HLL_M) - F.count(F.lit(1)))
            * F.lit(1 << HLL_RHO_MAX)
        ).alias("sum_num"),
        (F.lit(HLL_M) - F.count(F.lit(1))).alias("zero_registers"),
    )
    raw = F.lit(HLL_ALPHA * HLL_M * HLL_M) * F.lit(
        float(1 << HLL_RHO_MAX)
    ) / F.col("sum_num")
    out = per_group.withColumn("raw_est", raw)
    lc = F.lit(float(HLL_M)) * F.log(
        F.lit(float(HLL_M)) / F.col("zero_registers")
    )
    use_lc = (F.col("raw_est") <= F.lit(2.5 * HLL_M)) & (
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
