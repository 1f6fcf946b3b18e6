"""As-of (time-travel) join — an operator Spark lacks natively,
implemented as a composition of built-in ops (SURVEY custom-operator
rule (a): composition before pandas). DuckDB's native ASOF JOIN serves
as the correctness oracle.

Semantics: for each left row, attach the most recent right row of the
same key with right.ts <= left.ts (inclusive).

Implementation — the union + running-last trick, no UDF, no range
explosion:
  1. tag both sides, union by name (right rows carry payload, left rows
     carry null payload)
  2. one window over (key) ordered by (ts, side, seq) — side orders
     right-before-left at equal ts so "<=" holds
  3. last_value(payload, ignorenulls=true) over the running frame gives
     every left row the latest preceding right payload
  4. keep left rows

Cost: ONE shuffle on the key (same as any keyed join) and a sorted
window pass — at 100 TB this beats the naive range-join (which explodes
to |L|x|R| per key before filtering) and needs no per-key state beyond
the sort run. Skewed keys follow the same mitigation as any window op
(salt on a secondary bucet if one key dominates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
    seq_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Returns all left columns plus ``payload_cols`` from the matched
    right row (null when no right row precedes).

    direction='backward' (default): latest right.ts <= left.ts.
    direction='forward': earliest right.ts >= left.ts.
    ``seq_col`` breaks ties among right rows at identical ts (latest
    wins backward / earliest wins forward).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction}")

    lcols = left.columns
    r_tagged = right.select(
        *[F.col(c) for c in key_cols],
        F.col(ts_col),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_p_{c}") for c in payload_cols],
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
            if c not in key_cols and c != ts_col
        ],
        (F.col(seq_col) if seq_col else F.lit(0)).alias("_rseq"),
    )
    l_tagged = left.select(
        *[F.col(c) for c in key_cols],
        F.col(ts_col),
        F.lit(1).alias("_side"),
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_p_{c}")
            for c in payload_cols
        ],
        *[F.col(c) for c in lcols if c not in key_cols and c != ts_col],
        F.lit(0).alias("_rseq"),
    )
    unioned = r_tagged.unionByName(l_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(ts_col).asc(), F.col("_side").asc(), F.col("_rseq").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = [
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ]
    else:
        # forward: earliest right at ts >= left.ts → reverse the scan
        w = (
            Window.partitionBy(*key_cols)
            .orderBy(F.col(ts_col).desc(), F.col("_side").asc(), F.col("_rseq").desc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = [
            F.last(F.col(f"_p_{c}"), ignorenulls=True).over(w).alias(c)
            for c in payload_cols
        ]

    out = unioned.select(
        *[F.col(c) for c in key_cols],
        F.col(ts_col),
        F.col("_side"),
        *[F.col(c) for c in lcols if c not in key_cols and c != ts_col],
        *matched,
    )
    return out.filter(F.col("_side") == 1).drop("_side")
