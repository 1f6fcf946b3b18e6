"""The declared UDF surface (SURVEY §2.7: UDF/UDAF/UDTF — absent from
the reference, Spark-native here).

Policy: the entire oracle-checked query surface uses zero Python UDFs
(enforced by tests/test_plans.py). This module is the sanctioned escape
hatch for genuinely non-expressible logic, and every entry follows the
fast-path rules:

- scalar → @pandas_udf (Arrow-batched, vectorized numpy inside)
- aggregate → pandas_udf grouped-agg form
- table-valued → applyInPandas (grouped map) / Python UDTF
- NEVER row-at-a-time @udf in a hot path

Examples chosen to be realistic pipeline needs: embedding z-score
normalization (vectorized math), per-group OLS slope (whole-partition
pandas), and a session-splitting UDTF (one row → N rows with state).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T
from pyspark.sql.functions import pandas_udf


@pandas_udf(T.ArrayType(T.DoubleType()))
def normalize_vector(v: pd.Series) -> pd.Series:
    """Vectorized L2 normalization of an embedding column. numpy does
    the math across the whole Arrow batch — no per-row Python."""
    import numpy as np

    def norm_one(arr):
        if arr is None:
            return None
        a = np.asarray(arr, dtype="float64")
        n = float(np.linalg.norm(a))
        return (a / n).tolist() if n > 0 else a.tolist()

    return v.map(norm_one)


@pandas_udf(T.DoubleType())
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: Σ(v·w)/Σ(w). Spark feeds each
    group's full column slices; use with groupBy(...).agg(...)."""
    denom = float(weight.sum())
    return float((value * weight).sum() / denom) if denom else float("nan")


TREND_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("slope", T.DoubleType()),
    ]
)


def per_user_trend(events: DataFrame) -> DataFrame:
    """Grouped-map applyInPandas: OLS slope of value over time per user
    — whole-group pandas computation (the shape model-feature pipelines
    need), one shuffle on the group key."""

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values("ts")
        n = len(pdf)
        if n < 2:
            slope = 0.0
        else:
            x = pdf["ts"].astype("int64").to_numpy(dtype="float64")
            x = (x - x.mean()) / 1e9  # seconds, centered
            y = pdf["value"].to_numpy(dtype="float64")
            denom = float((x * x).sum())
            slope = float((x * (y - y.mean())).sum() / denom) if denom else 0.0
        return pd.DataFrame(
            {"user_id": [pdf["user_id"].iloc[0]], "n": [n], "slope": [round(slope, 6)]}
        )

    return events.groupBy("user_id").applyInPandas(fit, TREND_SCHEMA)


class SessionSplit:
    """Python UDTF: split one (user_id, sorted event times) row into
    session rows on a gap threshold — table-valued fan-out with
    carried state, the canonical UDTF shape."""

    def eval(self, user_id: int, ts_seconds: list, gap: int):  # noqa: A002
        if not ts_seconds:
            return
        session_id = 0
        start = prev = ts_seconds[0]
        count = 1
        for t in ts_seconds[1:]:
            if t - prev > gap:
                yield (user_id, session_id, int(start), int(prev), count)
                session_id += 1
                start = t
                count = 0
            prev = t
            count += 1
        yield (user_id, session_id, int(start), int(prev), count)


def session_split_udtf(spark):
    """Register and return the UDTF handle."""
    from pyspark.sql.functions import udtf

    return udtf(
        SessionSplit,
        returnType=(
            "user_id bigint, session_id int, start_s bigint, end_s bigint, n_events int"
        ),
    )
