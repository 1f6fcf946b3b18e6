"""Property test: the window-based EQL sequence operator agrees with a
brute-force per-user reference implementation on randomized event
streams — an oracle independent of both Spark and DuckDB (those two
share a window formulation; this one is plain Python loops)."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

from pyspark.sql import functions as F, types as T

from postgres_opensearch_cdc_spark.queries import sequences


def _brute_force(events, maxspan_s):
    """events: list of (user, event_id, type, ts). Returns
    {user: (n_sequences, min_lag_s)} matching eql_sequence semantics:
    for each A-event, the earliest B at-or-after it (ts, then event_id
    ordering) within maxspan."""
    out = {}
    by_user = {}
    for u, eid, et, ts in events:
        by_user.setdefault(u, []).append((ts, eid, et))
    for u, evs in by_user.items():
        # "at or after" in (ts desc, event_id desc) window order means
        # rows with (ts, eid) >= current in that ordering
        matches = []
        for ts, eid, et in evs:
            if et != sequences.SEQ_FIRST:
                continue
            later_bs = [
                ts2
                for ts2, eid2, et2 in evs
                if et2 == sequences.SEQ_SECOND
                and (ts2, eid2) >= (ts, eid)
            ]
            if not later_bs:
                continue
            lag = int(min(later_bs).timestamp()) - int(ts.timestamp())
            if lag <= maxspan_s:
                matches.append(lag)
        if matches:
            out[u] = (len(matches), min(matches))
    return out


def test_eql_sequence_matches_brute_force(spark, tmp_path):
    rng = random.Random(1234)
    base = datetime(2024, 1, 1)
    types = ["signup", "purchase", "error", "view"]
    rows = []
    for eid in range(800):
        rows.append(
            (
                rng.randrange(12),
                eid,
                rng.choice(types),
                base + timedelta(seconds=rng.randrange(0, 5 * 24 * 3600)),
            )
        )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)

    # drive the same plan eql_sequence builds, against the synthetic table
    enriched = spark.read.parquet(path).select(
        "user_id",
        "event_type",
        "ts",
        sequences._future_min(sequences.SEQ_SECOND).alias("next_b"),
    )
    lag_s = F.col("next_b").cast("long") - F.col("ts").cast("long")
    got = {
        r["user_id"]: (r["n"], r["min_lag"])
        for r in enriched.filter(
            (F.col("event_type") == sequences.SEQ_FIRST)
            & F.col("next_b").isNotNull()
            & (lag_s <= sequences.SEQ_MAXSPAN_S)
        )
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.min(lag_s).alias("min_lag"))
        .collect()
    }
    expected = _brute_force(rows, sequences.SEQ_MAXSPAN_S)
    assert got == expected
