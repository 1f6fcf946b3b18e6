"""Shared plan-inspection helpers for the test suite.

`explain_plan` returns Spark's formatted physical plan;
`count_nodes` counts operator nodes in the DETAIL section only — the
tree section repeats each node, so a raw substring count double-counts
(the bug class that broke the first plan-shape assertions)."""

from __future__ import annotations

import re


def explain_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def count_nodes(plan: str, name: str) -> int:
    return len(re.findall(rf"^\(\d+\) {re.escape(name)}", plan, re.M))
