"""Dump the formatted physical plan of named queries() entries to
files — the before/after evidence for optimization rounds.

Usage: python tools/plan_dump.py <out_dir> <suffix> <query_name ...>
Writes <out_dir>/<query>_<suffix>.txt for each named entry.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(
        "plan-dump", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name in names:
        if name not in qs:
            print(f"unknown entry: {name}", file=sys.stderr)
            continue
        try:
            p = plan_of(qs[name](spark, sf_dir))
        except Exception as e:  # plan construction failed
            p = f"ERROR: {e}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf_dir}\n\n")
            f.write(p.strip() + "\n")
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
