"""Dev harness mirroring the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row count, column names, and order-insensitive values.

Usage: python tools/check_parity.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import sys
from datetime import date, datetime

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from postgres_opensearch_cdc_spark.registry import TESTDATA_TABLES  # noqa: E402
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6f}"
    if isinstance(v, (datetime, date)):
        return str(v)[:26]
    if isinstance(v, list):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    return str(v)


def normalize(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(out)


def run(sf_dir: str, only: list[str] | None = None) -> int:
    # progress bar writes "[Stage ...]\r" onto the same stdout line as
    # the first "ok" print, which breaks line-based grep filters
    spark = get_spark(
        "parity-check",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    if only:
        unknown = set(only) - set(qs)
        if unknown:
            print(f"FAIL  unknown query name(s): {sorted(unknown)}")
            return len(unknown)
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok    {name}: rows-only ({len(srows)} rows, no oracle)")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols = list(rel.columns)
            dtypes = [str(t) for t in rel.types]
            drows = rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        # The driver canonicalizes via pandas, which coerces DuckDB HUGEINT
        # (the result type of SUM over integers) to float64 while Spark
        # emits int64 — a guaranteed hash mismatch even when values agree.
        # Flag it here as a contract violation so it can't slip through.
        huge = [c for c, t in zip(dcols, dtypes) if "HUGEINT" in t.upper()]
        if huge:
            print(
                f"FAIL  {name}: oracle column(s) {huge} are HUGEINT — "
                "wrap the aggregate in CAST(... AS BIGINT)"
            )
            failures += 1
            continue
        if sorted(scols) != sorted(dcols):
            print(f"FAIL  {name}: columns spark={sorted(scols)} duck={sorted(dcols)}")
            failures += 1
            continue
        if len(srows) != len(drows):
            print(f"FAIL  {name}: rowcount spark={len(srows)} duck={len(drows)}")
            failures += 1
            continue
        ns, nd = normalize(srows, scols), normalize(drows, dcols)
        if ns != nd:
            diffs = [(a, b) for a, b in zip(ns, nd) if a != b][:3]
            print(f"FAIL  {name}: values differ, e.g. {diffs}")
            failures += 1
            continue
        # Vacuity audit: a 0-row or all-NULL result "passes" without
        # testing anything (round-6 manual audit caught 3 such entries)
        # — surface it so a filter gone vacuous can't hide behind green.
        if not srows:
            print(f"ok    {name}: 0 rows match  [VACUOUS: empty result]")
            continue
        null_cols = [
            c for i, c in enumerate(scols)
            if all(r[i] is None for r in srows)
        ]
        if null_cols:
            print(
                f"ok    {name}: {len(srows)} rows match  "
                f"[VACUOUS: all-NULL column(s) {null_cols}]"
            )
            continue
        print(f"ok    {name}: {len(srows)} rows match")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.001"
    only = [a for a in args if not a.startswith("/")] or None
    sys.exit(1 if run(sf_dir, only) else 0)
