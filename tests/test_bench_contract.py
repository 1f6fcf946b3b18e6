"""bench.py contract: one JSON line on stdout with the fields the driver
records, all queries succeeding (no -1 sentinels). Runs at sf0.001 in a
subprocess so the bench path is tested exactly as the driver invokes it."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_emits_valid_contract_json():
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=480,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.startswith("{")]
    assert len(lines) == 1, f"expected exactly one JSON line, got: {proc.stdout!r}"
    doc = json.loads(lines[0])
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in doc
    assert doc["unit"] == "sec"
    assert doc["sf"] == 0.001
    assert doc["value"] > 0
    failed = [q for q, t in doc["queries"].items() if t < 0]
    assert not failed, f"bench queries failed: {failed}"
    tp = doc["throughput"]
    assert tp["backfill_rows_per_sec"] > 0
    assert tp["stream_upsert_events_per_sec"] > 0
