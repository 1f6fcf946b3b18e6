"""Diff two bench sidecars (BENCH_SIDECAR_r{N}.json) by per-entry
warm median — the tool that would have flagged the round-13
prefix-join doubling automatically instead of via a positional
worktree rebuild (round-13 verdict, Performance).

Usage: python tools/bench_diff.py OLD.json NEW.json [min_delta_cs]
Prints entries present in both, sorted by |delta|, filtered to
|delta| >= min_delta_cs (default 50 cs = 0.5 s), then entries only
in one side. Exit 0 always (informational).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    if len(sys.argv) < 3:
        print(__doc__)
        raise SystemExit(2)
    old = json.load(open(sys.argv[1]))
    new = json.load(open(sys.argv[2]))
    min_delta = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    om, nm = old["warm_medians_cs"], new["warm_medians_cs"]
    print(
        f"old: {old.get('n_queries')} entries, loadavg {old.get('loadavg')}"
        f" | new: {new.get('n_queries')} entries, "
        f"loadavg {new.get('loadavg')}"
    )
    both = sorted(
        ((abs(nm[k] - om[k]), k) for k in om.keys() & nm.keys()),
        reverse=True,
    )
    for d, k in both:
        if d < min_delta:
            break
        print(f"{nm[k] - om[k]:+6d} cs  {k}: {om[k]} -> {nm[k]}")
    only_old = sorted(om.keys() - nm.keys())
    only_new = sorted(nm.keys() - om.keys())
    if only_old:
        print("left top-50 (old only):", ", ".join(only_old))
    if only_new:
        print("entered top-50 (new only):", ", ".join(only_new))


if __name__ == "__main__":
    main()
