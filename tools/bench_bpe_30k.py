"""Local BPE merge loop at REAL tokenizer merge counts (SCALE.md §21
extension, round 13): the round-12 verdict asked for the '30k merges =
30k dict updates' claim to be proven by measurement, not extrapolated
from the 1k/4k rows. Same deterministic 'rich' corpus as
tools/bench_bpe_scale.py (20k docs x 30 hash-derived 10-hex words over
a 16-letter alphabet — vocabulary deep enough that tens of thousands
of merges stay learnable), measured at 8192 / 16384 / 32768 merges.

Run exclusively: python3 tools/bench_bpe_30k.py
Prints one JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from postgres_opensearch_cdc_spark.functions.bpe import (  # noqa: E402
    bpe_train_local,
)
from postgres_opensearch_cdc_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="bpe-30k")
    rich = spark.range(20_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", *[
            F.substring(
                F.conv(F.abs(F.xxhash64("id", F.lit(k))), 10, 16),
                1, 10,
            )
            for k in range(30)
        ]).alias("text"),
    ).localCheckpoint(eager=True)
    for n in (8192, 16384, 32768):
        t0 = time.monotonic()
        merges = bpe_train_local(rich, "text", n)
        sec = round(time.monotonic() - t0, 1)
        print(json.dumps({
            "op": "train_local_rich", "n_merges": n,
            "learned": len(merges), "sec": sec,
            "ms_per_merge": round(1000.0 * sec / max(len(merges), 1), 2),
        }), flush=True)


if __name__ == "__main__":
    main()
