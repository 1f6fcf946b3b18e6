"""Streaming distinct-count rollup: a continuously-maintained
HyperLogLog register store — the approximate-cardinality counterpart
of RollupSink's exact continuous aggregates (streaming/apply.py), for
the questions exact rollups can't answer in bounded state ("distinct
users per event type, forever": the exact answer needs a user-set per
group; the register store is a FIXED m int64s per group).

What makes this sink different from every additive store in the repo:
the register merge (elementwise MAX) is IDEMPOTENT as well as
commutative and associative, so replaying a micro-batch — same writer
or a different one — cannot change the store. The (writer_id,
batch_id) manifest guard here is an efficiency skip, not a
correctness requirement; the replay tests assert the stronger
property by re-applying batches with a DIFFERENT writer_id and
demanding a byte-identical register table (the test additive stores
must fail without their guard).

Layout (the RollupSink commit idiom):
    <path>/data/<commit>/regs/   full (g, bucket, register) table
    <path>/_commits/vNNNNNNNN.json  manifest {version, commit,
                                    batch_id, writer_id, m}
Each batch writes the merged register table into a fresh commit dir
and publishes it with ONE atomic manifest rename — crash between data
write and manifest leaves the previous version live, and the replay
re-derives an identical merge (idempotence again). The whole-table
rewrite IS the scale path: the store is O(groups × m) int64s —
independent of stream length — so per-batch cost is
O(|batch| + |groups|·m) and never grows with history.

Determinism: registers come from functions/sketch.hll_registers
(md5-backed hash60, pure int64), so the streamed store after any
batch split equals the one-shot batch register table bit-for-bit —
the oracle entry (queries/training_pipeline6.sketch_hll_rollup_stream)
value-checks stream ≡ batch through DuckDB."""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from postgres_opensearch_cdc_spark.functions.sketch import (
    HLL_M,
    hll_estimates,
    hll_registers,
)

_REG_SCHEMA = T.StructType([
    T.StructField("g", T.StringType()),
    T.StructField("bucket", T.LongType()),
    T.StructField("register", T.IntegerType()),
])


@dataclass
class HllRollupSink:
    """foreachBatch sink maintaining per-group HLL registers; see the
    module docstring for the contract. ``group_col`` / ``value_col``
    name the batch columns; the value is hashed as a string (cast
    upstream for non-string values so the portable hash family sees
    identical bytes in every engine)."""

    path: str
    group_col: str = "g"
    value_col: str = "v"

    @property
    def _data_dir(self) -> str:
        return os.path.join(self.path, "data")

    @property
    def _commits_dir(self) -> str:
        return os.path.join(self.path, "_commits")

    def _manifests(self) -> list[str]:
        if not os.path.isdir(self._commits_dir):
            return []
        return sorted(
            f for f in os.listdir(self._commits_dir)
            if f.startswith("v") and f.endswith(".json")
        )

    def latest_manifest(self) -> dict | None:
        names = self._manifests()
        if not names:
            return None
        with open(os.path.join(self._commits_dir, names[-1])) as fh:
            return json.load(fh)

    def registers(self, spark: SparkSession) -> DataFrame:
        """The published (g, bucket, register) table (empty before the
        first commit)."""
        manifest = self.latest_manifest()
        if manifest is None:
            return spark.createDataFrame([], _REG_SCHEMA)
        return spark.read.schema(_REG_SCHEMA).parquet(
            os.path.join(self._data_dir, manifest["commit"], "regs")
        )

    def estimates(self, spark: SparkSession) -> DataFrame:
        """Per-group cardinality estimates over the published store
        (functions/sketch.hll_estimates — the same estimator the
        batch audit entry value-checks)."""
        return hll_estimates(self.registers(spark))

    def apply_batch(self, batch: DataFrame, batch_id: int,
                    writer_id: str | None = None) -> None:
        spark = batch.sparkSession
        manifest = self.latest_manifest()
        if (
            manifest is not None
            and batch_id >= 0
            and manifest.get("batch_id") == batch_id
            and manifest.get("writer_id") == writer_id
        ):
            return  # replay: skipping is an optimization — the merge
            # below would be a no-op anyway (max is idempotent)
        if manifest is not None and manifest.get("m") != HLL_M:
            raise ValueError(
                f"register store at {self.path} was written with "
                f"m={manifest.get('m')}; this build has m={HLL_M} — "
                "register layouts under different precisions do not merge"
            )
        regs = hll_registers(
            batch.select(
                F.col(self.group_col).cast("string").alias("g"),
                F.col(self.value_col).cast("string").alias("v"),
            ),
            group_col="g",
            value_col="v",
        ).withColumn("register", F.col("register").cast("int"))
        if manifest is not None:
            regs = (
                self.registers(spark)
                .unionByName(regs)
                .groupBy("g", "bucket")
                .agg(F.max("register").alias("register"))
            )
        version = (manifest["version"] + 1) if manifest else 1
        commit = f"commit-{uuid.uuid4().hex[:12]}"
        regs.write.mode("overwrite").parquet(
            os.path.join(self._data_dir, commit, "regs")
        )
        os.makedirs(self._commits_dir, exist_ok=True)
        tmp = os.path.join(self._commits_dir, f".v{version:08d}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "commit": commit,
                    "batch_id": batch_id,
                    "writer_id": writer_id,
                    "m": HLL_M,
                },
                fh,
            )
        os.replace(
            tmp, os.path.join(self._commits_dir, f"v{version:08d}.json")
        )
