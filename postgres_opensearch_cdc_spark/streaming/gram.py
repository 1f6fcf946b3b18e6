"""Streaming Gram-matrix rollup: a continuously-maintained d×d
second-moment matrix over an embedding stream — the spectral
counterpart of the sketch rollup sinks (streaming/sketch.py), for
corpora that arrive incrementally (a training-data ingest keeps the
corpus Gram warm so PCA/whitening/semantic-dedup never rescan
history).

Contract class: ADDITIVE, like CmsRollupSink and unlike the HLL
register store — Gram(A ⊎ B) = Gram(A) + Gram(B), so a replayed
micro-batch that reaches the merge DOUBLE-COUNTS and the
(writer_id, batch_id) manifest guard is a CORRECTNESS requirement
(pinned by tests/test_gram_stream.py, mirroring the CMS tests).

State is the fixed d(d+1)/2 upper-triangle doubles regardless of
stream length — the mergeable-summary scale story again: per-batch
cost is one Arrow-partial X^T X over the batch (kilobytes shuffled)
plus an O(d²) merge, never a history rescan. Layout is the shared
commit idiom: full triangle into a fresh commit dir, ONE atomic
manifest rename publishing {version, commit, batch_id, writer_id,
dim}; crash before the rename leaves the previous version live, and
dimension is validated on BOTH write and read (a mismatched-d reader
would silently mis-index the triangle).

Determinism: the only cross-split drift is float summation order
(~1e-12 relative), far inside the 6-dp rounding the oracle entry
(queries/training_pipeline11.embedding_gram_stream) applies — the
batch SQL oracle knows nothing about the split.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from postgres_opensearch_cdc_spark.queries.training_pipeline11 import (
    EMB_DIM,
    gram_upper,
)

_GRAM_SCHEMA = T.StructType([
    T.StructField("i", T.IntegerType()),
    T.StructField("j", T.IntegerType()),
    T.StructField("gram_raw", T.DoubleType()),
])


@dataclass
class GramRollupSink:
    """foreachBatch sink maintaining the upper-triangle Gram of an
    embedding stream; see the module docstring for the contract.
    ``vec_col`` names the batch's array<double> column (cast float32
    upstream — exact promotion — so every engine multiplies identical
    doubles)."""

    path: str
    vec_col: str = "embedding"
    dim: int = EMB_DIM

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

    def _check_dim(self, manifest: dict) -> None:
        if manifest.get("dim") != self.dim:
            raise ValueError(
                f"gram store at {self.path} was written with "
                f"dim={manifest.get('dim')}; this reader has "
                f"dim={self.dim} — a mismatched dimension mis-indexes "
                "the triangle"
            )

    def gram(self, spark: SparkSession) -> DataFrame:
        """The published (i, j, gram_raw) upper triangle (empty before
        the first commit). Read paths validate the dimension too."""
        manifest = self.latest_manifest()
        if manifest is None:
            return spark.createDataFrame([], _GRAM_SCHEMA)
        self._check_dim(manifest)
        return spark.read.schema(_GRAM_SCHEMA).parquet(
            os.path.join(self._data_dir, manifest["commit"], "gram")
        )

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
            return  # replay guard: MANDATORY — the merge below ADDS
        if manifest is not None:
            self._check_dim(manifest)
        # NO batch spread here (r14 final bench: the spread REGRESSED
        # this sink 1.97 -> 3.19 s): gram_upper emits d·(d+1)/2 partial
        # rows PER PARTITION, so repartitioning a small micro-batch to
        # session parallelism multiplies the reduce input ~8x while the
        # per-partition numpy fold is already trivial. A production
        # micro-batch arrives well-split from the source anyway.
        partial = gram_upper(batch, dim=self.dim, vec_col=self.vec_col)
        if manifest is not None:
            partial = (
                self.gram(spark)
                .unionByName(partial)
                .groupBy("i", "j")
                .agg(F.sum("gram_raw").alias("gram_raw"))
            )
        version = (manifest["version"] + 1) if manifest else 1
        commit = f"commit-{uuid.uuid4().hex[:12]}"
        partial.write.mode("overwrite").parquet(
            os.path.join(self._data_dir, commit, "gram")
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
                    "dim": self.dim,
                },
                fh,
            )
        os.replace(
            tmp, os.path.join(self._commits_dir, f"v{version:08d}.json")
        )
