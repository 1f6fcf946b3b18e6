"""Streaming CDC apply: readStream → parse → foreachBatch(keyed merge).

Reference behavior being reproduced (SURVEY §3.1): the consumer's poll
loop (consumer.py:53) becomes the micro-batch planner; per-event PUT/
DELETE (consumer.py:64-100) becomes one idempotent merge per batch; the
at-least-once + idempotent-PUT guarantee (ST5) becomes checkpointed
foreachBatch + last-write-wins merge keyed on PK; op-mix stats (T9,
consumer.py:48) become df.observe + a StreamingQueryListener.

Latency budget: the reference's end-to-end SLA is 0.5-1.5 s
(TDD :1437-1445); processingTime triggers in that band are the
default, availableNow for tests/backfill.

Scale: state lives in the keyed mirror table (not the state store), so
mirror size is bounded by the source table, not by stream history. The
windowed/sessionized aggregations below do use the state store —
RocksDB-backed (session.py) with watermarks bounding state (ST8 —
capabilities the reference lacks; Spark-native extensions).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from postgres_opensearch_cdc_spark.cdc.envelope import OP_DELETE


def _require_merge_columns(batch: DataFrame, key_cols, seq_cols, op_col) -> None:
    """Schema evolution null-fills PAYLOAD columns only: a batch missing
    a key/sequence/op column is a producer bug, and silently null-
    filling it would partition the merge window by NULL keys and
    collapse the batch into one arbitrary row. Fail loudly instead."""
    missing = [c for c in [*key_cols, *seq_cols, op_col] if c not in batch.columns]
    if missing:
        raise ValueError(
            f"changelog batch is missing merge-critical column(s) {missing}; "
            "only payload columns may evolve"
        )


@dataclass
class MirrorSink:
    """Parquet-backed keyed mirror maintained by idempotent merge.

    The merge is pure-Spark (no Delta dependency): read current mirror,
    union the batch as changes, last-write-wins compact, write back.
    For a production 100 TB mirror, the same foreachBatch body targets a
    Delta/Iceberg MERGE INTO (partitioned by key bucket so only touched
    files rewrite); the logical semantics — and these tests — are
    identical.
    """

    path: str
    key_cols: list[str]
    seq_cols: list[str]
    op_col: str = "op"
    batches_applied: int = field(default=0)

    def _heal_swap(self) -> None:
        """Recover an interrupted write-swap: a crash between the two
        renames leaves the previous mirror at ``<path>.old`` and no
        current mirror — restore it (the batch replays idempotently)."""
        old = self.path + ".old"
        if not os.path.exists(
            os.path.join(self.path, "_SUCCESS")
        ) and os.path.exists(os.path.join(old, "_SUCCESS")):
            os.rename(old, self.path)

    def exists(self) -> bool:
        self._heal_swap()
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def read(self, spark: SparkSession) -> DataFrame:
        self._heal_swap()
        return spark.read.parquet(self.path)

    def apply_batch(self, batch: DataFrame, batch_id: int,
                    writer_id: str | None = None) -> None:
        """foreachBatch body. Idempotent under batch replay: replaying a
        batch re-merges the same (key, seq) rows, and last-write-wins on
        the same sequence numbers is a no-op — the reference's
        PUT-by-id idempotency (consumer.py:64-68), ST5.
        ``writer_id`` identifies the streaming query (checkpoint) for
        sinks with a replay guard; this sink's idempotence is value-
        level, so it only accepts the argument for interface parity.

        Contract (ST2): a key's events must not go BACKWARD across
        micro-batches — deletes are applied (key removed), not retained
        as tombstones, so an older update arriving after the delete's
        batch would resurrect the row. Kafka/Kinesis per-partition
        ordering provides this; within a batch any order is fine, and
        replays/duplicates are always safe. (Retained-tombstone mode
        would lift the constraint at the cost of a tombstone-compaction
        job; the reference has the identical semantics via immediate
        DELETE-by-id, consumer.py:93-100.)"""
        _require_merge_columns(
            batch, self.key_cols, self.seq_cols, self.op_col
        )
        spark = batch.sparkSession
        # _pri breaks seq ties deterministically: an incoming batch row
        # (1) beats the mirrored row (0) at equal seq, so a replayed
        # backfill where both sides carry seq=-1 resolves identically
        # every run (plan-independent), including op='d' vs mirrored 'u'.
        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.col(c).desc_nulls_last() for c in self.seq_cols],
            F.col("_pri").desc(),
        )
        if self.exists():
            current = self.read(spark)
            as_changes = current.select(
                F.lit("u").alias(self.op_col),
                *[F.col(c) for c in current.columns if c != self.op_col],
            ).withColumn("_pri", F.lit(0))
            # schema-evolving merge: a column added upstream (ALTER TABLE
            # ADD COLUMN) appears on new rows and null-fills the mirror
            # history; a column absent from this batch null-fills the
            # batch side — the sink analogue of dynamic mapping
            # (reference W5: new fields indexed on arrival, old docs
            # return null)
            unioned = batch.withColumn("_pri", F.lit(1)).unionByName(
                as_changes, allowMissingColumns=True
            )
        else:
            unioned = batch.withColumn("_pri", F.lit(1))
        merged = (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col(self.op_col) != OP_DELETE))
            .drop("_rn", "_pri")
        )
        # ONE job instead of two: write to a sibling tmp dir (the plan
        # still reads the current mirror lazily — different path, so no
        # read-overwrite hazard and no localCheckpoint materialization
        # pass), then swap directories. Crash-safety is strictly better
        # than overwrite-in-place: the old mirror stays intact until
        # the new one is fully written, and _heal_swap restores it if
        # the process dies between the two renames.
        import shutil

        tmp, old = self.path + ".tmpw", self.path + ".old"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(old, ignore_errors=True)
        if os.path.exists(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        self.batches_applied += 1


def start_mirror_stream(
    changes: DataFrame,
    sink: MirrorSink,
    checkpoint_dir: str,
    trigger_available_now: bool = True,
    processing_time: str = "1 second",
    after_batch=None,
):
    """Wire a changelog stream into the mirror sink.

    availableNow drains everything then stops (test/backfill mode, ST1);
    processingTime("1 second") matches the reference's refresh/latency
    budget (TDD :525, :1437-1445) for the live mode.
    Stats via observe(): per-batch op-mix counters, the reference's T9.
    ``after_batch(batch_id)``, when given, runs after each batch's
    merge commits — the hook monitor evaluation (engine alerting)
    rides on.
    """
    observed = changes.observe(
        "cdc_stats",
        F.count(F.lit(1)).alias("events"),
        F.sum(F.when(F.col(sink.op_col) == OP_DELETE, 1).otherwise(0)).alias("deletes"),
    )
    def _apply(batch: DataFrame, batch_id: int) -> None:
        # writer identity = the checkpoint: batch ids restart per
        # checkpoint, so the sink's replay guard needs both
        sink.apply_batch(batch, batch_id, writer_id=checkpoint_dir)
        if after_batch is not None:
            after_batch(batch_id)

    writer = observed.writeStream.foreachBatch(_apply).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=processing_time)
    return writer.start()


@dataclass
class PartitionedMirrorSink:
    """Bucket-partitioned mirror with partition-pruned merges — the
    plain-parquet realization of "MERGE touches only affected files"
    (what Delta/Iceberg would give us; SURVEY W1 scale note).

    Layout: mirror partitioned by `_bucket = pmod(xxhash64(key), n)`.
    Applying a batch:
      1. bucket the batch rows,
      2. read ONLY those buckets of the mirror (partition pruning —
         cheap regardless of total mirror size),
      3. last-write-wins compact batch ∪ touched-slice,
      4. dynamic-partition-overwrite: Spark rewrites exactly the
         partitions present in the output; untouched buckets are never
         read or written.

    Merge cost therefore scales with |batch| + |touched buckets|, not
    |mirror| — the property that makes a 100 TB mirror maintainable at
    a 1k-events/s trickle. Verified (untouched partition files remain
    byte-identical) in tests/test_partitioned_mirror.py.
    """

    path: str
    key_cols: list[str]
    seq_cols: list[str]
    op_col: str = "op"
    num_buckets: int = 64
    bucket_expr: str | None = None

    def _bucket(self) -> "F.Column":
        """Bucketing strategy decides WHEN pruning pays (measured in
        SCALE.md §2):

        - hash (default): co-locates joins, but a batch of random keys
          touches ~min(|batch|, num_buckets) buckets — pruning only
          helps when batches are small relative to bucket count.
        - range (`bucket_expr`, e.g. "id div 100000"): clustered update
          keys (monotonic PKs, hot recent entities — the common CDC
          shape) land in few buckets → merges rewrite a sliver of the
          mirror regardless of mirror size.
        """
        if self.bucket_expr is not None:
            return F.expr(self.bucket_expr)
        return F.pmod(F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(self.num_buckets))

    def exists(self) -> bool:
        # dynamic-overwrite commits do NOT write a root _SUCCESS marker —
        # presence of any bucket partition directory is the real signal
        if not os.path.isdir(self.path):
            return False
        return any(e.startswith("_bucket=") for e in os.listdir(self.path))

    # -- schema sidecar -------------------------------------------------
    # Partition-pruned merges leave MIXED-schema bucket files after a
    # schema evolution (only touched buckets carry the new column).
    # mergeSchema handles that, but it runs a footer-merge job over
    # every file it reads ON EVERY BATCH — O(|mirror|) plan-time work
    # that defeats the pruning this sink exists for. Instead the sink
    # persists the running column superset (what unionByName produced)
    # in a root-level sidecar after each write and reads with that
    # EXPLICIT schema: zero footer jobs, files missing a column yield
    # nulls, plan cost independent of mirror size. The sidecar sits
    # outside the _bucket= partition dirs so dynamic overwrite never
    # touches it; mirrors written before the sidecar existed fall back
    # to mergeSchema once and gain the sidecar on their next write.

    def _schema_path(self) -> str:
        return os.path.join(self.path, "_mirror_schema.json")

    def _stored_schema(self) -> "T.StructType | None":
        import json

        try:
            with open(self._schema_path()) as fh:
                return T.StructType.fromJson(json.load(fh))
        except (OSError, ValueError, KeyError):
            return None

    def _store_schema(self, schema: "T.StructType") -> None:
        import json

        # sidecar now precedes the first data write — the mirror dir
        # may not exist yet
        os.makedirs(self.path, exist_ok=True)
        tmp = self._schema_path() + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(schema.jsonValue(), fh)
        os.replace(tmp, self._schema_path())  # atomic on POSIX

    def _reader(self, spark: SparkSession):
        stored = self._stored_schema()
        reader = spark.read.option("basePath", self.path)
        if stored is not None:
            return reader.schema(stored)
        return reader.option("mergeSchema", "true")

    def read(self, spark: SparkSession) -> DataFrame:
        return self._reader(spark).parquet(self.path).drop("_bucket")

    def apply_batch(self, batch: DataFrame, batch_id: int,
                    writer_id: str | None = None) -> None:
        _require_merge_columns(
            batch, self.key_cols, self.seq_cols, self.op_col
        )
        spark = batch.sparkSession
        batch = batch.withColumn("_bucket", self._bucket())
        existed = self.exists()
        touched: list = []
        current = None
        if existed:
            touched = [
                r["_bucket"]
                for r in batch.select("_bucket").distinct().collect()
            ]
            # list only touched bucket DIRECTORIES (basePath keeps
            # _bucket as a partition column) and read them with the
            # sidecar schema — scan AND schema resolution are both
            # O(|touched buckets|), no whole-mirror footer sweep.
            # Buckets new in this batch have no directory yet and
            # are skipped (nothing to merge).
            touched_dirs = [
                p for b in touched
                if os.path.isdir(p := f"{self.path}/_bucket={b}")
            ]
            current = (
                self._reader(spark)
                .parquet(*touched_dirs)
                .filter(F.col("_bucket").isin(touched))
            ) if touched_dirs else None
        if current is not None:
            as_changes = current.select(
                F.lit("u").alias(self.op_col),
                *[F.col(c) for c in current.columns if c != self.op_col],
            ).withColumn("_pri", F.lit(0))
            # schema-evolving merge (see MirrorSink.apply_batch)
            unioned = batch.withColumn("_pri", F.lit(1)).unionByName(
                as_changes, allowMissingColumns=True
            )
        else:
            unioned = batch.withColumn("_pri", F.lit(1))
        # batch rows (_pri=1) beat mirrored rows (0) at equal seq —
        # deterministic replay resolution (see MirrorSink.apply_batch)
        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.col(c).desc_nulls_last() for c in self.seq_cols],
            F.col("_pri").desc(),
        )
        merged = (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col(self.op_col) != OP_DELETE))
            .drop("_rn", "_pri")
        )
        # persist the running column superset (unionByName already
        # folded any evolved columns in) BEFORE the data write — next
        # batch plans with it instead of sweeping footers; _bucket
        # stays a discovered partition column. Order matters: a crash
        # between sidecar and data write leaves a sidecar listing a
        # column the files lack, which is benign (explicit-schema
        # reads null-fill it); the reverse order risked a sidecar
        # MISSING an evolved column, silently dropping it on every
        # later read and merge.
        self._store_schema(merged.drop("_bucket").schema)
        # ONE job instead of two (and no dynamic-overwrite conf dance):
        # write the merged buckets to a sibling tmp dir — the plan still
        # reads the live bucket dirs lazily, different path, so no
        # read-overwrite hazard and no localCheckpoint materialization
        # pass — then swap the produced bucket dirs into place. A
        # touched bucket whose keys were all deleted produces no tmp
        # dir and is dropped, matching the old explicit cleanup; the
        # produced-bucket set comes from a dir listing, replacing the
        # second distinct().collect() job the old form paid.
        import shutil

        tmp = self.path + ".tmpw"
        shutil.rmtree(tmp, ignore_errors=True)
        merged.write.mode("overwrite").partitionBy("_bucket").parquet(tmp)
        out_buckets = {
            d.split("=", 1)[1]
            for d in os.listdir(tmp)
            if d.startswith("_bucket=")
        }
        os.makedirs(self.path, exist_ok=True)
        for b in out_buckets:
            dst = os.path.join(self.path, f"_bucket={b}")
            shutil.rmtree(dst, ignore_errors=True)
            os.rename(os.path.join(tmp, f"_bucket={b}"), dst)
        for b in {str(b) for b in touched} - out_buckets:
            shutil.rmtree(
                os.path.join(self.path, f"_bucket={b}"), ignore_errors=True
            )
        # the tmp write's _SUCCESS marker becomes the mirror's
        open(os.path.join(self.path, "_SUCCESS"), "w").close()
        shutil.rmtree(tmp, ignore_errors=True)


@dataclass
class VersionedMirrorSink:
    """Object-store-safe partitioned mirror: the commit-marker protocol
    form of PartitionedMirrorSink (which relies on dynamic partition
    overwrite + a local-FS directory delete — non-atomic on object
    stores, SURVEY W1 scale note).

    Snapshot layout (mini table-format, Iceberg-style but dependency
    free):

        <path>/data/commit-<ver>-<uuid>/_bucket=<b>/*.parquet
        <path>/_commits/v<%08d>.json

    Invariants that make it object-store-safe:
      * Data files are IMMUTABLE and written into a fresh commit dir per
        batch — never overwritten, never renamed. Only appends.
      * A manifest maps every live bucket to the commit dir holding its
        current compacted contents. Readers resolve max(version)
        manifest → file listing; they never list data dirs.
      * The single manifest file write IS the commit point (a one-object
        PUT — atomic on S3/GCS; modeled locally by write-temp +
        os.replace). A crash anywhere before it leaves orphan data files
        that no reader ever sees; the mirror stays readable at the
        previous version throughout. No rmtree is needed for emptied
        buckets — they are simply absent from the next manifest.
      * Batch replay after a checkpoint-recovery is detected via the
        manifest's batch_id (exactly-once commit, stronger than the
        merge's last-write-wins idempotency which still backstops it).

    Merge cost is |batch| + |touched bucket slices| exactly like
    PartitionedMirrorSink — the pruning now happens by reading only the
    touched buckets' directories out of the manifest, which is file-level
    pruning without even a partition-filter scan. Old commits/manifests
    accumulate until vacuum() — time-travel for free until then.

    Single-writer (one streaming query per mirror), like every
    foreachBatch sink; readers are lock-free and always consistent.
    """

    path: str
    key_cols: list[str]
    seq_cols: list[str]
    op_col: str = "op"
    num_buckets: int = 64
    bucket_expr: str | None = None

    def _bucket(self) -> "F.Column":
        if self.bucket_expr is not None:
            return F.expr(self.bucket_expr)
        return F.pmod(F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(self.num_buckets))

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
        return self.manifest()

    def manifest(self, version: "int | None" = None) -> dict | None:
        """Load a committed manifest: the latest, or an explicit
        ``version`` — every un-vacuumed commit is a readable snapshot
        (time travel for free, see class docstring)."""
        import json

        names = self._manifests()
        if not names:
            return None
        if version is None:
            name = names[-1]
        else:
            name = f"v{version:08d}.json"
            if name not in names:
                raise FileNotFoundError(
                    f"no committed version {version} under {self.path} "
                    f"(available: {[int(n[1:-5]) for n in names]})"
                )
        with open(os.path.join(self._commits_dir, name)) as fh:
            return json.load(fh)

    def exists(self) -> bool:
        return bool(self._manifests())

    def _bucket_paths(self, manifest: dict, buckets: list | None = None):
        """Group the manifest's bucket→commit mapping into per-commit
        path lists (restricted to ``buckets`` when pruning)."""
        by_commit: dict[str, list[str]] = {}
        for b, cid in manifest["buckets"].items():
            if buckets is not None and int(b) not in buckets:
                continue
            by_commit.setdefault(cid, []).append(
                os.path.join(self._data_dir, cid, f"_bucket={b}")
            )
        return by_commit

    def _read_manifest_slice(
        self, spark: SparkSession, manifest: dict, buckets: list | None = None
    ) -> DataFrame | None:
        by_commit = self._bucket_paths(manifest, buckets)
        dfs = [
            spark.read.option("basePath", os.path.join(self._data_dir, cid)).parquet(*paths)
            for cid, paths in sorted(by_commit.items())
        ]
        if not dfs:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            # commits written before a schema evolution lack the added
            # columns — null-fill them on read (dynamic-mapping analogue)
            out = out.unionByName(d, allowMissingColumns=True)
        return out

    def read(self, spark: SparkSession, version: "int | None" = None) -> DataFrame:
        manifest = self.manifest(version)
        if manifest is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        sliced = self._read_manifest_slice(spark, manifest)
        if sliced is None:  # committed-but-empty mirror: schema from manifest
            schema = T.StructType.fromJson(manifest["schema"])
            return spark.createDataFrame([], schema)
        return sliced.drop("_bucket")

    def apply_batch(self, batch: DataFrame, batch_id: int,
                    writer_id: str | None = None) -> None:
        _require_merge_columns(
            batch, self.key_cols, self.seq_cols, self.op_col
        )
        import json
        import uuid

        spark = batch.sparkSession
        manifest = self.latest_manifest()
        if (
            manifest is not None
            and batch_id >= 0
            and manifest.get("batch_id") == batch_id
            # batch ids are only meaningful PER STREAMING QUERY: a new
            # checkpoint (different changelog dir, re-route) restarts at
            # batch 0, which must not alias the old stream's batch 0 —
            # the (writer, batch) pair is Spark's documented foreachBatch
            # dedup key
            and manifest.get("writer_id") == writer_id
        ):
            return  # replayed batch already committed — exactly-once
        version = (manifest["version"] + 1) if manifest else 1
        batch = batch.withColumn("_bucket", self._bucket())
        obs = None
        if manifest is None:
            # FIRST commit: no current slice to prune, and the manifest
            # bucket map is rebuilt from the write's own output dirs —
            # the only thing the stats job contributes is the sequence
            # high-water mark (global max per seq col, deletes
            # included). Fold that into the merge write itself via
            # observe() instead of running a separate full pass over
            # the batch (r15, one fewer Spark job per mirror
            # bootstrap; the observation sits UPSTREAM of the merge
            # window's survivor filter, so deleted rows still raise
            # the mark exactly as the stats job did).
            from pyspark.sql import Observation

            obs = Observation()
            batch = batch.observe(
                obs, *[F.max(F.col(c)).alias(c) for c in self.seq_cols]
            )
            touched: list = []
        else:
            # bounded driver-side listing: ≤ num_buckets rows. The same
            # job also returns per-bucket seq maxima, folded below into
            # the manifest's sequence high-water mark (max seq EVER
            # merged, deletes included) — what lets a bulk/REST write
            # allocate sequence numbers above every consumed stream
            # offset even after a high-seq delete left no live row
            # behind. (The stats scan is column-pruned to _bucket +
            # seq cols; the merge needs the touched list BEFORE its
            # plan exists, so the two passes cannot fuse here.)
            stats = (
                batch.groupBy("_bucket")
                .agg(*[F.max(c).alias(c) for c in self.seq_cols])
                .collect()
            )
            touched = sorted(r["_bucket"] for r in stats)
        prev_hwm = dict((manifest or {}).get("max_seq") or {})
        max_seq: dict = dict(prev_hwm)
        if manifest is not None:
            for c in self.seq_cols:
                vals = [r[c] for r in stats if r[c] is not None]
                # only JSON-storable scalar seq types participate (the
                # engine's long offsets; timestamp seqs are compared via
                # live rows instead)
                vals = [v for v in vals if isinstance(v, (int, float, str))]
                if not vals:
                    continue
                batch_max = max(vals)
                prev = prev_hwm.get(c)
                max_seq[c] = batch_max if prev is None or batch_max > prev else prev
        unioned = batch
        if manifest is not None:
            current = self._read_manifest_slice(spark, manifest, buckets=touched)
            if current is not None:
                as_changes = (
                    current.drop("_bucket")
                    .select(
                        F.lit("u").alias(self.op_col),
                        *[
                            F.col(c)
                            for c in current.drop("_bucket").columns
                            if c != self.op_col
                        ],
                    )
                    .withColumn("_bucket", self._bucket())
                    .withColumn("_pri", F.lit(0))
                )
                # schema-evolving merge (see MirrorSink.apply_batch)
                unioned = batch.withColumn("_pri", F.lit(1)).unionByName(
                    as_changes, allowMissingColumns=True
                )
        if "_pri" not in unioned.columns:
            unioned = unioned.withColumn("_pri", F.lit(1))
        # batch rows (_pri=1) beat mirrored rows (0) at equal seq —
        # deterministic replay resolution (see MirrorSink.apply_batch)
        w = Window.partitionBy(*self.key_cols).orderBy(
            *[F.col(c).desc_nulls_last() for c in self.seq_cols],
            F.col("_pri").desc(),
        )
        merged = (
            unioned.withColumn("_rn", F.row_number().over(w))
            .filter((F.col("_rn") == 1) & (F.col(self.op_col) != OP_DELETE))
            .drop("_rn", "_pri")
        )
        commit_id = f"commit-{version:08d}-{uuid.uuid4().hex[:8]}"
        commit_dir = os.path.join(self._data_dir, commit_id)
        merged.write.partitionBy("_bucket").parquet(commit_dir)
        if obs is not None:
            # first-commit high-water mark, observed on the write job
            for c, v in obs.get.items():
                if isinstance(v, (int, float, str)):
                    max_seq[c] = v
        # buckets that survived the merge: a driver listing of the fresh
        # commit dir (no extra Spark job, no collect)
        out_buckets = {
            int(e.split("=", 1)[1])
            for e in os.listdir(commit_dir)
            if e.startswith("_bucket=")
        }
        buckets = dict(manifest["buckets"]) if manifest else {}
        for b in touched:
            buckets.pop(str(b), None)
        for b in sorted(out_buckets):
            buckets[str(b)] = commit_id
        os.makedirs(self._commits_dir, exist_ok=True)
        tmp = os.path.join(self._commits_dir, f".tmp-v{version:08d}.json")
        final = os.path.join(self._commits_dir, f"v{version:08d}.json")
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "version": version,
                    "batch_id": batch_id,
                    "writer_id": writer_id,
                    "buckets": buckets,
                    "max_seq": max_seq,
                    "schema": json.loads(merged.drop("_bucket").schema.json()),
                },
                fh,
            )
        os.replace(tmp, final)  # the commit point (object store: one PUT)

    def raise_high_water(self, max_seq: dict) -> None:
        """Metadata-only commit: bump the manifest's sequence
        high-water mark to at least ``max_seq`` (per seq column,
        existing marks never lowered) without touching data. Used by
        restore-from-snapshot so a restored mirror keeps the SOURCE's
        mark — its live rows' max seq can sit below offsets the source
        had already consumed (e.g. a high-seq delete), and a bulk
        write or replayed stream batch must still rank correctly."""
        import json

        manifest = self.latest_manifest()
        if manifest is None:
            raise FileNotFoundError(f"no committed snapshot under {self.path}")
        merged = dict(manifest.get("max_seq") or {})
        for c, v in max_seq.items():
            if not isinstance(v, (int, float, str)):
                continue
            prev = merged.get(c)
            merged[c] = v if prev is None or v > prev else prev
        version = manifest["version"] + 1
        tmp = os.path.join(self._commits_dir, f".tmp-v{version:08d}.json")
        final = os.path.join(self._commits_dir, f"v{version:08d}.json")
        with open(tmp, "w") as fh:
            # batch_id carried over: the exactly-once replay guard for
            # the last data batch must survive this metadata commit
            json.dump({**manifest, "version": version, "max_seq": merged}, fh)
        os.replace(tmp, final)

    def vacuum(self, keep_versions: int = 1) -> int:
        """GC unreferenced commit dirs + manifests older than the last
        ``keep_versions``. Maintenance only — correctness never depends
        on any delete. Returns the number of commit dirs removed.

        ``keep_versions`` must be >= 1: a mirror with zero committed
        manifests is unreadable, so vacuuming down to nothing is never
        a maintenance operation."""
        import json
        import shutil

        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        names = self._manifests()
        if not names:
            return 0
        keep = names[-keep_versions:]
        # drop old manifests FIRST so a crash mid-vacuum can't leave a
        # manifest referencing deleted data
        for n in names[: len(names) - len(keep)]:
            os.remove(os.path.join(self._commits_dir, n))
        live: set[str] = set()
        for n in keep:
            with open(os.path.join(self._commits_dir, n)) as fh:
                live |= set(json.load(fh)["buckets"].values())
        removed = 0
        if os.path.isdir(self._data_dir):
            for e in os.listdir(self._data_dir):
                if e.startswith("commit-") and e not in live:
                    shutil.rmtree(os.path.join(self._data_dir, e))
                    removed += 1
        return removed


@dataclass
class MultiTableMirrorSink:
    """Routed multi-table apply: one changelog stream carrying events for
    several tables (the reference consumes 3 topics into 3 indices,
    consumer.py:17-21) fans out to one keyed mirror per table inside a
    single foreachBatch.

    The batch is partitioned by routing key (source table name) and each
    slice merges into its own mirror — same per-table semantics as
    MirrorSink, one stream, one checkpoint. Routing-key slices are
    independent writes; a production version runs them as concurrent
    MERGEs on a table format."""

    sinks: dict[str, MirrorSink]
    route_col: str = "target_table"

    def apply_batch(self, batch: DataFrame, batch_id: int,
                    writer_id: str | None = None) -> None:
        # merge-column validation happens in each routed per-table sink
        batch = batch.localCheckpoint(eager=True)  # materialize once, slice many
        for table, sink in self.sinks.items():
            slice_df = batch.filter(F.col(self.route_col) == table).drop(self.route_col)
            if slice_df.isEmpty():
                continue
            sink.apply_batch(slice_df, batch_id, writer_id=writer_id)


# ---------------------------------------------------------------------------
# Event-time windowed aggregations (ST8 — extensions the reference lacks)
# ---------------------------------------------------------------------------

def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling/sliding event-time window counts with late-data handling.
    Watermark bounds state: closed windows evict from RocksDB. The
    streaming form of dashboard Q6's date histogram."""
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select("w.start", "w.end", "event_type", "cnt", "sum_value")
    )


def sessionized_counts(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Session windows per user (gap-based). State-store-backed with
    watermark eviction."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("s"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("events_in_session"))
        .select("s.start", "s.end", "user_id", "events_in_session")
    )


def streaming_dedup(
    events: DataFrame, keys: list[str], watermark: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key within the watermark horizon:
    dropDuplicatesWithinWatermark — the streaming form of exact dedup."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


@dataclass
class RollupSink:
    """Continuous aggregate store — the reference stack's rollup-job
    shape (OpenSearch rollup/ISM jobs; Timescale continuous
    aggregates): a persisted (group(s), doc_count, sum_<col>...)
    table maintained from CDC ±deltas, so each micro-batch SHIFTS the
    aggregates instead of rescanning the mirror. ``group_col`` may be
    one dimension or a tuple of dimensions (the rollup-job
    date_histogram + terms combination); everything below is
    dimension-count agnostic.
    ``cdc_incremental_agg`` (queries/cdc_queries.py) is the
    batch / oracle-checked form of the same delta algebra; this is its
    checkpointed streaming realization, fed from the changelog's
    before/after images (REPLICA IDENTITY FULL, the same requirement
    the reference pipeline has — setup.sh:59-65).

    Metric algebra (the OpenSearch rollup-job metric set):

    - ``doc_count`` and ``sum_<c>`` / ``valcnt_<c>`` (value_count)
      are additive — delta-maintained directly.
    - ``avg_<c>`` is derived at READ as sum/valcnt (never stored, so
      it can't drift from its components).
    - ``min_<c>`` / ``max_<c>`` are NOT delta-invertible under
      deletes (retiring the current extremum needs the runner-up), so
      each minmax column keeps an auxiliary (group, value, cnt)
      multiset store — the classical incremental-view-maintenance
      support table for MIN/MAX. The aux store is itself purely
      additive (±cnt per image), so it rides the SAME exactly-once
      guard and needs no mirror synchronization; a (group, value)
      whose cnt reaches 0 vanishes, which is exactly the retraction.
      Read-side min/max is a #distinct-(group,value)-row aggregate.
      Scale: the aux store is O(distinct (group, value)) — bounded by
      mirror rows but typically far smaller; the alternative
      (recompute touched groups from the mirror's pruned buckets) was
      rejected because it couples the rollup stream to the mirror
      stream's progress and reintroduces read-your-own-writes races.
      Each aux store is hash-partitioned into ``aux_num_buckets``
      bucket=N dirs by pmod(xxhash64(group..., value), nb) — the
      merge key itself — and a batch rewrites ONLY the buckets its
      ±deltas touch (a bounded driver-side list, the span store's
      proven pattern): the manifest maps every bucket to the commit
      holding its current file, so untouched buckets are REFERENCED,
      not rewritten, and per-batch aux I/O is O(|touched buckets'
      data|) instead of O(store). Bucketing by (group, value) rather
      than group alone keeps the pruning effective in the worst case
      this exists for — few groups × a high-cardinality metric column
      — where group-only bucketing would put the whole store in one
      bucket. The read path re-aggregates min/max per group across
      buckets, which a (group, value)-keyed layout leaves intact.

    Additive deltas are NOT idempotent, so replay protection is
    mandatory here, not defense-in-depth: the commit manifest records
    (writer_id, batch_id) — Spark's documented foreachBatch dedup key,
    same guard as VersionedMirrorSink — and a replayed batch is
    skipped whole. Each commit writes the full aggregate (main table
    plus aux stores) into a fresh version dir and publishes it with
    ONE atomic manifest rename (object-store safe; old versions are
    time-travel until vacuum). Rewriting the whole aggregate per batch
    IS the scale path: the rollup of a 10^11-row mirror is only as
    big as its group cardinality, so the per-batch cost is
    O(|batch| + |groups| + |aux|) and never touches the mirror."""

    path: str
    # one dimension name (str) or several (tuple) — the reference
    # rollup-job shape allows date_histogram + terms dimensions
    # together; every delta/merge/read below is dimension-count
    # agnostic via _groups
    group_col: "str | tuple"
    sum_cols: tuple = ()
    count_cols: tuple = ()
    avg_cols: tuple = ()
    minmax_cols: tuple = ()
    # bucket count for the minmax aux stores' hash layout; recorded in
    # the manifest and enforced across commits (a different modulus
    # would merge against the wrong bucket dirs). At 100 TB size it so
    # one bucket ≈ one task's worth of (group, value) rows.
    aux_num_buckets: int = 16

    @property
    def _groups(self) -> tuple:
        return ((self.group_col,) if isinstance(self.group_col, str)
                else tuple(self.group_col))

    # internal maintained sets: avg needs sum AND valcnt components
    # even when neither is independently requested
    @property
    def _sum_set(self) -> tuple:
        return tuple(dict.fromkeys((*self.sum_cols, *self.avg_cols)))

    @property
    def _cnt_set(self) -> tuple:
        # sum_cols ride along: SQL SUM over zero non-null values is
        # NULL, but an additive delta-sum whose contributions all
        # retired lands on 0.0 — the non-null count disambiguates
        return tuple(dict.fromkeys(
            (*self.count_cols, *self.avg_cols, *self.sum_cols)
        ))

    @property
    def _metric_cols(self) -> list:
        return ["doc_count",
                *[f"sum_{c}" for c in self._sum_set],
                *[f"valcnt_{c}" for c in self._cnt_set]]

    def delta_frame(self, img: DataFrame, group, sign: int) -> DataFrame:
        """Project one image side (before or after payload rows) to the
        signed-delta shape ``apply_batch`` merges: ±doc_count, ±sums,
        ±non-null counts, and the RAW value for each minmax column
        (its sign rides doc_count). ``group`` is one Column (single
        dimension) or a list of Columns matching _groups."""
        groups = group if isinstance(group, (list, tuple)) else [group]
        if len(groups) != len(self._groups):
            raise ValueError(
                f"delta_frame got {len(groups)} group expression(s) for "
                f"dimensions {self._groups}"
            )
        return img.select(
            *[g.alias(n) for g, n in zip(groups, self._groups)],
            F.lit(sign).cast("long").alias("doc_count"),
            *[(F.lit(sign) * F.col(c)).alias(f"sum_{c}")
              for c in self._sum_set],
            *[(F.lit(sign) * F.col(c).isNotNull().cast("long"))
              .alias(f"valcnt_{c}") for c in self._cnt_set],
            *[F.col(c).alias(f"mmval_{c}") for c in self.minmax_cols],
        )

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
        import json

        names = self._manifests()
        if not names:
            return None
        with open(os.path.join(self._commits_dir, names[-1])) as fh:
            return json.load(fh)

    def exists(self) -> bool:
        return bool(self._manifests())

    def _manifest_at(self, version: "int | None") -> dict:
        import json

        if version is None:
            manifest = self.latest_manifest()
            if manifest is None:
                raise FileNotFoundError(
                    f"no committed rollup under {self.path}"
                )
            return manifest
        name = f"v{version:08d}.json"
        if name not in self._manifests():
            raise FileNotFoundError(
                f"no committed rollup version {version} under {self.path}"
            )
        with open(os.path.join(self._commits_dir, name)) as fh:
            return json.load(fh)

    def _read_main(self, spark: SparkSession, manifest: dict) -> DataFrame:
        return spark.read.schema(
            T.StructType.fromJson(manifest["schema"])
        ).parquet(os.path.join(self._data_dir, manifest["commit"], "main"))

    def _aux_bucket_expr(self, value_col) -> "F.Column":
        """The aux store's bucket key: pmod over the MERGE key
        (group dims + value) — identical expression on the write and
        probe sides, so touched-bucket pruning is exact."""
        return F.pmod(
            F.xxhash64(*[F.col(g) for g in self._groups], value_col),
            F.lit(self.aux_num_buckets),
        )

    def _read_aux(self, spark: SparkSession, manifest: dict,
                  col: str, buckets: "list | None" = None) -> DataFrame:
        """The aux multiset slice covering ``buckets`` (None = every
        bucket in the manifest's map): reads ONLY the mapped bucket=N
        dirs with an explicit schema — neither the scan nor schema
        resolution sweeps unrelated commits. Legacy (pre-bucketing)
        manifests stored the whole aux under one commit dir and are
        read whole."""
        schema = T.StructType.fromJson(manifest["aux_schemas"][col])
        bucket_map = manifest.get("aux_buckets", {}).get(col)
        if bucket_map is None:  # legacy whole-store layout
            return spark.read.schema(schema).parquet(
                os.path.join(self._data_dir, manifest["commit"],
                             f"mm_{col}")
            )
        wanted = (set(bucket_map) if buckets is None
                  else {str(b) for b in buckets} & set(bucket_map))
        dirs = [
            os.path.join(self._data_dir, commit, f"mm_{col}",
                         f"bucket={b}")
            for b, commit in sorted(bucket_map.items())
            if b in wanted
        ]
        if not dirs:
            return spark.createDataFrame([], schema)
        return spark.read.schema(schema).parquet(*dirs)

    def read(self, spark: SparkSession, version: "int | None" = None,
             internal: bool = False) -> DataFrame:
        """The published aggregate: group, doc_count, the REQUESTED
        metric columns (sum_<c>, valcnt_<c>), plus the derived ones —
        avg_<c> = sum/valcnt computed here (null when a group has no
        non-null values, SQL AVG semantics) and min_<c>/max_<c>
        aggregated from the aux multiset stores (left-joined
        null-safely so a NULL group key still gets its extrema).
        ``internal=True`` keeps the maintained-only components
        (avg's sum/valcnt) — the re-aggregation inputs rollup search
        needs (avg over a coarser bucket is SUM(sum)/SUM(valcnt),
        never avg-of-avgs)."""
        manifest = self._manifest_at(version)
        out = self._read_main(spark, manifest)
        for c in self.minmax_cols:
            mm = (
                self._read_aux(spark, manifest, c)
                .groupBy(*[
                    F.col(g).alias(f"_mm_g{i}")
                    for i, g in enumerate(self._groups)
                ])
                .agg(F.min("value").alias(f"min_{c}"),
                     F.max("value").alias(f"max_{c}"))
            )
            cond = None
            for i, g in enumerate(self._groups):
                clause = out[g].eqNullSafe(mm[f"_mm_g{i}"])
                cond = clause if cond is None else (cond & clause)
            out = out.join(mm, cond, "left").drop(
                *[f"_mm_g{i}" for i in range(len(self._groups))]
            )
        for c in self._sum_set:
            out = out.withColumn(
                f"sum_{c}",
                F.when(F.col(f"valcnt_{c}") > 0, F.col(f"sum_{c}")),
            )
        for c in self.avg_cols:
            out = out.withColumn(
                f"avg_{c}", F.col(f"sum_{c}") / F.col(f"valcnt_{c}")
            )
        if internal:
            return out
        # maintained-only components (avg internals) are not published
        hidden = (
            {f"sum_{c}" for c in self._sum_set if c not in self.sum_cols}
            | {f"valcnt_{c}" for c in self._cnt_set
               if c not in self.count_cols}
        )
        return out.drop(*hidden) if hidden else out

    def apply_batch(self, deltas: DataFrame, batch_id: int,
                    writer_id: str | None = None) -> None:
        """Merge a signed-delta frame (the ``delta_frame`` shape) into
        the persisted aggregate: additive sums into the main table,
        ±cnt per (group, value) into each minmax aux store. Groups
        whose doc_count reaches 0 vanish (a fully-deleted group must
        not linger as a zero row); likewise an aux (group, value)
        whose cnt reaches 0 — that disappearance IS the min/max
        retraction. All tables land in one commit dir published by a
        single manifest rename, so main and aux can never be observed
        at different versions."""
        import json
        import uuid

        spark = deltas.sparkSession
        manifest = self.latest_manifest()
        if (
            manifest is not None
            and batch_id >= 0
            and manifest.get("batch_id") == batch_id
            and manifest.get("writer_id") == writer_id
        ):
            return  # replayed batch: additive merge MUST NOT reapply
        if (manifest is not None
                and "aux_num_buckets" in manifest
                and manifest["aux_num_buckets"] != self.aux_num_buckets):
            raise ValueError(
                f"rollup store at {self.path} was written with "
                f"aux_num_buckets={manifest['aux_num_buckets']}; this "
                f"sink has {self.aux_num_buckets} — merging under a "
                "different modulus would miss bucket dirs"
            )
        metric_cols = self._metric_cols
        agg = deltas.groupBy(*self._groups).agg(
            *[F.sum(c).alias(c) for c in metric_cols]
        )
        if manifest is not None:
            agg = (
                self._read_main(spark, manifest)
                .unionByName(agg)
                .groupBy(*self._groups)
                .agg(*[F.sum(c).alias(c) for c in metric_cols])
            )
        merged = agg.filter(F.col("doc_count") != 0)
        version = (manifest["version"] + 1) if manifest else 1
        commit = f"commit-{uuid.uuid4().hex[:12]}"
        commit_dir = os.path.join(self._data_dir, commit)
        merged.write.mode("overwrite").parquet(
            os.path.join(commit_dir, "main")
        )
        aux_schemas = {}
        aux_buckets = {}
        legacy = manifest is not None and "aux_buckets" not in manifest
        for c in self.minmax_cols:
            delta = (
                deltas
                .filter(F.col(f"mmval_{c}").isNotNull())
                .select(
                    *self._groups,
                    F.col(f"mmval_{c}").alias("value"),
                    F.col("doc_count").alias("cnt"),
                )
            )
            old_map = (manifest or {}).get("aux_buckets", {}).get(c, {})
            if old_map or legacy:
                # one micro-batch's distinct bucket list — bounded by
                # aux_num_buckets, the span store's driver-side pattern
                touched = sorted(
                    r["b"] for r in delta.select(
                        self._aux_bucket_expr(F.col("value")).alias("b")
                    ).distinct().collect()
                )
            else:
                # nothing to prune or carry (first commit, or every
                # prior bucket emptied): the touched list only gates
                # which OLD buckets merge, so the probe job is pure
                # overhead here — the write below derives the actual
                # bucket map from its own output dirs (r15, one fewer
                # Spark job per single-batch rollup entry)
                touched = None
            if touched == [] and not legacy:
                # no ±delta for this column: carry the bucket map and
                # schema forward — zero aux I/O this commit
                aux_buckets[c] = old_map
                aux_schemas[c] = (
                    manifest["aux_schemas"][c] if manifest is not None
                    else json.loads(delta.schema.json())
                )
                continue
            if legacy:
                # one-time migration: fold the whole legacy store into
                # the bucketed layout (every bucket rewritten once)
                aux = self._read_aux(spark, manifest, c).unionByName(delta)
                carried = {}
            else:
                aux = delta
                if manifest is not None and old_map:
                    aux = self._read_aux(
                        spark, manifest, c, buckets=touched
                    ).unionByName(delta)
                carried = {b: cm for b, cm in old_map.items()
                           if int(b) not in set(touched or ())}
            # ONE exchange for both the multiset aggregation and the
            # bucket clustering (r15, guide §2.4): bucket =
            # pmod(xxhash64(groups..., value), nb) is a function of
            # the grouping key, so hash-partitioning by bucket already
            # clusters every (group, value) into one partition — the
            # groupBy reuses it (HashPartitioning(bucket) satisfies
            # ClusteredDistribution(bucket, groups, value)) instead of
            # adding its own shuffle, and the partitionBy write still
            # lays one file per touched bucket per commit.
            aux = (
                aux.withColumn(
                    "bucket", self._aux_bucket_expr(F.col("value"))
                )
                .repartition("bucket")
                .groupBy("bucket", *self._groups, "value")
                .agg(F.sum("cnt").alias("cnt"))
                .filter(F.col("cnt") != 0)
            )
            # file schema excludes the bucket partition column — the
            # read path targets bucket=N dirs directly
            aux_schemas[c] = json.loads(aux.drop("bucket").schema.json())
            out_dir = os.path.join(commit_dir, f"mm_{c}")
            (
                aux.write.partitionBy("bucket")
                .mode("overwrite").parquet(out_dir)
            )
            written = {}
            if os.path.isdir(out_dir):
                written = {
                    d.split("=", 1)[1]: commit
                    for d in os.listdir(out_dir) if d.startswith("bucket=")
                }
            # a touched bucket whose merged slice emptied (every cnt
            # hit 0) writes no dir and drops out of the map — that
            # disappearance IS the retraction, bucket-granular
            aux_buckets[c] = {**carried, **written}
        os.makedirs(self._commits_dir, exist_ok=True)
        tmp = os.path.join(self._commits_dir, f".tmp-v{version:08d}.json")
        final = os.path.join(self._commits_dir, f"v{version:08d}.json")
        with open(tmp, "w") as fh:
            json.dump({
                "version": version,
                "batch_id": batch_id,
                "writer_id": writer_id,
                "commit": commit,
                "schema": json.loads(merged.schema.json()),
                "aux_schemas": aux_schemas,
                "aux_buckets": aux_buckets,
                "aux_num_buckets": self.aux_num_buckets,
            }, fh)
        os.replace(tmp, final)  # the commit point

    def vacuum(self, keep_versions: int = 1) -> int:
        """GC old rollup versions (manifests first, so a crash can't
        leave a manifest referencing deleted data)."""
        import json
        import shutil

        if keep_versions < 1:
            raise ValueError(f"keep_versions must be >= 1, got {keep_versions}")
        names = self._manifests()
        keep = names[-keep_versions:]
        live = set()
        for n in names[: len(names) - len(keep)]:
            os.remove(os.path.join(self._commits_dir, n))
        for n in keep:
            with open(os.path.join(self._commits_dir, n)) as fh:
                m = json.load(fh)
            live.add(m["commit"])
            # untouched aux buckets are REFERENCED from older commits,
            # not rewritten — those commits stay live with the manifest
            for bucket_map in m.get("aux_buckets", {}).values():
                live.update(bucket_map.values())
        removed = 0
        if os.path.isdir(self._data_dir):
            for e in os.listdir(self._data_dir):
                if e.startswith("commit-") and e not in live:
                    shutil.rmtree(os.path.join(self._data_dir, e))
                    removed += 1
        return removed
