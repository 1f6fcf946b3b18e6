"""VersionedMirrorSink: the object-store-safe commit-manifest protocol.

Contracts under test:
  * merge correctness (upsert/delete/insert, last-write-wins)
  * untouched buckets are never rewritten — their files are immutable
    and byte-identical across merges
  * fully-deleted buckets vanish from the manifest with NO directory
    delete (the rmtree-free property)
  * a crash mid-merge (data files written, manifest not) leaves the
    mirror readable and exactly at the previous committed state
  * batch replay after checkpoint recovery commits nothing twice
  * vacuum removes only unreferenced commits and never the live ones
"""

from __future__ import annotations

import glob
import hashlib
import os

import pytest

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.streaming.apply import VersionedMirrorSink


def chg(spark, rows):
    return spark.createDataFrame(rows, "op string, id long, v string, offset long")


def data_file_hashes(path):
    out = {}
    for f in glob.glob(os.path.join(path, "data", "commit-*", "_bucket=*", "*.parquet")):
        with open(f, "rb") as fh:
            out[f] = hashlib.md5(fh.read()).hexdigest()
    return out


def bucket_of(spark, key, n=8):
    return (
        spark.createDataFrame([(key,)], "id long")
        .select(F.pmod(F.xxhash64("id"), F.lit(n)).alias("b"))
        .head()["b"]
    )


@pytest.fixture()
def sink(tmp_path):
    return VersionedMirrorSink(
        path=str(tmp_path / "mirror"),
        key_cols=["id"],
        seq_cols=["offset"],
        num_buckets=8,
    )


def test_merge_correctness(spark, sink):
    sink.apply_batch(chg(spark, [("c", i, f"v{i}", i) for i in range(100)]), batch_id=0)
    sink.apply_batch(
        chg(spark, [("u", 5, "v5b", 200), ("d", 7, None, 201), ("c", 100, "new", 202)]),
        batch_id=1,
    )
    state = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert len(state) == 100
    assert state[5] == "v5b"
    assert 7 not in state
    assert state[100] == "new"


def test_untouched_bucket_files_byte_identical(spark, sink):
    sink.apply_batch(chg(spark, [("c", i, f"v{i}", i) for i in range(200)]), batch_id=0)
    before = data_file_hashes(sink.path)
    assert before
    sink.apply_batch(chg(spark, [("u", 5, "v5b", 300)]), batch_id=1)
    after = data_file_hashes(sink.path)
    # immutability: every pre-existing file still present, bytes unchanged
    for f, h in before.items():
        assert after[f] == h, f"immutable data file changed: {f}"
    # new files appear only under the new commit, only the touched bucket
    tb = bucket_of(spark, 5)
    for f in set(after) - set(before):
        assert f"_bucket={tb}" in f
    assert sink.read(spark).count() == 200
    # and the manifest points untouched buckets at the OLD commit
    m = sink.latest_manifest()
    commits = set(m["buckets"].values())
    assert len(commits) == 2


def test_fully_deleted_bucket_absent_without_rmtree(spark, sink):
    ids = list(range(20))
    sink.apply_batch(chg(spark, [("c", i, "x", i) for i in ids]), batch_id=0)
    vb = bucket_of(spark, 3)
    doomed = [i for i in ids if bucket_of(spark, i) == vb]
    first_commit = next(iter(sink.latest_manifest()["buckets"].values()))
    sink.apply_batch(chg(spark, [("d", i, None, 100 + i) for i in doomed]), batch_id=1)
    state = {r["id"] for r in sink.read(spark).collect()}
    assert state == set(ids) - set(doomed)
    m = sink.latest_manifest()
    assert str(vb) not in m["buckets"]
    # rmtree-free: the old commit's data for that bucket is still on disk
    assert os.path.isdir(
        os.path.join(sink.path, "data", first_commit, f"_bucket={vb}")
    )


def test_crash_mid_merge_leaves_consistent_mirror(spark, sink):
    """Data files written but no manifest = uncommitted. Readers see the
    previous version; the next apply proceeds normally."""
    sink.apply_batch(chg(spark, [("c", i, f"v{i}", i) for i in range(50)]), batch_id=0)
    committed = {(r["id"], r["v"]) for r in sink.read(spark).collect()}
    v1 = sink.latest_manifest()["version"]

    # simulate the crash: run the data-file phase of a merge by hand —
    # write a full orphan commit dir, then "die" before the manifest
    orphan = chg(spark, [("u", 1, "CRASHED", 999)]).withColumn(
        "_bucket", F.pmod(F.xxhash64("id"), F.lit(8))
    )
    orphan.write.partitionBy("_bucket").parquet(
        os.path.join(sink.path, "data", "commit-99999999-deadbeef")
    )

    assert sink.latest_manifest()["version"] == v1
    assert {(r["id"], r["v"]) for r in sink.read(spark).collect()} == committed

    # recovery: the stream replays the batch; merge applies cleanly
    sink.apply_batch(chg(spark, [("u", 1, "v1-new", 1000)]), batch_id=1)
    state = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert state[1] == "v1-new"
    assert len(state) == 50


def test_replay_same_batch_id_is_noop(spark, sink):
    sink.apply_batch(chg(spark, [("c", 1, "a", 1)]), batch_id=0)
    sink.apply_batch(chg(spark, [("u", 1, "b", 2)]), batch_id=1)
    v = sink.latest_manifest()["version"]
    # checkpoint recovery re-delivers batch 1 — must not commit again
    sink.apply_batch(chg(spark, [("u", 1, "b", 2)]), batch_id=1)
    assert sink.latest_manifest()["version"] == v
    assert {r["v"] for r in sink.read(spark).collect()} == {"b"}


def test_vacuum_keeps_live_commits(spark, sink):
    for i in range(4):
        sink.apply_batch(chg(spark, [("u", 1, f"v{i}", i)]), batch_id=i)
    live = set(sink.latest_manifest()["buckets"].values())
    removed = sink.vacuum(keep_versions=1)
    assert removed >= 2
    remaining = set(os.listdir(os.path.join(sink.path, "data")))
    assert live <= remaining
    assert {r["v"] for r in sink.read(spark).collect()} == {"v3"}
    # exactly one manifest left
    assert len(sink._manifests()) == 1


def test_vacuum_zero_keep_versions_rejected(spark, sink):
    """vacuum(keep_versions=0) would delete every manifest and leave the
    mirror permanently unreadable — it must be rejected up front and
    leave the mirror untouched."""
    for i in range(3):
        sink.apply_batch(chg(spark, [("u", 1, f"v{i}", i)]), batch_id=i)
    manifests_before = sink._manifests()
    with pytest.raises(ValueError, match="keep_versions"):
        sink.vacuum(keep_versions=0)
    with pytest.raises(ValueError, match="keep_versions"):
        sink.vacuum(keep_versions=-1)
    assert sink._manifests() == manifests_before
    assert {r["v"] for r in sink.read(spark).collect()} == {"v2"}


def test_equal_seq_replay_batch_row_wins(spark, sink):
    """Equal-seq tie-break: a re-run backfill where the batch and the
    mirror carry the same seq must resolve the SAME way every run —
    the batch row wins. Covers the delete-vs-mirrored-update flip."""
    sink.apply_batch(
        chg(spark, [("c", 1, "a", -1), ("c", 2, "b", -1)]), batch_id=0
    )
    # replayed backfill: same seq (-1), one row now a delete, one changed
    sink.apply_batch(
        chg(spark, [("d", 1, None, -1), ("u", 2, "b2", -1)]), batch_id=1
    )
    state = {r["id"]: r["v"] for r in sink.read(spark).collect()}
    assert state == {2: "b2"}


def test_empty_mirror_after_full_delete_readable(spark, sink):
    sink.apply_batch(chg(spark, [("c", 1, "a", 1), ("c", 2, "b", 2)]), batch_id=0)
    sink.apply_batch(
        chg(spark, [("d", 1, None, 10), ("d", 2, None, 11)]), batch_id=1
    )
    df = sink.read(spark)
    assert df.count() == 0
    assert "id" in df.columns and "v" in df.columns
