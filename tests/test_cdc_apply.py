"""CDC apply-engine semantics, modeled on the reference's behavior
(SURVEY §5: generalized count-parity → full-row parity; §7.4.1
adversarial orderings). The event scripts mirror the reference's
operational cases: update-after-create, delete-after-update,
re-insert-after-delete, duplicate delivery, cross-key disorder
(FIXTURES.md §2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from postgres_opensearch_cdc_spark.cdc.apply import (
    apply_changes,
    compact_changelog,
    op_stats,
    snapshot_then_apply,
)

COLS = ["op", "id", "status", "offset"]


def chg(spark, rows):
    return spark.createDataFrame(rows, "op string, id long, status string, offset long")


def mirror_state(df):
    return {r["id"]: r["status"] for r in df.collect()}


class TestCompaction:
    def test_create_update_delete(self, spark):
        log = chg(
            spark,
            [
                ("c", 1, "NEW", 1),
                ("u", 1, "ACTIVE", 2),
                ("c", 2, "NEW", 3),
                ("d", 1, None, 4),
            ],
        )
        out = compact_changelog(log, ["id"], ["offset"])
        assert mirror_state(out) == {2: "NEW"}

    def test_last_write_wins_per_key(self, spark):
        log = chg(
            spark,
            [
                ("c", 1, "A", 1),
                ("u", 1, "B", 2),
                ("u", 1, "C", 3),
            ],
        )
        out = compact_changelog(log, ["id"], ["offset"])
        assert mirror_state(out) == {1: "C"}

    def test_reinsert_after_delete(self, spark):
        """consumer.py treats any after-image as upsert — re-insert after
        delete must resurrect the row (reference consumer.py:60-68)."""
        log = chg(
            spark,
            [("c", 1, "A", 1), ("d", 1, None, 2), ("c", 1, "REBORN", 3)],
        )
        out = compact_changelog(log, ["id"], ["offset"])
        assert mirror_state(out) == {1: "REBORN"}

    def test_duplicate_delivery_idempotent(self, spark):
        """At-least-once delivery: replaying the same event twice must not
        change the result (ST5, consumer.py:38,64-68)."""
        once = chg(spark, [("c", 1, "A", 1), ("u", 1, "B", 2)])
        twice = chg(
            spark,
            [("c", 1, "A", 1), ("u", 1, "B", 2), ("u", 1, "B", 2)],
        )
        assert mirror_state(compact_changelog(once, ["id"], ["offset"])) == mirror_state(
            compact_changelog(twice, ["id"], ["offset"])
        )

    def test_cross_key_disorder_legal(self, spark):
        """Events may interleave across keys in any order (partition key is
        the table, TDD :315-321) — only per-key order matters."""
        log = chg(
            spark,
            [
                ("c", 2, "X", 10),
                ("c", 1, "A", 1),
                ("u", 2, "Y", 11),
                ("u", 1, "B", 2),
            ],
        )
        out = compact_changelog(log, ["id"], ["offset"])
        assert mirror_state(out) == {1: "B", 2: "Y"}

    def test_delete_then_update_ordering_not_flipped(self, spark):
        """§7.4.1: delete-then-insert vs insert-then-delete must resolve by
        sequence, not arrival. Arrival order here is adversarial (delete
        arrives first in the frame but is sequenced later)."""
        log = chg(spark, [("d", 1, None, 5), ("c", 1, "A", 1)])
        out = compact_changelog(log, ["id"], ["offset"])
        assert mirror_state(out) == {}


class TestApplyChanges:
    def test_incremental_equals_batch(self, spark):
        """Applying changes in two batches == compacting the full log —
        the invariant that makes foreachBatch streaming correct."""
        batch1 = chg(spark, [("c", 1, "A", 1), ("c", 2, "B", 2)])
        batch2 = chg(spark, [("u", 1, "A2", 3), ("d", 2, None, 4)])
        full = chg(
            spark,
            [
                ("c", 1, "A", 1),
                ("c", 2, "B", 2),
                ("u", 1, "A2", 3),
                ("d", 2, None, 4),
            ],
        )
        m1 = compact_changelog(batch1, ["id"], ["offset"], drop_op_col=True).drop("offset")
        m2 = apply_changes(m1, batch2, ["id"], ["offset"])
        expected = compact_changelog(full, ["id"], ["offset"], drop_op_col=True).drop(
            "offset"
        )
        assert mirror_state(m2.select("id", "status")) == mirror_state(
            expected.select("id", "status")
        )

    def test_replay_against_mirror_is_noop(self, spark):
        """Replaying an already-applied batch against the mirror must be a
        no-op: the mirror row and the replayed change tie on content, and
        either winner yields the same state (ST3/ST5 replay semantics)."""
        batch = chg(spark, [("c", 1, "A", 1), ("c", 2, "B", 2)])
        m1 = compact_changelog(batch, ["id"], ["offset"], drop_op_col=True).drop("offset")
        m2 = apply_changes(m1, batch, ["id"], ["offset"])
        assert mirror_state(m2.select("id", "status")) == {1: "A", 2: "B"}


class TestSnapshotThenStream:
    def test_snapshot_bootstrap(self, spark):
        """ST1: snapshot rows are op='r' upserts sequenced before all
        changes (setup.sh:103 snapshot.mode=initial)."""
        snap = spark.createDataFrame([(1, "SNAP"), (2, "SNAP")], "id long, status string")
        changes = chg(spark, [("u", 1, "LIVE", 100), ("d", 2, None, 101)])
        out = snapshot_then_apply(snap, changes, ["id"], ["offset"])
        assert mirror_state(out.select("id", "status")) == {1: "LIVE"}

    def test_card_fixture_counts(self, spark):
        """The reference's own oracle: count parity + Q5 status distribution
        {ACTIVE:6, BLOCKED:1, INACTIVE:1} after full sync
        (create-sample-data.sh:15-22, test.sh:29-38, FIXTURES.md §4)."""
        statuses = ["ACTIVE"] * 6 + ["BLOCKED", "INACTIVE"]
        snap = spark.createDataFrame(
            [(i + 1, s) for i, s in enumerate(statuses)], "id long, status string"
        )
        changes = chg(spark, [])
        changes = spark.createDataFrame([], "op string, id long, status string, offset long")
        mirror = snapshot_then_apply(snap, changes, ["id"], ["offset"])
        assert mirror.count() == 8
        dist = {
            r["status"]: r["cnt"]
            for r in mirror.groupBy("status").agg(F.count(F.lit(1)).alias("cnt")).collect()
        }
        assert dist == {"ACTIVE": 6, "BLOCKED": 1, "INACTIVE": 1}


def test_op_stats(spark):
    log = chg(
        spark,
        [("r", 1, "A", 1), ("c", 2, "B", 2), ("u", 1, "C", 3), ("u", 2, "D", 4), ("d", 1, None, 5)],
    )
    stats = {r["op"]: r["cnt"] for r in op_stats(log).collect()}
    assert stats == {"r": 1, "c": 1, "u": 2, "d": 1}
