"""End-to-end reference-topology parity: the reference's 3 CDC-synced
tables (card, authorize_transaction, card_authorization — FIXTURES.md §1,
reference create-sample-data.sh:5-71), snapshot + scripted change events
routed through one stream into three keyed mirrors, then the reference's
own dashboard checks (FIXTURES.md §4) answered over the mirrors:

- Q10 count parity: card=8, authorize_transaction=8, card_authorization=5
  (reference test.sh:29-38)
- Q5 status distribution on card: {ACTIVE:6, BLOCKED:1, INACTIVE:1}
  (DASHBOARD_GUIDE.md:32-35)
- Q7 is_active split on authorize_transaction: active=5/inactive=3,
  sum(pending_amount | active) = 485.00 (DASHBOARD_GUIDE.md:42-46)
- Q4 status:ACTIVE AND card_type:DEBIT → 4 rows (DASHBOARD_GUIDE.md:89)

Then live changes mutate the mirrors and the queries reflect them — the
"always-current mirror" property that is the reference's entire point.
"""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from pyspark.sql import types as T

from postgres_opensearch_cdc_spark.cdc.apply import snapshot_then_apply, apply_changes
from postgres_opensearch_cdc_spark.registry import REFERENCE_SCHEMAS


def changelog_schema(table: str) -> T.StructType:
    """(op, <row columns>, offset) — op first to match event tuples."""
    return T.StructType(
        [T.StructField("op", T.StringType())]
        + list(REFERENCE_SCHEMAS[table].fields)
        + [T.StructField("offset", T.LongType())]
    )


def card_rows():
    """The 8 sample cards (create-sample-data.sh:13-22): 6 ACTIVE /
    1 BLOCKED / 1 INACTIVE; 6 DEBIT / 2 CREDIT; rows 1,2,5,8 are
    ACTIVE+DEBIT per FIXTURES §4."""
    spec = [
        (1, "ACTIVE", "DEBIT", "VISA"),
        (2, "ACTIVE", "DEBIT", "VISA"),
        (3, "ACTIVE", "CREDIT", "MASTERCARD"),
        (4, "BLOCKED", "DEBIT", "VISA"),
        (5, "ACTIVE", "DEBIT", "MASTERCARD"),
        (6, "INACTIVE", "DEBIT", "VISA"),
        (7, "ACTIVE", "CREDIT", "MASTERCARD"),
        (8, "ACTIVE", "DEBIT", "VISA"),
    ]
    now = datetime(2024, 1, 1)
    return [
        (i, 1, 1, f"41111111111111{i:02d}", st, "PRODUCED", ct, nw, True, True, "NONE", now, now)
        for (i, st, ct, nw) in spec
    ]


def auth_txn_rows():
    """8 authorize_transaction rows (create-sample-data.sh:39-49):
    5 active with pending totalling 485.00, 3 settled."""
    pendings = [Decimal("50.00"), Decimal("75.00"), Decimal("100.00"), Decimal("110.00"), Decimal("150.00")]
    rows = []
    now = datetime(2024, 1, 1)
    for i in range(1, 9):
        active = i <= 5
        amt = pendings[i - 1] if active else Decimal("60.00")
        rows.append(
            (
                i, 1, 1, 1, date(2024, 1, 1), amt, now, False, active,
                pendings[i - 1] if active else Decimal("0.00"),
                "PURCHASE", f"REF{i:03d}",
            )
        )
    return rows


def card_auth_rows():
    now = datetime(2024, 1, 1)
    return [
        (n, 1, card_id, "PURCHASE", Decimal(50 + 25 * n), "USD", "USD", "APPROVED", now, "PURCHASE")
        for n, card_id in enumerate([1, 2, 3, 5, 7], start=1)
    ]


@pytest.fixture(scope="module")
def mirrors(spark):
    empty_changes = {
        t: spark.createDataFrame([], changelog_schema(t)) for t in REFERENCE_SCHEMAS
    }
    data = {
        "card": card_rows(),
        "authorize_transaction": auth_txn_rows(),
        "card_authorization": card_auth_rows(),
    }
    out = {}
    for t, rows in data.items():
        snap = spark.createDataFrame(rows, REFERENCE_SCHEMAS[t])
        out[t] = snapshot_then_apply(
            snap, empty_changes[t], key_cols=["id"], seq_cols=["offset"]
        ).drop("offset")
    return out


def test_q10_count_parity(mirrors):
    assert mirrors["card"].count() == 8
    assert mirrors["authorize_transaction"].count() == 8
    assert mirrors["card_authorization"].count() == 5


def test_q5_card_status_distribution(mirrors):
    dist = {
        r["status"]: r["cnt"]
        for r in mirrors["card"].groupBy("status").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert dist == {"ACTIVE": 6, "BLOCKED": 1, "INACTIVE": 1}


def test_q7_is_active_metrics(mirrors):
    row = mirrors["authorize_transaction"].agg(
        F.sum(F.when(F.col("is_active"), 1).otherwise(0)).alias("active"),
        F.sum(F.when(~F.col("is_active"), 1).otherwise(0)).alias("inactive"),
        F.sum(F.when(F.col("is_active"), F.col("pending_amount"))).alias("pending"),
    ).head()
    assert (row["active"], row["inactive"]) == (5, 3)
    assert row["pending"] == Decimal("485.00")


def test_q4_active_debit_filter(mirrors):
    rows = mirrors["card"].filter(
        (F.col("status") == "ACTIVE") & (F.col("card_type") == "DEBIT")
    )
    assert rows.count() == 4  # cards 1,2,5,8 (FIXTURES.md §4)


def test_live_changes_update_dashboard(spark, mirrors):
    """The always-current property: block a card, delete another, insert
    a ninth — Q5/Q10 reflect it immediately after the merge."""
    card = mirrors["card"]
    blocked_row = list(card_rows()[0])
    blocked_row[4] = "BLOCKED"  # card 1 ACTIVE → BLOCKED
    new_row = list(card_rows()[0])
    new_row[0] = 9
    new_row[4] = "ACTIVE"
    changes = spark.createDataFrame(
        [
            tuple(["u"] + blocked_row + [101]),
            tuple(["d"] + list(card_rows()[5]) + [102]),  # delete card 6
            tuple(["c"] + new_row + [103]),
        ],
        changelog_schema("card"),
    )
    updated = apply_changes(card, changes, key_cols=["id"], seq_cols=["offset"])
    assert updated.count() == 8  # 8 - 1 delete + 1 insert
    dist = {
        r["status"]: r["cnt"]
        for r in updated.groupBy("status").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert dist == {"ACTIVE": 6, "BLOCKED": 2}  # INACTIVE card deleted
