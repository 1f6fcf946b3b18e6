"""Property-based verification of the apply engine: for ANY event
sequence, Spark's last-write-wins compaction must equal a sequential
dict-based interpreter (the reference's consumer loop, consumer.py:53-100,
applied literally)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from postgres_opensearch_cdc_spark.cdc.apply import compact_changelog

# global spark fixture comes from conftest; hypothesis drives data

ops = st.sampled_from(["r", "c", "u", "d"])
keys = st.integers(min_value=1, max_value=5)
events = st.lists(st.tuples(ops, keys), min_size=0, max_size=30)


def reference_interpreter(seq):
    """The consumer loop verbatim: upsert on r/c/u, delete on d."""
    mirror: dict = {}
    for offset, (op, key) in enumerate(seq):
        if op == "d":
            mirror.pop(key, None)
        else:
            mirror[key] = offset
    return mirror


_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from postgres_opensearch_cdc_spark.session import get_spark

        _spark = get_spark("tests", shuffle_partitions=8)
    return _spark


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(seq=events)
def test_compaction_equals_sequential_interpreter(seq):
    spark = _get_spark()
    expected = reference_interpreter(seq)
    if not seq:
        return
    rows = [(op, key, offset) for offset, (op, key) in enumerate(seq)]
    df = spark.createDataFrame(rows, "op string, id long, offset long")
    mirror = compact_changelog(df, ["id"], ["offset"])
    got = {r["id"]: r["offset"] for r in mirror.collect()}
    assert got == expected
