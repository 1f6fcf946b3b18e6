"""Environmental-gate honesty checks (round-13 verdict ask #7).

Two tests in this suite auto-unskip when their environment appears
(a Kafka broker; a protobuf wheel). Those gates rot invisibly if the
pinned pyspark drifts — e.g. transformWithStateInPandas renamed, or
the broker test's env-var contract diverging from its skip reason.
These assertions fail LOUDLY on such drift instead."""

from __future__ import annotations

import importlib
import inspect
import os


def test_transform_with_state_gate_matches_runtime():
    """The protobuf gate must be exactly 'can google.protobuf import':
    if the wheel appears, the gated test runs — so the API it would
    exercise must still exist on the pinned pyspark."""
    from postgres_opensearch_cdc_spark.streaming.stateful import (
        transform_with_state_available,
    )

    try:
        importlib.import_module("google.protobuf")
        has_protobuf = True
    except ImportError:
        has_protobuf = False
    assert transform_with_state_available() == has_protobuf

    # the API the gated test would drive must exist under this pin —
    # a pyspark upgrade that renames it would otherwise leave the
    # skip gate pointing at nothing
    from pyspark.sql.group import GroupedData

    assert hasattr(GroupedData, "transformWithStateInPandas"), (
        "pinned pyspark no longer exposes transformWithStateInPandas: "
        "the protobuf-gated tests in test_stateful.py guard a dead API"
    )
    # and the skip reason in the gated tests must still name the real
    # dependency, so a future edit can't silently decouple them
    import tests.test_stateful as ts

    src = inspect.getsource(ts)
    assert "google.protobuf unavailable" in src
    assert "transform_with_state_available" in src


def test_kafka_gate_env_var_matches_skip_reason():
    """The broker test unskips on SPARK_GRAFT_KAFKA_BOOTSTRAP; the
    skipif condition, the reason string, and the test body must all
    reference the SAME variable (drift here would mean setting the
    advertised variable no longer runs the test)."""
    import tests.test_sources as tsrc

    src = inspect.getsource(tsrc.test_kafka_stream_against_real_broker)
    assert 'os.environ["SPARK_GRAFT_KAFKA_BOOTSTRAP"]' in src
    decorators = inspect.getsource(tsrc)
    gate = decorators.split("def test_kafka_stream_against_real_broker")[0]
    gate = gate[gate.rfind("@pytest.mark.skipif"):]
    assert "SPARK_GRAFT_KAFKA_BOOTSTRAP" in gate
    assert "SPARK_GRAFT_KAFKA_BOOTSTRAP" in gate.split("reason=")[1]

    # the option map the gated test feeds readStream must keep the
    # connector's documented keys under this pyspark pin
    from postgres_opensearch_cdc_spark.sources.changelog import (
        kafka_stream_options,
    )

    opts = kafka_stream_options("broker:9092", ["t"])
    assert "kafka.bootstrap.servers" in opts
    assert "subscribe" in opts


def test_env_gates_are_the_only_skip_sites():
    """The certification baseline is '2 skipped'; census every skip
    site in the test tree so a third env gate (or a stray
    pytest.skip hiding a regression) can't blend into the expected
    count unreviewed."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    sites = []
    for path in sorted(glob.glob(os.path.join(here, "test_*.py"))):
        if os.path.basename(path) == "test_env_gates.py":
            continue  # this census's own matcher strings
        with open(path) as f:
            for lineno, line in enumerate(f, 1):
                if "pytest.mark.skipif" in line or "pytest.skip(" in line:
                    sites.append((os.path.basename(path), lineno))
    assert sites == [
        ("test_sources.py", 188),   # Kafka broker gate
        ("test_stateful.py", 111),  # protobuf / transformWithState gate
    ], (
        "skip-site census changed — if a new environmental gate is "
        f"deliberate, update this census: {sites}"
    )
