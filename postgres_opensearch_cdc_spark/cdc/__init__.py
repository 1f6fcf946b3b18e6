"""CDC envelope schemas, parsing, and the keyed upsert/delete apply engine."""

from postgres_opensearch_cdc_spark.cdc.envelope import (  # noqa: F401
    envelope_schema,
    parse_envelopes,
    events_as_changelog,
)
from postgres_opensearch_cdc_spark.cdc.apply import (  # noqa: F401
    compact_changelog,
    apply_changes,
    snapshot_then_apply,
    op_stats,
)
