"""Source connectors (SURVEY §2.1)."""

from postgres_opensearch_cdc_spark.sources.changelog import (  # noqa: F401
    file_changelog_stream,
    kafka_changelog_stream,
    jdbc_snapshot,
    incremental_jdbc_poll,
    select_tables,
)
