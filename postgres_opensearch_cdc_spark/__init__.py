"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CDC pipeline (srosio/postgres-opensearch-cdc).

The reference maintains an always-current queryable mirror of Postgres
tables in OpenSearch (snapshot + ordered INSERT/UPDATE/DELETE stream,
reference consumer.py:53-100) and answers filter/aggregate/sort analytics
over that mirror (reference DASHBOARD_GUIDE.md:30-110).

This package re-expresses those capabilities Spark-first:

- ``registry``   — explicit StructType table registry + parquet loaders
- ``cdc``        — CDC envelope schemas, parsers, keyed upsert/delete
                   compaction (the mirror-maintenance engine)
- ``queries``    — the reference's full query surface (Q1-Q12) plus the
                   relational operators Spark adds for free (joins,
                   windows, set ops, rollup)
- ``functions``  — text analysis, dedup (exact/minhash/simhash/jaccard),
                   similarity search over embeddings
- ``streaming``  — Structured Streaming apply path (foreachBatch merge,
                   watermarked event-time windows)
- ``sources``    — batch/stream source helpers (parquet, JDBC-shaped,
                   file-based changelog for tests)

Everything is DataFrame-declarative so Catalyst handles pushdown,
pruning, join strategy and AQE; Python UDFs appear only where built-in
functions genuinely cannot express the semantics (and then as
Arrow-batched pandas UDFs).
"""

__version__ = "0.1.0"
