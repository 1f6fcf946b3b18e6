"""Query surface: the reference's dashboard/DSL operators (Q1-Q12) plus
the relational operators Spark adds (joins, windows, set ops, rollup) and
the training-data extensions (dedup, similarity, text analysis).

Each module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE`` (name → DuckDB SQL) so the driver's
correctness gate can run them side by side.
"""
