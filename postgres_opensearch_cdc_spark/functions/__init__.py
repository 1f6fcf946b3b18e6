"""Column-level function library: text analysis, dedup primitives,
similarity math. All built on pyspark.sql.functions (JVM/codegen path);
pandas UDFs appear only for operations built-ins cannot express."""
