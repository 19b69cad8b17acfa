"""ton_etl_spark — a from-scratch PySpark-native CDC / incremental-ingest
analytics engine with the query semantics of ton-studio/ton-etl.

The reference (read-only at /root/reference) is a Kafka-consumer /
Postgres-upsert CDC pipeline plus an Athena SQL mart layer.  This package
re-expresses the same semantics Spark-first:

- ``ton_etl_spark.lake``       — versioned Parquet lake tables with atomic
  commits, bucketed copy-on-write MERGE (LWW), additive schema evolution and
  idempotent commit manifests (the role Postgres ``ON CONFLICT`` upserts and
  the Athena ``EXCEPT`` dedup play in the reference).
- ``ton_etl_spark.cdc``        — the change-log data model (Debezium-style
  envelope), a deterministic scale-parametric generator, batch replay, and a
  Structured Streaming tail.
- ``ton_etl_spark.operators``  — relational operators from SURVEY.md §2
  (as-of join, LWW snapshots, dedup families, similarity search, ...).
- ``ton_etl_spark.functions``  — vectorized scalar/pandas functions
  (Debezium decimal decode, token validation, text analysis).
- ``ton_etl_spark.plans``      — analytic parity queries with DuckDB oracles.
- ``ton_etl_spark.streaming``  — windowed streaming metrics (the
  prometheus_exporter analog).
"""

__version__ = "0.1.0"
