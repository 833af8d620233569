"""kafka_connect_jdbc_flatten_spark — a from-scratch PySpark-native CDC
ingest engine with the query/data-processing capabilities of
Norsk-Tipping/kafka-connect-jdbc-flatten.

The reference (a Kafka Connect JDBC sink fork) flattens nested change
records into per-container relational tables and applies them with
keyed idempotent writes.  This engine re-expresses that pipeline
Spark-first:

* ``plans.flatten_plan``   — pure-Python planner: (key_schema,
  value_schema, config) → per-table ``TableSpec`` pipelines.  Mirrors
  the reference's instruction compiler
  (``FlattenTransformation.java:135-330``) but compiles to declarative
  DataFrame expressions instead of per-record closure chains.
* ``operators.explode``    — executes a ``TableSpec`` as an
  explode_outer/select pipeline (whole-stage-codegen'd, no per-row
  Python).
* ``operators.lww``        — last-writer-wins reduction per key,
  replacing the reference's order-preserving flush machinery
  (``BufferedRecords.java:82-210``).
* ``lake.table``           — a minimal lake-table format (parquet +
  atomic manifest swap, hash-bucket layout) supplying the MERGE /
  snapshot-commit semantics the reference gets from JDBC transactions.
* ``operators.merge``      — MERGE-style keyed apply: upsert /
  whole-image replace / tombstone delete (``BufferedRecords.java``,
  ``JdbcDbWriter.java``).
* ``sources.changelog``    — deterministic synthetic CDC envelope feed
  (replayed-binlog fixture) + incremental criteria predicates
  (``TimestampIncrementingCriteria.java``).
* ``streaming.pipeline``   — Structured Streaming wrapper: file-source
  changelog tail → foreachBatch flatten+merge, checkpoint resume,
  observe() metrics.
* ``functions``            — the training-data pipeline layer: text
  quality / language-id / fingerprinting, exact + MinHash-LSH +
  SimHash dedup, embedding similarity search, multimodal binary
  plumbing.
"""

__version__ = "0.1.0"
