"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CDC agents data-stream processor
(haydenrear/cdc-agents-data-stream), re-expressed Spark-first.

Layout:
- ``functions``  — pure-Python kernels (diff, JSON canonicalization) and
  reusable Column-expression helpers (text, vectors).
- ``operators``  — DataFrame-level operators (latest-per-key, merge policy,
  diff, dedup, similarity, text analysis, multimodal plumbing).
- ``sources``    — batch/stream readers for the checkpoint tables, report
  side-inputs, and git metadata.
- ``plans``      — assembled batch pipelines (backfill).
- ``streaming``  — stateful Structured Streaming pipeline.
- ``state``      — parquet-backed upsert state store.
- ``queries``    — declared, oracle-checkable queries over the driver's
  synthetic TPC-H-ish tables.
"""

__version__ = "0.1.0"
