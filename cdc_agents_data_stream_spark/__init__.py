"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference CDC agents data-stream processor
(haydenrear/cdc-agents-data-stream), re-expressed Spark-first.

Layout:
- ``functions``  — pure-Python kernels (diff, JSON canonicalization) and
  reusable Column-expression helpers (text, vectors).
- ``operators``  — DataFrame-level operators (latest-per-key, merge policy,
  diff, dedup, similarity, sketches, text analysis, sampling, temporal
  joins/windows, multimodal plumbing).
- ``sources``    — batch/stream readers for the checkpoint tables, report
  side-inputs, git metadata, and generic c/u/d CDC envelopes.
- ``plans``      — assembled batch pipelines (backfill).
- ``streaming``  — stateful Structured Streaming pipelines (foreachBatch
  state loop, dual-stream fan-in, continuous-aggregate IVM).
- ``state``      — parquet-backed bucketed MERGE state store (optimistic
  multi-writer commits, deletes, schema evolution, time travel).
- ``queries``    — 97 declared queries, each paired with a DuckDB oracle.
- ``sql``        — ``register_tables(spark, sf_dir)`` exposes every lake
  table and the DAO-shaped derived views to ``spark.sql``.

Quick start::

    from cdc_agents_data_stream_spark.session import get_spark
    from cdc_agents_data_stream_spark.sql import register_tables
    spark = get_spark()
    register_tables(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT * FROM latest_checkpoints").show()

    # or the library surface:
    from cdc_agents_data_stream_spark.operators import dedup
    pairs = dedup.minhash_lsh_pairs(spark.table("documents"))
"""

__version__ = "0.3.0"
