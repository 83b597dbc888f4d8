"""SQL surface: register the engine's tables and derived views so
``spark.sql(...)`` is a first-class entry point.

The reference's users work in SQL (hand-written Postgres queries behind
the DAOs — dao/CdcCheckpointDao.java:60-187); this module gives them the
same tables as temp views plus the derived views those DAO queries build
inline, so a DAO query ports as a ``spark.sql`` string with view names:

    register_tables(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT * FROM message_writes WHERE thread_id = 't1'")
    spark.sql("SELECT * FROM latest_checkpoints")

Views are lazy plans over the parquet scans — Catalyst pushes filters and
prunes columns through them exactly as with the DataFrame API.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .queries.base import load

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def register_tables(spark: SparkSession, sf_dir: str, include_derived: bool = True) -> list[str]:
    """Create (or replace) one temp view per lake table, plus the derived
    views the reference's DAO queries assume. Returns the view names."""
    names = []
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if include_derived:
        names += register_derived_views(spark)
    return names


def register_derived_views(spark: SparkSession) -> list[str]:
    """Derived views over checkpoint-shaped tables when present, and the
    always-available analytical composites."""
    from pyspark.sql import functions as F

    names = []
    catalog = {t.name for t in spark.catalog.listTables()}
    if {"checkpoint_writes", "checkpoints"} <= catalog:
        from .operators.latest import latest_blobs_per_task, latest_checkpoints
        from .sources.checkpoints import message_writes, with_event_time

        writes = spark.table("checkpoint_writes")
        cps = spark.table("checkpoints")
        message_writes(writes).createOrReplaceTempView("message_writes")
        with_event_time(cps).createOrReplaceTempView("checkpoints_with_ts")
        latest_checkpoints(writes, cps).createOrReplaceTempView("latest_checkpoints")
        latest_blobs_per_task(writes, cps).createOrReplaceTempView("latest_blobs")
        names += ["message_writes", "checkpoints_with_ts", "latest_checkpoints", "latest_blobs"]
    if "events" in catalog:
        ev = spark.table("events")
        ev.select(
            "user_id",
            "event_id",
            "event_type",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            "value",
        ).createOrReplaceTempView("events_ms")
        names.append("events_ms")
    return names


def register_functions(spark: SparkSession) -> list[str]:
    """Register the engine's kernels as SQL-callable functions, making
    ``spark.sql`` a complete surface:

    - ``zmorton(x, y)`` / ``tok_count(t)`` / ``quality_ratio(t)`` are SQL
      scalar functions (CREATE TEMPORARY FUNCTION ... RETURN <expr>) — the
      body inlines into the calling plan, so they cost NOTHING over
      writing the expression by hand (whole-stage codegen, pushdown, the
      lot). This is the right way to package reusable lake expressions.
    - ``myers_diff_json(before, after)`` / ``json_canon(s)`` wrap the
      Python kernels (functions/diffkernel.py, functions/jsoncanon.py)
      for ad-hoc SQL use; the production path for bulk diffing stays the
      Arrow-batched keyed pipeline (streaming/pipeline.py) — a per-row
      Python UDF is the documented slow lane here, priced for
      interactive queries, not scans.
    """
    import json as _json

    from .functions.diffkernel import diff_lines
    from .functions.jsoncanon import canonicalize_lines
    from .operators.zorder import zorder_expr_sql

    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION zmorton(x BIGINT, y BIGINT) "
        "RETURNS BIGINT RETURN " + zorder_expr_sql(["x", "y"], 10)
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION tok_count(t STRING) "
        "RETURNS BIGINT RETURN CAST(size(split(t, ' ')) AS BIGINT)"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION quality_ratio(t STRING) "
        "RETURNS BIGINT RETURN CAST(ROUND(length(regexp_replace(t, '[^a-z ]', '')) "
        "* 1e6 / GREATEST(length(t), 1)) AS BIGINT)"
    )
    spark.udf.register(
        "myers_diff_json",
        lambda a, b: _json.dumps(
            diff_lines(
                a.split("\n") if a else [], b.split("\n") if b else []
            )
        ),
        "string",
    )
    spark.udf.register(
        "json_canon",
        lambda s: "\n".join(canonicalize_lines(s)) if s is not None else None,
        "string",
    )
    return ["zmorton", "tok_count", "quality_ratio", "myers_diff_json", "json_canon"]
