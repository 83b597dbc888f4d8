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
