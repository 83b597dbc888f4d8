"""Schema bootstrap (S8): idempotent table initialization at session start.

The reference runs ``cdc-agents-schema.sql`` + ``ide-schema.sql`` on
startup with ``create table if not exists``
(config/CdcSubscriberConfig.java:177-203). The lake-native equivalent
registers the source tables as external parquet tables with explicit
schemas — ``CREATE TABLE IF NOT EXISTS`` is idempotent the same way, and
a second boot is a no-op.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# DDL column lists mirror the reference schemas
# (src/main/resources/cdc-agents-schema.sql:10-57, ide-schema.sql:1-16).
TABLE_DDL: dict[str, str] = {
    "checkpoints": (
        "thread_id STRING, checkpoint_ns STRING, checkpoint_id STRING, "
        "parent_checkpoint_id STRING, type STRING, checkpoint STRING, metadata STRING"
    ),
    "checkpoint_writes": (
        "thread_id STRING, checkpoint_ns STRING, checkpoint_id STRING, "
        "task_id STRING, idx INT, channel STRING, type STRING, blob BINARY, task_path STRING"
    ),
    "checkpoint_blobs": (
        "thread_id STRING, checkpoint_ns STRING, channel STRING, version STRING, "
        "type STRING, blob BINARY"
    ),
    "ide_checkpoints": (
        "thread_id STRING, prompt_id STRING, session_id STRING, checkpoint_ts STRING, "
        "checkpoint_id STRING, blob BINARY, task_path STRING"
    ),
}


def bootstrap_tables(spark: SparkSession, base_dir: str, database: str = "cdc_agents") -> list[str]:
    """Create the database and all source tables if absent; returns the
    table names registered. Safe to call on every boot."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    created = []
    for table, cols in TABLE_DDL.items():
        location = os.path.join(base_dir, table)
        os.makedirs(location, exist_ok=True)
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {database}.{table} ({cols}) "
            f"USING PARQUET LOCATION '{location}'"
        )
        created.append(f"{database}.{table}")
    return created
