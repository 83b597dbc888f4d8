"""Parquet-backed upsert state store (S7) and append-only diff log.

The reference upserts the per-session document via JPA find-or-create +
saveAndFlush (repository/CdcAgentsDataStreamRepository.java:16-29). The
lake-native equivalent is MERGE INTO keyed on ``session_id``; on plain
parquet (no Delta in this container) the merge is implemented as
read + anti-join + union + atomic directory swap. On a real deployment the
store would be a Delta/Iceberg table and ``upsert`` a single MERGE — the
call sites would not change.

The swap is atomic at the directory level (write to temp, rename), so
readers never observe a half-written store.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DATA_STREAM_STATE_SCHEMA


class ParquetStateStore:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def exists(self) -> bool:
        return os.path.isdir(self.path) and any(
            f.endswith(".parquet") for f in os.listdir(self.path)
        )

    def read(self) -> DataFrame:
        if not self.exists():
            return self.spark.createDataFrame([], DATA_STREAM_STATE_SCHEMA)
        return self.spark.read.parquet(self.path)

    def upsert(self, updates: DataFrame, key: str = "session_id") -> None:
        """MERGE: rows in ``updates`` replace same-key rows, others kept."""
        current = self.read()
        merged = current.join(updates.select(key), key, "left_anti").unionByName(updates)
        tmp = f"{self.path}.tmp-{uuid.uuid4().hex}"
        merged.write.mode("overwrite").parquet(tmp)
        old = f"{self.path}.old-{uuid.uuid4().hex}"
        if os.path.isdir(self.path):
            os.rename(self.path, old)
        os.rename(tmp, self.path)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)


class ParquetAppendLog:
    """Append-only sink for diff documents (checkpoint_diffs table)."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path)

    def read(self, schema=None) -> DataFrame:
        if not os.path.isdir(self.path):
            from ..schemas import CHECKPOINT_DIFFS_SCHEMA

            return self.spark.createDataFrame([], schema or CHECKPOINT_DIFFS_SCHEMA)
        return self.spark.read.parquet(self.path)
