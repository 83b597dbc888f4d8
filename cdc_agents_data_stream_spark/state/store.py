"""Parquet-backed upsert state store (S7) and append-only diff log.

The reference upserts the per-session document via JPA find-or-create +
saveAndFlush (repository/CdcAgentsDataStreamRepository.java:16-29). The
lake-native equivalent is MERGE INTO keyed on ``session_id``; on plain
parquet (no Delta in this container) the merge is implemented with a
miniature table-format commit protocol:

- every ``upsert`` writes a NEW versioned directory ``v{N+1}`` (full
  merged snapshot: old rows anti-joined against the update's keys, plus
  the update rows);
- a pointer file ``_VERSION`` is atomically replaced to commit;
- the previous version is retained so concurrent readers that already
  resolved the old pointer finish cleanly; only versions older than
  (current - keep) are vacuumed.

On a real deployment this class is replaced by a Delta/Iceberg table and
``upsert`` becomes one ``MERGE INTO`` — call sites do not change.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from ..schemas import DATA_STREAM_STATE_SCHEMA


class ParquetStateStore:
    KEEP_VERSIONS = 3

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(self.path, exist_ok=True)

    # -- commit protocol -------------------------------------------------------

    def _pointer_file(self) -> str:
        return os.path.join(self.path, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._pointer_file()) as fh:
                return int(fh.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _version_dir(self, v: int) -> str:
        return os.path.join(self.path, f"v{v:08d}")

    def _commit(self, v: int) -> None:
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(str(v))
        os.replace(tmp, self._pointer_file())  # atomic on POSIX

    def _vacuum(self, current: int) -> None:
        for name in os.listdir(self.path):
            if name.startswith("v") and name[1:].isdigit() and int(name[1:]) <= current - self.KEEP_VERSIONS:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)

    # -- public API ------------------------------------------------------------

    def exists(self) -> bool:
        return self.current_version() > 0

    def read(self) -> DataFrame:
        v = self.current_version()
        if v == 0:
            return self.spark.createDataFrame([], DATA_STREAM_STATE_SCHEMA)
        return self.spark.read.parquet(self._version_dir(v))

    def upsert(self, updates: DataFrame, key: str = "session_id") -> None:
        """MERGE: rows in ``updates`` replace same-key rows, others kept.
        The update keyset is broadcast into the anti-join — per-batch
        updates touch few sessions relative to the full store, so the
        store side never shuffles (same shape Delta's MERGE uses for a
        small source)."""
        current = self.read()
        from pyspark.sql import functions as F

        merged = current.join(
            F.broadcast(updates.select(key)), key, "left_anti"
        ).unionByName(updates)
        v = self.current_version() + 1
        merged.write.mode("overwrite").parquet(self._version_dir(v))
        self._commit(v)
        self._vacuum(v)


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

    def file_count(self) -> int:
        if not os.path.isdir(self.path):
            return 0
        return sum(1 for f in os.listdir(self.path) if f.endswith(".parquet"))

    def compact(self, target_files: int = 4, min_files: int = 32) -> bool:
        """Small-file compaction: each micro-batch appends a few tiny
        parquet files; once ``min_files`` accumulate, rewrite the log into
        ``target_files`` files (sorted by (session, seq) so range scans
        prune). The rewrite goes to a temp dir and swaps in atomically —
        the same pattern a Delta OPTIMIZE job runs on a schedule. Returns
        True when a compaction happened."""
        if self.file_count() < min_files:
            return False
        df = self.read().sortWithinPartitions("session_id", "sequence_number")
        tmp = self.path + ".compact-tmp"
        df.coalesce(target_files).write.mode("overwrite").parquet(tmp)
        old = self.path + ".compact-old"
        os.rename(self.path, old)
        os.rename(tmp, self.path)
        shutil.rmtree(old, ignore_errors=True)
        return True
