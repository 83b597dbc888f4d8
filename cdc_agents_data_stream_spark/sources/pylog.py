"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API) for a
line-oriented "applog" format no built-in reader handles: records are
``key<TAB>epoch_ms<TAB>kind<TAB>payload`` lines under a directory, one
file per shard.

This is the modern extension point for the reference's bespoke sources
(git scanner, test-report consumer — SURVEY §2.1): instead of a
driver-side collect-and-parallelize, the source reports one
InputPartition PER FILE and each executor-side reader parses only its
shard — the same parallel-scan contract as the parquet reader, so a
100 TB log directory fans out across the cluster. Schema is declared
up front (no inference pass), and the reader is a generator — no
whole-file materialization.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

APPLOG_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("ts_ms", LongType()),
        StructField("kind", StringType()),
        StructField("payload", StringType()),
    ]
)


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class AppLogReader(DataSourceReader):
    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("applog source requires a 'path' option")

    def partitions(self):
        files = sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".applog")
        )
        # one partition per shard file — the planner schedules these
        # across executors exactly like parquet splits
        return [_ShardPartition(p) for p in files]

    def read(self, partition):
        with open(partition.path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                key, ts_ms, kind, payload = line.split("\t", 3)
                yield (key, int(ts_ms), kind, payload)


class AppLogDataSource(DataSource):
    @classmethod
    def name(cls):
        return "applog"

    def schema(self):
        return APPLOG_SCHEMA

    def reader(self, schema):
        return AppLogReader(self.options)

    def simpleStreamReader(self, schema):
        return AppLogStreamReader(self.options)


def register(spark) -> None:
    """Idempotently register the applog format on this session."""
    spark.dataSource.register(AppLogDataSource)


class AppLogStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the applog format (Spark 4
    ``SimpleDataSourceStreamReader``): the offset is simply HOW MANY
    shard files have been consumed (files are append-only and sorted by
    name, the same contract as Spark's own file stream source), each
    micro-batch drains up to ``maxFilesPerBatch`` new shards, and
    ``readBetweenOffsets`` replays any committed span for recovery. The
    simple reader runs driver-side — right for control-plane-sized
    batches (the reference's notify/poll sources); bulk history loads
    use the batch reader's partition-per-shard path."""

    def __init__(self, options):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("applog source requires a 'path' option")
        self.max_files = int(options.get("maxFilesPerBatch", "1000000"))

    def _files(self):
        return sorted(
            os.path.join(self.dir, f)
            for f in os.listdir(self.dir)
            if f.endswith(".applog")
        )

    @staticmethod
    def _parse(path):
        with open(path, encoding="utf-8") as fh:
            for line in fh:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                key, ts_ms, kind, payload = line.split("\t", 3)
                yield (key, int(ts_ms), kind, payload)

    def initialOffset(self):
        return {"files": 0}

    def read(self, start):
        files = self._files()
        lo = start["files"]
        hi = min(len(files), lo + self.max_files)
        rows = [r for p in files[lo:hi] for r in self._parse(p)]
        return iter(rows), {"files": hi}

    def readBetweenOffsets(self, start, end):
        files = self._files()[start["files"] : end["files"]]
        return iter([r for p in files for r in self._parse(p)])
