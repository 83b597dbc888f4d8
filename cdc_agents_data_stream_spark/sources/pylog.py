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
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
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

    def writer(self, schema, overwrite):
        return AppLogWriter(self.options, overwrite)

    def streamWriter(self, schema, overwrite):
        return AppLogStreamWriter(self.options, overwrite)


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


# --- write path: the other half of the custom-connector contract -----------

class _ShardCommit(WriterCommitMessage):
    """Per-task commit message: the staged temp file and its row count
    (picklable — it travels executor → driver)."""

    def __init__(self, tmp_path: str, n_rows: int):
        self.tmp_path = tmp_path
        self.n_rows = n_rows


class AppLogWriter(DataSourceWriter):
    """Partition-parallel applog writer with a stage-then-rename commit:
    each task streams its rows to a uniquely named ``_tmp-*`` file and
    reports it in the commit message; only the DRIVER's commit() renames
    staged files into visible ``part-NNNNN.applog`` names (and abort()
    deletes them), so failed/speculative task attempts never publish
    partial shards — the same two-phase protocol every production sink
    uses, here over the DataSourceWriter API."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("applog sink requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator):
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex}.applog")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row.key}\t{row.ts_ms}\t{row.kind}\t{row.payload}\n")
                n += 1
        return _ShardCommit(tmp, n)

    def commit(self, messages):
        if self.overwrite:
            for f in os.listdir(self.dir):
                if f.endswith(".applog") and not f.startswith("_tmp-"):
                    os.remove(os.path.join(self.dir, f))
        idx = 0
        for m in messages:
            if m is None:
                continue
            if m.n_rows == 0:
                os.remove(m.tmp_path)
                continue
            os.rename(m.tmp_path, os.path.join(self.dir, f"part-{idx:05d}.applog"))
            idx += 1

    def abort(self, messages):
        for m in messages or []:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)


class AppLogStreamWriter(DataSourceStreamWriter):
    """Streaming half of the applog SINK: same stage-then-rename commit
    as the batch writer, but published names carry the micro-batch id
    (``part-b{batchId:06d}-{i:05d}.applog``), so a replayed batch after
    a crash re-publishes the SAME names — the sink is idempotent under
    the engine's at-least-once batch replay, which is exactly how
    exactly-once file sinks are built (the batch id is the dedup key)."""

    def __init__(self, options, overwrite: bool):
        self.dir = options.get("path")
        if not self.dir:
            raise ValueError("applog stream sink requires a 'path' option")

    def write(self, iterator):
        import uuid

        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f"_tmp-{uuid.uuid4().hex}.applog")
        n = 0
        with open(tmp, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(f"{row.key}\t{row.ts_ms}\t{row.kind}\t{row.payload}\n")
                n += 1
        return _ShardCommit(tmp, n)

    def commit(self, messages, batchId):
        idx = 0
        for m in messages:
            if m is None:
                continue
            if m.n_rows == 0:
                os.remove(m.tmp_path)
                continue
            final = os.path.join(self.dir, f"part-b{batchId:06d}-{idx:05d}.applog")
            os.replace(m.tmp_path, final)  # replace: idempotent on batch replay
            idx += 1

    def abort(self, messages, batchId):
        for m in messages or []:
            if m is not None and os.path.exists(m.tmp_path):
                os.remove(m.tmp_path)
