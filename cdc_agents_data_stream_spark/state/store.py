"""Parquet-backed upsert state store (S7) and append-only diff log.

The reference upserts the per-session document via JPA find-or-create +
saveAndFlush (repository/CdcAgentsDataStreamRepository.java:16-29). The
lake-native equivalent is MERGE INTO keyed on ``session_id``; on plain
parquet (no Delta in this container) the merge is implemented with a
miniature table-format commit protocol, hash-bucketed so a MERGE costs
O(touched buckets), not O(total store):

- rows live in ``N_BUCKETS`` hash buckets of the merge key; each bucket's
  current data is one parquet directory;
- a JSON **manifest** maps bucket id -> data directory; ``upsert`` writes
  ONLY the buckets the update touches (old bucket rows anti-joined against
  the update's keys, plus the update rows) into a new versioned directory
  in a single partitioned write job, then commits a new manifest that
  repoints just those buckets;
- the pointer file ``_VERSION`` is atomically replaced to commit;
- recent manifests are retained so concurrent readers that already
  resolved an old pointer finish cleanly; version directories no retained
  manifest references are vacuumed.

The bucket hash is md5-based so it is computable identically from a Spark
expression AND plain Python — the streaming pipeline's small-batch fast
path reads/writes buckets driver-side with pyarrow (zero Spark jobs),
while large batches run the distributed MERGE; both address the same
bucket layout.

At 100 TB this is the shape that survives: a batch touching 0.1% of
sessions rewrites ~0.1% of buckets, never the full store. On a real
deployment this class is replaced by a Delta/Iceberg table and ``upsert``
becomes one ``MERGE INTO`` — call sites do not change.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import uuid

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import CHECKPOINT_DIFFS_SCHEMA, DATA_STREAM_STATE_SCHEMA

_BUCKET_COL = "__bucket"

# pyarrow twins of the sink schemas (Spark IntegerType == int32), so the
# driver fast path and the distributed path produce byte-compatible files.
_STATE_PA_SCHEMA = pa.schema(
    [
        ("session_id", pa.string()),
        ("sequence_number", pa.int32()),
        ("cdc_content", pa.string()),
        ("ide_content", pa.string()),
        ("metadata", pa.string()),
        ("ctx", pa.string()),
        ("cdc_checkpoint_diffs", pa.string()),
        ("ide_checkpoint_diffs", pa.string()),
        ("updated_ts_millis", pa.int64()),
    ]
)
_DIFFS_PA_SCHEMA = pa.schema(
    [
        ("session_id", pa.string()),
        ("sequence_number", pa.int32()),
        ("source", pa.string()),
        ("diff_data", pa.string()),
        ("ts_millis", pa.int64()),
    ]
)


def bucket_of(key: str, n_buckets: int) -> int:
    """Python twin of ``ParquetStateStore._bucket_expr`` — first 8 hex chars
    of md5, mod n_buckets."""
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16) % n_buckets


class ParquetStateStore:
    KEEP_VERSIONS = 3
    N_BUCKETS = 64

    def __init__(self, spark: SparkSession, path: str, n_buckets: int | None = None):
        self.spark = spark
        self.path = path
        self.n_buckets = n_buckets or self.N_BUCKETS
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

    def _manifest_file(self, v: int) -> str:
        return os.path.join(self.path, f"_manifest_v{v:08d}.json")

    def _manifest(self, v: int) -> dict[str, str]:
        """bucket id (str) -> data dir path relative to ``self.path``."""
        if v == 0:
            return {}
        with open(self._manifest_file(v)) as fh:
            return json.load(fh)["buckets"]

    def _commit(self, v: int, buckets: dict[str, str]) -> None:
        mtmp = self._manifest_file(v) + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump({"version": v, "buckets": buckets}, fh)
        os.replace(mtmp, self._manifest_file(v))
        ptmp = self._pointer_file() + ".tmp"
        with open(ptmp, "w") as fh:
            fh.write(str(v))
        os.replace(ptmp, self._pointer_file())  # atomic on POSIX

    def _vacuum(self, current: int) -> None:
        """Drop version dirs no retained manifest references, and manifests
        older than the retention window. A v-dir from an old version stays
        alive as long as a retained manifest still points at one of its
        buckets (untouched buckets are never rewritten)."""
        lo = max(1, current - self.KEEP_VERSIONS + 1)
        referenced: set[str] = set()
        for v in range(lo, current + 1):
            try:
                for rel in self._manifest(v).values():
                    referenced.add(rel.split("/", 1)[0])
            except FileNotFoundError:
                continue
        for name in os.listdir(self.path):
            full = os.path.join(self.path, name)
            if name.startswith("v") and name[1:].isdigit() and name not in referenced:
                shutil.rmtree(full, ignore_errors=True)
            elif name.startswith("_manifest_v") and name.endswith(".json"):
                mv = int(name[len("_manifest_v") : -len(".json")])
                if mv < lo:
                    os.unlink(full)

    # -- distributed (Spark) API -----------------------------------------------

    def _bucket_expr(self, key: str):
        # md5 prefix → bigint, mod n_buckets: identical to ``bucket_of``
        return F.pmod(
            F.conv(F.substring(F.md5(F.col(key)), 1, 8), 16, 10).cast("bigint"),
            F.lit(self.n_buckets),
        ).cast("int")

    def exists(self) -> bool:
        return self.current_version() > 0

    def _bucket_paths(self, v: int, buckets: set[int] | None = None) -> list[str]:
        man = self._manifest(v)
        items = man.items() if buckets is None else ((b, p) for b, p in man.items() if int(b) in buckets)
        return [os.path.join(self.path, rel) for _, rel in items]

    def read(self, keys: DataFrame | None = None, key: str = "session_id") -> DataFrame:
        """Current snapshot. With ``keys`` (a DataFrame holding ``key``),
        only the buckets those keys hash to are scanned — the point-lookup /
        per-batch shape: state I/O proportional to the batch, not the store."""
        v = self.current_version()
        if v == 0:
            return self.spark.createDataFrame([], DATA_STREAM_STATE_SCHEMA)
        wanted = None
        if keys is not None:
            wanted = {
                r[0] for r in keys.select(self._bucket_expr(key)).distinct().collect()
            }
        paths = self._bucket_paths(v, wanted)
        if not paths:
            return self.spark.createDataFrame([], DATA_STREAM_STATE_SCHEMA)
        return self.spark.read.parquet(*paths)

    def upsert(self, updates: DataFrame, key: str = "session_id") -> None:
        """MERGE: rows in ``updates`` replace same-key rows, others kept.
        Only the touched buckets are read and rewritten (one partitioned
        write job); the update keyset is broadcast into the anti-join —
        the same shape Delta's MERGE uses for a small source."""
        v = self.current_version()
        updates_b = updates.withColumn(_BUCKET_COL, self._bucket_expr(key))
        touched = {r[0] for r in updates_b.select(_BUCKET_COL).distinct().collect()}
        if not touched:
            return
        old_paths = self._bucket_paths(v, touched) if v else []
        if old_paths:
            old = self.spark.read.parquet(*old_paths).withColumn(
                _BUCKET_COL, self._bucket_expr(key)
            )
            merged = old.join(
                F.broadcast(updates.select(key)), key, "left_anti"
            ).unionByName(updates_b)
        else:
            merged = updates_b
        nv = v + 1
        # cluster rows by bucket before the dynamic-partition write: one
        # file per bucket instead of (tasks × buckets) fragments — the same
        # pre-write repartition Delta's MERGE does; AQE coalesces the tiny
        # shuffle at test scale
        merged.repartition(F.col(_BUCKET_COL)).write.mode("overwrite").partitionBy(
            _BUCKET_COL
        ).parquet(self._version_dir(nv))
        buckets = dict(self._manifest(v))
        vname = f"v{nv:08d}"
        for b in touched:
            buckets[str(b)] = f"{vname}/{_BUCKET_COL}={b}"
        self._commit(nv, buckets)
        self._vacuum(nv)

    # -- driver-side (pyarrow) API — the small-batch fast path -----------------

    def read_docs(self, session_ids: list[str]) -> dict[str, dict]:
        """Point-lookup of state rows by key, driver-side, zero Spark jobs.
        Reads only the buckets the keys hash to."""
        v = self.current_version()
        if v == 0 or not session_ids:
            return {}
        wanted = {bucket_of(s, self.n_buckets) for s in session_ids}
        ids = set(session_ids)
        out: dict[str, dict] = {}
        for p in self._bucket_paths(v, wanted):
            try:
                t = pq.read_table(p)
            except (OSError, ValueError):
                continue
            for row in t.to_pylist():
                if row["session_id"] in ids:
                    out[row["session_id"]] = row
        return out

    def upsert_rows(self, rows: list[dict]) -> None:
        """MERGE of a small row set, driver-side, zero Spark jobs. Same
        manifest commit as the distributed path — Spark readers see one
        consistent table regardless of which path wrote each version."""
        if not rows:
            return
        v = self.current_version()
        by_bucket: dict[int, list[dict]] = {}
        for r in rows:
            by_bucket.setdefault(bucket_of(r["session_id"], self.n_buckets), []).append(r)
        nv = v + 1
        vname = f"v{nv:08d}"
        man = dict(self._manifest(v))
        cols = [f.name for f in _STATE_PA_SCHEMA]
        for b, new_rows in by_bucket.items():
            keep: list[dict] = []
            old_rel = man.get(str(b))
            if old_rel is not None:
                new_keys = {r["session_id"] for r in new_rows}
                try:
                    old_rows = pq.read_table(os.path.join(self.path, old_rel)).to_pylist()
                    keep = [r for r in old_rows if r["session_id"] not in new_keys]
                except (OSError, ValueError):
                    pass
            merged = keep + [{c: r.get(c) for c in cols} for r in new_rows]
            bdir = os.path.join(self.path, vname, f"{_BUCKET_COL}={b}")
            os.makedirs(bdir, exist_ok=True)
            table = pa.Table.from_pylist(
                [{c: row[c] for c in cols} for row in merged], schema=_STATE_PA_SCHEMA
            )
            pq.write_table(table, os.path.join(bdir, "part-00000.parquet"))
            man[str(b)] = f"{vname}/{_BUCKET_COL}={b}"
        self._commit(nv, man)
        self._vacuum(nv)

    def max_sequence_number(self) -> int:
        """Driver-side poll helper (pyarrow, no Spark jobs) — used by bench
        wait loops so polling never competes with the micro-batches."""
        v = self.current_version()
        if v == 0:
            return 0
        best = 0
        for p in self._bucket_paths(v):
            try:
                t = pq.read_table(p, columns=["sequence_number"])
                vals = t.column(0).to_pylist()
                if vals:
                    best = max(best, max(vals))
            except (OSError, ValueError):
                continue
        return best


class ParquetAppendLog:
    """Append-only sink for diff documents (checkpoint_diffs table).

    SINGLE-WRITER: ``append``/``append_rows``/``compact`` must be called
    from one thread (the streaming query's foreachBatch thread in the
    pipeline). Readers are safe at any time — compaction swaps a pointer,
    never a live path.

    Replay safety: the streaming pipeline appends diffs BEFORE committing
    state, so a crash between the two replays the batch and appends the
    same diff again. ``read(dedup=True)`` collapses those replays on the
    natural key (session_id, sequence_number, source).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        os.makedirs(self.path, exist_ok=True)

    def _pointer_file(self) -> str:
        return os.path.join(self.path, "_LOGDIR")

    def _data_dir(self) -> str:
        try:
            with open(self._pointer_file()) as fh:
                return os.path.join(self.path, fh.read().strip())
        except FileNotFoundError:
            return os.path.join(self.path, "d00000001")

    def _repoint(self, name: str) -> None:
        tmp = self._pointer_file() + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(name)
        os.replace(tmp, self._pointer_file())

    def append(self, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._data_dir())

    def append_rows(self, rows: list[dict]) -> None:
        """Driver-side append, zero Spark jobs (small-batch fast path)."""
        if not rows:
            return
        d = self._data_dir()
        os.makedirs(d, exist_ok=True)
        cols = [f.name for f in _DIFFS_PA_SCHEMA]
        table = pa.Table.from_pylist(
            [{c: r.get(c) for c in cols} for r in rows], schema=_DIFFS_PA_SCHEMA
        )
        pq.write_table(table, os.path.join(d, f"part-{uuid.uuid4().hex}.parquet"))

    def read(self, schema=None, dedup: bool = False) -> DataFrame:
        d = self._data_dir()
        if not os.path.isdir(d):
            return self.spark.createDataFrame([], schema or CHECKPOINT_DIFFS_SCHEMA)
        df = self.spark.read.parquet(d)
        if dedup:
            df = df.dropDuplicates(["session_id", "sequence_number", "source"])
        return df

    def file_count(self) -> int:
        d = self._data_dir()
        if not os.path.isdir(d):
            return 0
        return sum(1 for f in os.listdir(d) if f.endswith(".parquet"))

    def compact(self, target_files: int = 4, min_files: int = 32) -> bool:
        """Small-file compaction: each micro-batch appends a few tiny
        parquet files; once ``min_files`` accumulate, rewrite the log into
        ``target_files`` files (sorted by (session, seq) so range scans
        prune) under a NEW data dir, then atomically repoint — readers that
        resolved the old pointer finish on the old dir, which is removed
        only after the swap. Single-writer (see class docstring): no append
        may run concurrently. Returns True when a compaction happened."""
        if self.file_count() < min_files:
            return False
        old = self._data_dir()
        df = self.read().sortWithinPartitions("session_id", "sequence_number")
        nxt = os.path.join(self.path, f"d{int(os.path.basename(old)[1:]) + 1:08d}")
        df.coalesce(target_files).write.mode("overwrite").parquet(nxt)
        self._repoint(os.path.basename(nxt))
        shutil.rmtree(old, ignore_errors=True)
        return True
