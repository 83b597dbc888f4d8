"""Streaming CDC pipeline (X1-X10) on Structured Streaming.

The reference's NOTIFY-driven loop (one Postgres LISTEN callback per
(thread_id, checkpoint_id); subscriber/AgentsPostgresSubscriber.java:28-49)
maps to an incremental scan of the append-only ``checkpoint_writes`` table:
each micro-batch sees the new write rows, joins the checkpoint pointer
table for event time, reduces to the latest blob per (session, task), and
feeds the same keyed state transition as the batch backfill. Two
equivalent execution paths are provided:

- ``run_foreachbatch_pipeline``: readStream → foreachBatch{ join + argmax +
  applyInPandas transition + MERGE state store + append diff log }. State
  lives in the engine's own lake tables (the reference's
  ``cdc_agents_data_stream`` sink, S7); exactly-once via the streaming
  checkpoint + idempotent MERGE. This is the production-shaped path.
- ``run_stateful_pipeline``: readStream → groupBy(session).
  ``applyInPandasWithState`` (X1 keyed state held by Spark's state store),
  emitting one (session, seq, state, diff) row per updated session per
  batch. This is the Spark-idiomatic "custom stateful operator" path.

Semantics inherited from the transition function (operators/merge.py):
X2 merge policy, X3 event-time staleness drop, X6 monotone seq. Per-key
ordering (X8) is free — a session hashes to one state partition and
micro-batches are serial within the query. The reference's read-repair
(X4) is superseded by the deterministic within-batch argmax.

At scale: the writes source is partitioned/bucketed by ``thread_id`` so
the groupBy shuffles align; the checkpoint pointer join broadcasts when
the per-batch slice is small; state size stays bounded because content
maps hold only the latest item per task (plus ``__start__`` history) —
diffs go to the append-only log, not into state.
"""

from __future__ import annotations

import json
import os
import time
from datetime import datetime, timezone
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.merge import transition
from ..plans.backfill import apply_transition_batch, doc_to_state_row, state_row_to_doc
from ..schemas import CHECKPOINT_WRITES_SCHEMA
from ..state.store import ParquetAppendLog, ParquetStateStore


def read_writes_stream(spark: SparkSession, writes_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based incremental source over the append-only writes table
    (S1's Spark-idiomatic replacement; with Kafka+Debezium in production
    this becomes ``spark.readStream.format('kafka')`` + payload parse S2)."""
    reader = spark.readStream.schema(CHECKPOINT_WRITES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(writes_dir)


def _parse_ts_millis(s: str | None) -> int | None:
    """Python twin of ``to_timestamp(...)`` + ``unix_millis`` on a UTC
    session: ISO/space-separated timestamp text → epoch millis."""
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s)
    except ValueError:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


def run_foreachbatch_pipeline(
    spark: SparkSession,
    writes_dir: str,
    checkpoints_path: str,
    state_store: ParquetStateStore,
    diff_log: ParquetAppendLog,
    checkpoint_location: str,
    source: str = "cdc",
    trigger: dict[str, Any] | None = None,
    max_files_per_trigger: int | None = None,
    ctx_providers=None,
    small_batch_max_rows: int = 500,
):
    """Production-shaped path: stream writes, join the (slow-changing)
    checkpoint pointer table, MERGE per-session state docs.

    ``max_files_per_trigger`` bounds how much of the backlog one micro-batch
    absorbs. Left unset, a slow batch absorbs every tick that arrived in the
    meantime and the latest-per-task reduction collapses them into ONE state
    transition (the reference's staleness-drop semantics X3 applied across
    the collapsed ticks); set to 1 to mirror the reference's one-transition-
    per-NOTIFY-event cadence exactly.

    Exactly-once: diffs are appended BEFORE the state commit, keyed by
    (session_id, sequence_number, source). A crash between the two replays
    the batch against the uncommitted state, recomputes the identical diff,
    and appends it again — ``diff_log.read(dedup=True)`` collapses the
    replica. (Diff-after-state would instead LOSE the diff: on replay the
    transition sees the update already absorbed and emits None.)

    Two execution paths per micro-batch, chosen by measured batch size —
    the same transition kernel, state bucket layout, and commit protocol
    serve both, so they interleave freely on one store:

    - **small batch** (≤ ``small_batch_max_rows`` rows — the reference's
      cadence is 5 rows/tick): the rows are collected once and the whole
      join → latest-per-task → transition → MERGE → diff append runs
      driver-side on pyarrow. Spark job launch costs a fixed ~0.2 s on the
      test host regardless of data size, so a 5-row tick through the
      distributed plan pays ~7 job launches of pure overhead; the fast
      path pays ONE (the collect). This is how the 2-batches/s reference
      cadence is matched.
    - **large batch** (backlog absorption, backfill-scale): the
      distributed plan — broadcast the write slice against the cached
      pointer table, bucket-pruned state read, grouped Arrow transition,
      bucketed MERGE. This is the path that scales to 1000 executors; the
      threshold only decides who pays the per-job overhead.

    The checkpoint pointer lookup is cached across batches in both paths
    (driver dict keyed by checkpoint_id / cached DataFrame)."""
    stream = read_writes_stream(spark, writes_dir, max_files_per_trigger)
    cps_df_cache: list[DataFrame] = []
    cps_ts_cache: dict[str, int | None] = {}

    def _cps_ts_lookup(ids: set[str]) -> dict[str, int]:
        """checkpoint_id -> event-time millis from the pointer table's
        jsonb ($.ts), via a pyarrow predicate-pushdown read of only the
        missing ids (row groups prune on checkpoint_id)."""
        missing = [i for i in ids if i not in cps_ts_cache]
        if missing:
            import pyarrow.dataset as ds

            tbl = ds.dataset(checkpoints_path, format="parquet").to_table(
                columns=["checkpoint_id", "checkpoint"],
                filter=ds.field("checkpoint_id").isin(missing),
            )
            for cid, cp in zip(
                tbl.column("checkpoint_id").to_pylist(), tbl.column("checkpoint").to_pylist()
            ):
                try:
                    ts = json.loads(cp).get("ts") if cp else None
                except (ValueError, TypeError):
                    ts = None
                cps_ts_cache[cid] = _parse_ts_millis(ts)
            for cid in missing:
                cps_ts_cache.setdefault(cid, None)
        return {i: cps_ts_cache[i] for i in ids if cps_ts_cache.get(i) is not None}

    def _process_small(rows: list[dict], now_ms: int) -> None:
        msg = [
            r
            for r in rows
            if r["channel"] == "messages" and r["type"] == "list" and r["blob"]
        ]
        if not msg:
            return
        ts_by_cp = _cps_ts_lookup({r["checkpoint_id"] for r in msg})
        by_session: dict[str, list[dict]] = {}
        for r in msg:
            ts = ts_by_cp.get(r["checkpoint_id"])
            if ts is None:
                continue  # no pointer row yet — same as the inner join
            by_session.setdefault(r["thread_id"], []).append(
                {
                    "task_id": r["task_path"],
                    "content": bytes(r["blob"]).decode("utf-8"),
                    "timestamp": ts,
                    "thread_id": r["thread_id"],
                    "checkpoint_id": r["checkpoint_id"],
                }
            )
        if not by_session:
            return
        prior_rows = state_store.read_docs(list(by_session))
        state_rows, diff_rows = [], []
        for sid, items in by_session.items():
            prior = state_row_to_doc(prior_rows[sid]) if sid in prior_rows else None
            doc, diff = transition(
                prior, sid, items, source=source, ctx_providers=ctx_providers
            )
            state_rows.append(doc_to_state_row(doc, now_ms))
            if diff is not None:
                diff_rows.append(
                    {
                        "session_id": sid,
                        "sequence_number": int(diff["sequenceNumber"]),
                        "source": source,
                        "diff_data": json.dumps(diff["diffData"], separators=(",", ":")),
                        "ts_millis": now_ms,
                    }
                )
        diff_log.append_rows(diff_rows)
        state_store.upsert_rows(state_rows)

    def _process_large(batch_df: DataFrame) -> None:
        if not cps_df_cache:
            from ..sources.checkpoints import with_event_time

            cp = (
                with_event_time(spark.read.parquet(checkpoints_path))
                .select("checkpoint_id", "ts_millis")
                .cache()
            )
            cp.count()
            cps_df_cache.append(cp)
        checkpoints = cps_df_cache[0]
        from ..sources.checkpoints import message_writes

        # broadcast the batch slice against the (unbounded, cached) pointer
        # table; no window argmax here — the grouped transition reduces to
        # latest-per-task itself with the same tie-break
        w = message_writes(batch_df).select(
            "thread_id", "checkpoint_id", F.col("task_path").alias("task_id"), "blob"
        )
        latest = (
            F.broadcast(w)
            .join(checkpoints, "checkpoint_id", "inner")
            .withColumn("content", F.decode(F.col("blob"), "UTF-8"))
            .drop("blob")
        )
        # bucket-pruned state read + broadcast slice + adaptive sink (a
        # large INPUT batch can still collapse to few updated sessions)
        apply_transition_batch(
            latest,
            state_store,
            diff_log,
            source,
            ctx_providers,
            small_result_max_rows=small_batch_max_rows,
            prune_state=True,
        )

    def _batch_files(batch_id: int) -> list[str] | None:
        """The file source's checkpoint metadata log records each batch's
        files as JSON entries tagged with their batchId — reading it
        driver-side replaces the per-tick probe JOB (~80 ms of pure
        scheduler overhead at the reference's 5-rows/tick cadence) with a
        file read. Every-10th batch the log compacts (<id>.compact holds
        ALL history), so entries are filtered by batchId; any surprise in
        the layout returns None and the collect probe takes over."""
        import glob as _glob

        d = os.path.join(checkpoint_location, "sources", "0")
        path = os.path.join(d, str(batch_id))
        if not os.path.exists(path):
            compacts = _glob.glob(os.path.join(d, f"{batch_id}.compact"))
            if not compacts:
                return None
            path = compacts[0]
        try:
            with open(path) as fh:
                lines = fh.read().splitlines()
        except OSError:
            return None
        files = []
        for ln in lines:
            if not ln.startswith("{"):
                continue  # version header
            try:
                entry = json.loads(ln)
            except ValueError:
                return None
            if "path" not in entry or "batchId" not in entry:
                return None  # unexpected layout: let the collect probe decide
            if entry["batchId"] != batch_id:
                continue  # compacted history from earlier batches
            p = entry["path"]
            if p.startswith("file:"):
                from urllib.parse import unquote, urlparse

                p = unquote(urlparse(p).path)
            files.append(p)
        return files

    def _rows_from_files(files: list[str]) -> list[dict] | None:
        """Driver-side read of a small batch's files (zero Spark jobs).
        Row counts come from parquet footers first, so a backlog batch
        over the threshold never loads data driver-side."""
        import pyarrow.parquet as _pq

        try:
            total = sum(_pq.ParquetFile(f).metadata.num_rows for f in files)
            if total > small_batch_max_rows:
                return None
            rows: list[dict] = []
            for f in files:
                rows.extend(_pq.read_table(f).to_pylist())
            return rows
        except (OSError, ValueError):
            return None

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        files = _batch_files(batch_id)
        if files is not None:
            if not files:
                return
            rows = _rows_from_files(files)
            if rows is not None:
                if rows:
                    _process_small(rows, int(time.time() * 1000))
                return
            _process_large(batch_df)
            return
        # fallback: one probe job doubles as the emptiness check and the
        # fast-path collect; bounded: limit(small_batch_max_rows + 1) caps
        # the read regardless of batch size
        probe = batch_df.limit(small_batch_max_rows + 1).collect()
        if not probe:
            return
        if len(probe) <= small_batch_max_rows:
            _process_small([r.asDict() for r in probe], int(time.time() * 1000))
        else:
            _process_large(batch_df)

    writer = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def run_dual_stream_pipeline(
    spark: SparkSession,
    writes_dir: str,
    checkpoints_path: str,
    ide_dir: str,
    state_store: ParquetStateStore,
    diff_log: ParquetAppendLog,
    checkpoint_location: str,
    trigger: dict[str, Any] | None = None,
    max_files_per_trigger: int | None = None,
    ctx_providers=None,
    small_batch_max_rows: int = 500,
):
    """X10 live fan-in, safe by construction: the cdc write stream and the
    ide checkpoint stream are normalized to one shape, tagged with their
    ``source``, and UNIONed into a SINGLE streaming query — one foreachBatch
    thread applies both transitions in order (cdc then ide, the reference's
    startup order; config/CdcSubscriberConfig.java:117-175 runs the same
    two subscribers), so the two sources never race each other's
    read-modify-write on a shared session. Running the two streams as
    separate queries against one store also works — the store's optimistic
    commit retries the loser — but a session touched by both sources in
    flight would then absorb them in commit order, not source order; the
    union pipeline is the recommended production shape.

    Each source's transition within the batch goes through the same
    adaptive small/large sink as the single-stream pipeline. The
    checkpoint pointer table joins per batch from a lazily-cached
    DataFrame — the same slow-changing-dim assumption as
    ``run_foreachbatch_pipeline`` (pointer rows land before the writes
    that reference them)."""
    from ..schemas import IDE_CHECKPOINTS_SCHEMA
    from ..sources.checkpoints import ide_with_event_time, message_writes, with_event_time

    cdc_reader = spark.readStream.schema(CHECKPOINT_WRITES_SCHEMA)
    ide_reader = spark.readStream.schema(IDE_CHECKPOINTS_SCHEMA)
    if max_files_per_trigger is not None:
        cdc_reader = cdc_reader.option("maxFilesPerTrigger", max_files_per_trigger)
        ide_reader = ide_reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # union carries the raw blob + a null ts for cdc (its event time lives
    # in the pointer table, joined per batch); ide rows arrive self-timed
    cdc = (
        message_writes(cdc_reader.parquet(writes_dir))
        .select(
            "thread_id",
            F.col("task_path").alias("task_id"),
            "checkpoint_id",
            "blob",
            F.lit(None).cast("long").alias("ts_millis"),
            F.lit("cdc").alias("source"),
        )
    )
    ide = (
        ide_with_event_time(ide_reader.parquet(ide_dir))
        .filter(F.col("blob").isNotNull() & (F.length(F.col("blob")) > 0))
        .select(
            "thread_id",
            F.col("task_path").alias("task_id"),
            "checkpoint_id",
            "blob",
            "ts_millis",
            F.lit("ide").alias("source"),
        )
    )
    both = cdc.unionByName(ide)
    cps_df_cache: list[DataFrame] = []

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.cache()
        try:
            now_ms = int(time.time() * 1000)
            for src in ("cdc", "ide"):
                part = batch_df.filter(F.col("source") == src).drop("source")
                if part.isEmpty():
                    continue
                if src == "cdc":
                    if not cps_df_cache:
                        cp = (
                            with_event_time(spark.read.parquet(checkpoints_path))
                            .select("checkpoint_id", "ts_millis")
                            .cache()
                        )
                        cp.count()
                        cps_df_cache.append(cp)
                    part = (
                        F.broadcast(part.drop("ts_millis"))
                        .join(cps_df_cache[0], "checkpoint_id", "inner")
                    )
                part = part.withColumn("content", F.decode(F.col("blob"), "UTF-8")).drop("blob")
                blob_ord = F.struct(F.col("ts_millis"), F.col("checkpoint_id"))
                latest = part.groupBy("thread_id", "task_id").agg(
                    F.max_by(F.col("content"), blob_ord).alias("content"),
                    F.max_by(F.col("checkpoint_id"), blob_ord).alias("checkpoint_id"),
                    F.max(F.col("ts_millis")).alias("ts_millis"),
                )
                apply_transition_batch(
                    latest,
                    state_store,
                    diff_log,
                    src,
                    ctx_providers,
                    now_ms=now_ms,
                    small_result_max_rows=small_batch_max_rows,
                    prune_state=True,
                )
        finally:
            batch_df.unpersist()

    writer = (
        both.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_location)
        .outputMode("update")
    )
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


# ---- applyInPandasWithState path (X1 keyed state inside Spark) ---------------

_STATE_SCHEMA = "state_json string"
_OUTPUT_SCHEMA = (
    "session_id string, sequence_number int, state_json string, batch_diff string, "
    "evicted boolean"
)


def make_stateful_update(ctx_providers=None, ttl_ms: int | None = None):
    """Build the keyed-state update function; ``ctx_providers`` (UD5) run
    inside the per-session group, so consume-once side inputs (X9) stay
    serialized per key exactly like the batch path.

    ``ttl_ms`` bounds state for idle sessions: each update re-arms a
    processing-time timeout; when it fires, the session's final state is
    emitted once more (flagged ``evicted``) and removed from the store.
    The durable copy lives in the MERGE-ed state table, so a session that
    wakes after eviction is re-seeded from the lake, not lost — state
    size tracks ACTIVE sessions, not all sessions ever seen."""

    def _stateful_update(key, pdfs, state: GroupState):
        session_id = key[0]
        if ttl_ms is not None and state.hasTimedOut:
            (state_json,) = state.get
            doc = json.loads(state_json)
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "session_id": session_id,
                        "sequence_number": int(doc["sequence_number"]),
                        "state_json": state_json,
                        "batch_diff": None,
                        "evicted": True,
                    }
                ]
            )
            return
        prior: dict[str, Any] | None = None
        if state.exists:
            (state_json,) = state.get
            prior = json.loads(state_json)
        items = []
        for pdf in pdfs:
            for r in pdf.itertuples():
                items.append(
                    {
                        "task_id": r.task_id,
                        "content": r.content,
                        "timestamp": int(r.ts_millis),
                        "thread_id": session_id,
                        "checkpoint_id": r.checkpoint_id,
                    }
                )
        if not items:
            return
        doc, diff = transition(prior, session_id, items, source="cdc", ctx_providers=ctx_providers)
        state.update((json.dumps(doc),))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame(
            [
                {
                    "session_id": session_id,
                    "sequence_number": int(doc["sequence_number"]),
                    "state_json": json.dumps(doc),
                    "batch_diff": json.dumps(diff) if diff is not None else None,
                    "evicted": False,
                }
            ]
        )

    return _stateful_update


def stateful_updates(joined_stream: DataFrame, ctx_providers=None, ttl_ms: int | None = None) -> DataFrame:
    """groupBy(session).applyInPandasWithState over pre-joined checkpoint
    rows (session_id, task_id, content, ts_millis, checkpoint_id)."""
    return joined_stream.groupBy("session_id").applyInPandasWithState(
        make_stateful_update(ctx_providers, ttl_ms),
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )


def run_stateful_pipeline(
    spark: SparkSession,
    joined_dir: str,
    checkpoint_location: str,
    query_name: str = "cdc_stateful",
    trigger: dict[str, Any] | None = None,
    output_path: str | None = None,
    ctx_providers=None,
    ttl_ms: int | None = None,
):
    """Stream pre-joined checkpoint rows through Spark-managed keyed state.

    ``joined_dir`` holds parquet rows with (session_id, task_id, content,
    ts_millis, checkpoint_id) — the shape ``latest_blobs_per_task``
    produces (a Kafka source would arrive pre-joined the same way).

    CAUTION: with ``ttl_ms`` set the query uses ProcessingTimeTimeout, and
    a ProcessingTimeTimeout query under ``trigger={'availableNow': True}``
    NEVER terminates on Spark 4.1 — the engine keeps scheduling batches in
    case a timer fires, so ``awaitTermination`` blocks forever. Run TTL
    queries with a continuous trigger and stop them explicitly.
    """
    schema = (
        "session_id string, task_id string, content string, "
        "ts_millis long, checkpoint_id string"
    )
    stream = spark.readStream.schema(schema).parquet(joined_dir)
    out = stateful_updates(stream, ctx_providers, ttl_ms)
    writer = out.writeStream.queryName(query_name).option(
        "checkpointLocation", checkpoint_location
    )
    if trigger:
        writer = writer.trigger(**trigger)
    if output_path:
        return writer.outputMode("append").format("parquet").option("path", output_path).start()
    return writer.outputMode("append").format("memory").start()
