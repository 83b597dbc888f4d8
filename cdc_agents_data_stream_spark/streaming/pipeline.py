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
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.latest import latest_blobs_per_task
from ..operators.merge import transition
from ..plans.backfill import _run_transition, doc_to_state_row, state_row_to_doc
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
):
    """Production-shaped path: stream writes, re-join the (slow-changing)
    checkpoint pointer table per batch, MERGE per-session state docs.

    ``max_files_per_trigger`` bounds how much of the backlog one micro-batch
    absorbs. Left unset, a slow batch absorbs every tick that arrived in the
    meantime and the latest-per-task reduction collapses them into ONE state
    transition (the reference's staleness-drop semantics X3 applied across
    the collapsed ticks); set to 1 to mirror the reference's one-transition-
    per-NOTIFY-event cadence exactly."""
    stream = read_writes_stream(spark, writes_dir, max_files_per_trigger)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        checkpoints = spark.read.parquet(checkpoints_path)
        # the per-batch write slice is small: broadcast it against the
        # (unbounded) pointer table, and broadcast the touched state slice
        latest = latest_blobs_per_task(batch_df, checkpoints, broadcast_writes=True)
        state_df = state_store.read()
        updated = _run_transition(
            latest, state_df, source, ctx_providers, broadcast_state=True
        ).cache()
        try:
            updated.count()
            state_store.upsert(updated.drop("batch_diff"))
            diffs = updated.filter(F.col("batch_diff").isNotNull()).select(
                F.col("session_id"),
                F.get_json_object("batch_diff", "$.sequenceNumber").cast("int").alias("sequence_number"),
                F.lit(source).alias("source"),
                F.get_json_object("batch_diff", "$.diffData").alias("diff_data"),
                F.col("updated_ts_millis").alias("ts_millis"),
            )
            diff_log.append(diffs)
        finally:
            updated.unpersist()

    writer = (
        stream.writeStream.foreachBatch(process_batch)
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
