"""End-to-end batch backfill (X7): snapshot → state store + diff log, then
an incremental second batch exercising staleness and idempotency."""

from __future__ import annotations

import json

import pytest

from cdc_agents_data_stream_spark.plans.backfill import backfill
from cdc_agents_data_stream_spark.state.store import ParquetAppendLog, ParquetStateStore
from tests.checkpointgen import gen_checkpoint_tables


@pytest.fixture()
def paths(tmp_path):
    return tmp_path


def _write_tables(spark, base, **gen_kwargs):
    cps, writes = gen_checkpoint_tables(**gen_kwargs)
    cps.to_parquet(base / "checkpoints.parquet")
    writes.to_parquet(base / "checkpoint_writes.parquet")
    return (
        spark.read.parquet(str(base / "checkpoints.parquet")),
        spark.read.parquet(str(base / "checkpoint_writes.parquet")),
    )


def test_backfill_creates_state_docs(spark, paths):
    cps_df, writes_df = _write_tables(spark, paths, n_threads=2, n_ticks=4)
    store = ParquetStateStore(spark, str(paths / "state"))
    log = ParquetAppendLog(spark, str(paths / "diffs"))

    state = backfill(spark, writes_df, cps_df, store, log)
    rows = {r["session_id"]: r for r in state.collect()}
    assert set(rows) == {"thread-0", "thread-1"}

    doc = json.loads(rows["thread-0"]["cdc_content"])
    assert set(doc) == {"0_task", "1_task", "2_task", "3_task__start__", "4_task"}
    # latest tick absorbed: tick 3 repeats eff_tick=2 (idempotency probe)
    # -> its blob carries 3 messages
    msgs = json.loads(doc["0_task"][0]["content"])
    assert len(msgs) == 3

    diffs = log.read().collect()
    assert all(d["source"] == "cdc" for d in diffs)
    assert {d["session_id"] for d in diffs} == {"thread-0", "thread-1"}
    assert all(d["sequence_number"] == 1 for d in diffs)


def test_backfill_incremental_batch_bumps_seq(spark, paths):
    cps_df, writes_df = _write_tables(spark, paths, n_threads=1, n_ticks=3, repeat_tick=None)
    store = ParquetStateStore(spark, str(paths / "state"))
    log = ParquetAppendLog(spark, str(paths / "diffs"))

    backfill(spark, writes_df, cps_df, store, log)
    s1 = {r["session_id"]: r for r in store.read().collect()}["thread-0"]
    assert s1["sequence_number"] == 1

    # second batch: 2 more ticks -> new latest content -> seq 2 and a diff
    base2 = paths / "b2"
    base2.mkdir()
    cps2, writes2 = _write_tables(spark, base2, n_threads=1, n_ticks=5, repeat_tick=None)
    backfill(spark, writes2, cps2, store, log)
    s2 = {r["session_id"]: r for r in store.read().collect()}["thread-0"]
    assert s2["sequence_number"] == 2

    # replay of the SAME batch: no content change -> seq stays, no new diff
    n_diffs = log.read().count()
    backfill(spark, writes2, cps2, store, log)
    s3 = {r["session_id"]: r for r in store.read().collect()}["thread-0"]
    assert s3["sequence_number"] == 2
    assert log.read().count() == n_diffs

    # __start__ task accumulated history, others last-write-wins
    content = json.loads(s3["cdc_content"])
    assert len(content["3_task__start__"]) == 2  # one per distinct absorbed ts
    assert len(content["0_task"]) == 1


def test_backfill_replay_is_byte_identical(spark, paths):
    """Replaying a batch with the same ``now_ms`` writes byte-identical
    state rows — one batch timestamp is stamped everywhere, never
    per-group wall clock."""
    cps_df, writes_df = _write_tables(spark, paths, n_threads=2, n_ticks=3, repeat_tick=None)
    rows = []
    for attempt in range(2):
        store = ParquetStateStore(spark, str(paths / f"state{attempt}"))
        backfill(spark, writes_df, cps_df, store, now_ms=1_700_000_000_000)
        rows.append(sorted(tuple(r) for r in store.read().collect()))
    assert rows[0] == rows[1]
    assert all(r[-1] == 1_700_000_000_000 for r in rows[0])  # updated_ts_millis


def test_backfill_large_result_uses_distributed_merge(spark, paths):
    """Forcing the threshold to 0 exercises the distributed MERGE sink on
    the same inputs and produces the same state as the driver fast path."""
    cps_df, writes_df = _write_tables(spark, paths, n_threads=2, n_ticks=3, repeat_tick=None)
    out = {}
    for name, threshold in (("small", 500), ("large", 0)):
        store = ParquetStateStore(spark, str(paths / f"state-{name}"))
        log = ParquetAppendLog(spark, str(paths / f"diffs-{name}"))
        backfill(
            spark, writes_df, cps_df, store, log,
            now_ms=1_700_000_000_000, small_result_max_rows=threshold,
        )
        out[name] = {
            "state": sorted(tuple(r) for r in store.read().collect()),
            "diff_keys": sorted(
                (r["session_id"], r["sequence_number"], r["source"])
                for r in log.read().collect()
            ),
        }
    assert out["small"]["state"] == out["large"]["state"]
    assert out["small"]["diff_keys"] == out["large"]["diff_keys"]


def test_transition_rows_fn_matches_pandas_fn():
    """The Arrow path's dict-native group transition must produce exactly
    the row the pandas ``make_transition_fn`` produces — for a fresh
    session (all-None state columns), a session with prior state, and
    rows with a None task_id (the noise rows the filter must drop)."""
    import pandas as pd

    from cdc_agents_data_stream_spark.operators.merge import new_state
    from cdc_agents_data_stream_spark.plans.backfill import (
        doc_to_state_row,
        make_transition_fn,
        make_transition_rows_fn,
    )
    from cdc_agents_data_stream_spark.schemas import DATA_STREAM_STATE_SCHEMA

    state_cols = DATA_STREAM_STATE_SCHEMA.fieldNames()
    now = 1_700_000_000_000

    prior_doc = new_state("s-1")
    prior_doc["sequence_number"] = 3
    prior_doc["cdc_content"] = {"t1": [{"content": "old", "timestamp": 5,
                                        "thread_id": "s-1", "checkpoint_id": "cp0",
                                        "task_id": "t1"}]}
    prior_row = doc_to_state_row(prior_doc, now - 1000)

    def mk_rows(session_id, with_prior):
        base = {c: (prior_row[c] if with_prior else None) for c in state_cols}
        base.pop("updated_ts_millis", None)
        rows = []
        for i, task in enumerate(["t1", "t2", None]):
            r = dict(base)
            r.update(
                session_id=session_id,
                task_id=task,
                content=f"c-{i}" if task else None,
                ts_millis=100 + i,
                checkpoint_id=f"cp-{i}" if task else None,
            )
            rows.append(r)
        return rows

    fn_pd = make_transition_fn("cdc", None, now)
    fn_rows = make_transition_rows_fn("cdc", None, now)
    for sid, with_prior in (("s-0", False), ("s-1", True)):
        rows = mk_rows(sid, with_prior)
        out_pd = fn_pd((sid,), pd.DataFrame(rows)).iloc[0].to_dict()
        out_rows = fn_rows(sid, rows)
        assert out_pd == out_rows, f"mismatch for {sid}: {out_pd} vs {out_rows}"


def test_diff_content_shape(spark, paths):
    cps_df, writes_df = _write_tables(spark, paths, n_threads=1, n_ticks=2, repeat_tick=None)
    store = ParquetStateStore(spark, str(paths / "state"))
    log = ParquetAppendLog(spark, str(paths / "diffs"))
    backfill(spark, writes_df, cps_df, store, log)
    d = log.read().collect()[0]
    diff_data = json.loads(d["diff_data"])
    ch = diff_data["0_task"]["changes"][0]["change"]
    assert ch["type"] == "insert_content"
    assert ch["linesToAdd"]["start"] == 0
