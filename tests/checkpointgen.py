"""Synthetic checkpoint-table generator for tests.

Models the reference's integration scenario
(dao/CheckpointDaoTest.java:79-155): per tick, one new
(checkpoints, checkpoint_writes) pair per task key for a thread; the blob is
a JSON message list growing with the tick number; a repeated tick probes
idempotency. A fraction of task paths contain ``__start__`` to exercise the
accumulate-merge policy.
"""

from __future__ import annotations

import json
import uuid
from datetime import datetime, timedelta, timezone

import pandas as pd

EPOCH0 = datetime(2026, 1, 1, tzinfo=timezone.utc)


def message_blob(n_messages: int, task: str) -> bytes:
    msgs = [
        {
            "type": "ai" if i % 2 == 0 else "human",
            "content": [f"{task} message {i}"],
            "id": f"m-{task}-{i}",
            "example": False,
            "additional_kwargs": {},
            "response_metadata": {},
        }
        for i in range(n_messages)
    ]
    return json.dumps(msgs).encode()


def gen_checkpoint_tables(
    n_threads: int = 2,
    n_ticks: int = 5,
    tasks: tuple[str, ...] = ("0_task", "1_task", "2_task", "3_task__start__", "4_task"),
    tick_ms: int = 500,
    repeat_tick: int | None = 3,
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Returns (checkpoints_pdf, checkpoint_writes_pdf)."""
    cps, writes = [], []
    for t in range(n_threads):
        thread_id = f"thread-{t}"
        for tick in range(n_ticks):
            eff_tick = repeat_tick - 1 if (repeat_tick is not None and tick == repeat_tick) else tick
            ts = EPOCH0 + timedelta(milliseconds=tick_ms * (tick + 1) + t)
            checkpoint_id = f"cp-{t}-{tick}-{uuid.uuid4().hex[:8]}"
            cps.append(
                {
                    "thread_id": thread_id,
                    "checkpoint_ns": "",
                    "checkpoint_id": checkpoint_id,
                    "parent_checkpoint_id": None,
                    "type": None,
                    "checkpoint": json.dumps({"ts": ts.strftime("%Y-%m-%d %H:%M:%S.%f"), "v": 1}),
                    "metadata": "{}",
                }
            )
            for task in tasks:
                writes.append(
                    {
                        "thread_id": thread_id,
                        "checkpoint_ns": "",
                        "checkpoint_id": checkpoint_id,
                        "task_id": task,
                        "idx": 0,
                        "channel": "messages",
                        "type": "list",
                        "blob": message_blob(eff_tick + 1, task),
                        "task_path": task,
                    }
                )
            # noise rows the channel/type filter must drop (F1)
            writes.append(
                {
                    "thread_id": thread_id,
                    "checkpoint_ns": "",
                    "checkpoint_id": checkpoint_id,
                    "task_id": "noise",
                    "idx": 1,
                    "channel": "values",
                    "type": "blob",
                    "blob": b"ignored",
                    "task_path": "noise",
                }
            )
    writes_pdf = pd.DataFrame(writes)
    # match CHECKPOINT_WRITES_SCHEMA (idx is IntegerType)
    writes_pdf["idx"] = writes_pdf["idx"].astype("int32")
    return pd.DataFrame(cps), writes_pdf
