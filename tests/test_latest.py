"""Latest-checkpoint operators (W1/T1/A1/F4/J1) against synthetic
checkpoint tables, cross-checked with a DuckDB oracle running the
reference's own SQL shape (ROW_NUMBER CTE)."""

from __future__ import annotations

import duckdb
import json
import pytest

from cdc_agents_data_stream_spark.operators.latest import (
    distinct_task_paths,
    latest_blobs_per_task,
    latest_checkpoints,
)
from tests.checkpointgen import gen_checkpoint_tables


@pytest.fixture(scope="module")
def tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("cptables")
    cps, writes = gen_checkpoint_tables(n_threads=3, n_ticks=6)
    cps.to_parquet(base / "checkpoints.parquet")
    writes.to_parquet(base / "checkpoint_writes.parquet")
    return (
        spark.read.parquet(str(base / "checkpoints.parquet")),
        spark.read.parquet(str(base / "checkpoint_writes.parquet")),
        base,
    )


def test_latest_checkpoints_matches_duckdb_oracle(tables):
    cps_df, writes_df, base = tables
    got = {
        r["task_path"]: (r["thread_id"], r["checkpoint_id"], r["ts_millis"])
        for r in latest_checkpoints(writes_df, cps_df).collect()
    }

    con = duckdb.connect()
    con.execute(f"CREATE VIEW checkpoints AS SELECT * FROM read_parquet('{base}/checkpoints.parquet')")
    con.execute(f"CREATE VIEW checkpoint_writes AS SELECT * FROM read_parquet('{base}/checkpoint_writes.parquet')")
    # the reference's query shape (dao/CdcCheckpointDao.java:93-124), with
    # the engine's deterministic (ts, checkpoint_id) tiebreak
    oracle = con.sql(
        """
        WITH ranked AS (
          SELECT cw.thread_id, cw.checkpoint_id, cw.task_path,
                 epoch_ms(CAST(c.checkpoint->>'$.ts' AS TIMESTAMP)) AS ts_millis,
                 ROW_NUMBER() OVER (PARTITION BY cw.task_path
                                    ORDER BY CAST(c.checkpoint->>'$.ts' AS TIMESTAMP) DESC,
                                             cw.checkpoint_id DESC) AS rn
          FROM checkpoint_writes cw
          JOIN checkpoints c ON c.checkpoint_id = cw.checkpoint_id
          WHERE cw.channel = 'messages' AND cw.type = 'list'
        )
        SELECT task_path, thread_id, checkpoint_id, ts_millis FROM ranked WHERE rn = 1
        """
    ).fetchall()
    expected = {r[0]: (r[1], r[2], r[3]) for r in oracle}
    assert got == expected
    assert "noise" not in got  # F1 filter dropped non-message channel


def test_latest_blobs_per_task(tables):
    cps_df, writes_df, _ = tables
    rows = latest_blobs_per_task(writes_df, cps_df).collect()
    # 3 threads x 5 real tasks
    assert len(rows) == 15
    for r in rows:
        msgs = json.loads(r["content"])
        # tick 5 (0-based) is the latest -> 6 messages
        assert len(msgs) == 6
        assert r["task_id"] in r["content"]


def test_distinct_task_paths(tables):
    _, writes_df, _ = tables
    paths = {r["task_path"] for r in distinct_task_paths(writes_df).collect()}
    assert paths == {"0_task", "1_task", "2_task", "3_task__start__", "4_task", "noise"}
    one = distinct_task_paths(writes_df, thread_id="thread-0").collect()
    assert len(one) == 6


def test_plan_has_pushed_filters_and_no_extra_shuffle(tables):
    cps_df, writes_df, _ = tables
    plan = latest_blobs_per_task(writes_df, cps_df)._jdf.queryExecution().executedPlan().toString()
    # the channel/type filters must reach the parquet scan
    assert "PushedFilters" in plan
    # exactly: join shuffle(s) + one aggregate shuffle; no sort-based window
    assert "Window" not in plan


def test_reference_rank_selection_differs_cross_thread(spark):
    """Pin the documented deviation (dao/CdcCheckpointDao.java:93-124):
    when a task_path spans threads, the reference's rank-then-min-rn picks
    the thread whose LAST write was that task, even if another thread
    wrote it with a newer timestamp earlier in its own stream."""
    import json as _json
    import pandas as pd
    from cdc_agents_data_stream_spark.operators.latest import (
        latest_checkpoints_reference_rank,
    )

    def cp(cid, ts):
        return {
            "thread_id": cid.split(":")[0],
            "checkpoint_ns": "",
            "checkpoint_id": cid,
            "parent_checkpoint_id": None,
            "type": None,
            "checkpoint": _json.dumps({"ts": f"2026-01-01 00:00:{ts:02d}.000000"}),
            "metadata": "{}",
        }

    def wr(cid, task):
        return {
            "thread_id": cid.split(":")[0],
            "checkpoint_ns": "",
            "checkpoint_id": cid,
            "task_id": task,
            "idx": 0,
            "channel": "messages",
            "type": "list",
            "blob": b"[]",
            "task_path": task,
        }

    # thread A: writes T at :10, then OTHER at :20  -> T has rn=2 in A
    # thread B: writes T at :05 (its only write)    -> T has rn=1 in B
    cps = pd.DataFrame([cp("A:1", 10), cp("A:2", 20), cp("B:1", 5)])
    writes = pd.DataFrame([wr("A:1", "T"), wr("A:2", "OTHER"), wr("B:1", "T")])
    writes["idx"] = writes["idx"].astype("int32")
    cps_df = spark.createDataFrame(cps)
    writes_df = spark.createDataFrame(writes)

    global_pick = {
        r["task_path"]: r["thread_id"]
        for r in latest_checkpoints(writes_df, cps_df).collect()
    }
    ref_pick = {
        r["task_path"]: (r["thread_id"], r["rn"])
        for r in latest_checkpoints_reference_rank(writes_df, cps_df).collect()
    }
    assert global_pick["T"] == "A"  # newest timestamp wins
    assert ref_pick["T"] == ("B", 1)  # reference: min per-thread rank wins
    assert ref_pick["OTHER"] == ("A", 1)
