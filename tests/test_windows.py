"""Watermarked tumbling windows: on-time windows finalize and emit; rows
arriving after the watermark passes their window are dropped by the
engine (the engine-level X3)."""

from __future__ import annotations

import pandas as pd

from cdc_agents_data_stream_spark.operators.windows import (
    tumbling_agg,
    watermarked_tumbling_agg,
)

HOUR = 3600 * 1000


def _write_batch(path, rows):
    pd.DataFrame(rows, columns=["ts", "event_type", "value"]).assign(
        # µs precision: Spark 4 reads ns-precision parquet timestamps as LONG
        ts=lambda d: pd.to_datetime(d.ts, unit="ms").astype("datetime64[us]")
    ).to_parquet(path)


def _run_available_now(spark, src_dir, ckpt, out_sink):
    stream = spark.readStream.schema("ts timestamp, event_type string, value double").parquet(
        str(src_dir)
    )
    agg = watermarked_tumbling_agg(stream, "ts", "1 hour", "30 minutes")
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out_sink))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)


def test_watermark_drops_late_rows(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    # batch 1: window [0h,1h) gets 2 rows; watermark advances to
    # max_event_time - 30min = 3h30m, so the 0h window finalizes
    _write_batch(src / "b1.parquet", [(10 * 60 * 1000, "click", 1.0), (20 * 60 * 1000, "click", 2.0), (4 * HOUR, "click", 8.0)])
    _run_available_now(spark, src, ckpt, out)

    # batch 2: a VERY late row for the already-finalized 0h window -> dropped;
    # plus an on-time row in the 4h window
    _write_batch(src / "b2.parquet", [(30 * 60 * 1000, "click", 100.0), (4 * HOUR + 60000, "click", 16.0)])
    _run_available_now(spark, src, ckpt, out)

    # advance the watermark far enough to finalize the 4h window
    _write_batch(src / "b3.parquet", [(9 * HOUR, "click", 0.5)])
    _run_available_now(spark, src, ckpt, out)

    rows = {r["window_start_ms"]: r for r in spark.read.parquet(str(out)).collect()}
    assert rows[0]["n_events"] == 2  # late row did NOT inflate the count
    assert rows[0]["sum_value"] == 3.0
    assert rows[4 * HOUR]["n_events"] == 2  # on-time second-batch row counted
    assert rows[4 * HOUR]["sum_value"] == 24.0


def test_batch_and_stream_agree(spark, tmp_path):
    src = tmp_path / "all.parquet"
    rows = [(i * 7 * 60 * 1000, "t" + str(i % 2), float(i)) for i in range(40)]
    _write_batch(src, rows)
    df = spark.read.parquet(str(src))
    got = {
        (r["window_start_ms"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_agg(df, "ts", "1 hour", ("event_type",)).collect()
    }
    # brute-force expectation
    import collections

    exp = collections.defaultdict(lambda: [0, 0.0])
    for ts, et, v in rows:
        key = (ts // HOUR * HOUR, et)
        exp[key][0] += 1
        exp[key][1] += v
    assert got == {k: (n, s) for k, (n, s) in exp.items()}


def test_session_agg_gap_semantics(spark):
    from pyspark.sql import functions as F

    from cdc_agents_data_stream_spark.operators.windows import session_agg

    sec = 1000
    df = spark.createDataFrame(
        [("u", 0), ("u", 1 * sec), ("u", 2 * sec), ("u", 3 * sec + 1), ("v", 0)],
        "user_id string, ms long",
    ).withColumn("ts", F.timestamp_millis(F.col("ms")))
    rows = sorted(
        session_agg(df, "ts", "1 second", ("user_id",)).collect(),
        key=lambda r: (r["user_id"], r["session_start_ms"]),
    )
    # u: events at 0,1s,2s merge (inclusive gap); 3s+1ms starts a new session
    assert [(r["user_id"], r["session_start_ms"], r["n_events"]) for r in rows] == [
        ("u", 0, 3),
        ("u", 3001, 1),
        ("v", 0, 1),
    ]
