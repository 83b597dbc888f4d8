"""The Python Data Source API surface (Spark 4): the CDC feed as a
registered ``format("cdc_table")`` — batch snapshot + offset-tracked
streaming with checkpointed restart (sources/pyds.py). Semantics under
test mirror the reference's notify/poll loop: every row arrives exactly
once across micro-batches AND across a query restart, late rows with an
already-seen timestamp but a later id are not skipped, and the offset
lives in Spark's checkpoint, not in engine state."""

from __future__ import annotations

import duckdb
import pytest

from cdc_agents_data_stream_spark.sources.pyds import CdcTableDataSource

SCHEMA = "ts BIGINT, checkpoint_id VARCHAR, content VARCHAR"


def _write(db: str, rows: list[tuple]) -> None:
    con = duckdb.connect(db)  # short-lived writer: closed before readers poll
    try:
        con.execute(f"CREATE TABLE IF NOT EXISTS checkpoint_writes({SCHEMA})")
        con.executemany("INSERT INTO checkpoint_writes VALUES (?, ?, ?)", rows)
    finally:
        con.close()


@pytest.fixture()
def registered(spark):
    spark.dataSource.register(CdcTableDataSource)
    return spark


def _read_stream(spark, db):
    return (
        spark.readStream.format("cdc_table")
        .option("database", db)
        .option("table", "checkpoint_writes")
        .option("ts_col", "ts")
        .option("id_col", "checkpoint_id")
        .load()
    )


def _drain(spark, db, ckpt, sink: list) -> None:
    q = (
        _read_stream(spark, db)
        .writeStream.foreachBatch(
            lambda bdf, _bid: sink.extend(
                (r["ts"], r["checkpoint_id"], r["content"]) for r in bdf.collect()
            )
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout=120)
    q.stop()


def test_batch_snapshot_read(registered, tmp_path):
    db = str(tmp_path / "cdc.duckdb")
    rows = [(100 + i, f"cp-{i:02d}", f"c{i}") for i in range(7)]
    _write(db, rows)
    df = (
        registered.read.format("cdc_table")
        .option("database", db)
        .option("table", "checkpoint_writes")
        .load()
    )
    assert sorted((r["ts"], r["checkpoint_id"]) for r in df.collect()) == [
        (t, c) for t, c, _ in rows
    ]
    assert df.schema.simpleString() == "struct<ts:bigint,checkpoint_id:string,content:string>"


def test_stream_delivers_each_row_once_across_restarts(registered, tmp_path):
    db = str(tmp_path / "cdc.duckdb")
    ckpt = str(tmp_path / "ckpt")
    _write(db, [(100, "cp-a", "x"), (100, "cp-b", "y"), (200, "cp-c", "z")])

    got: list = []
    _drain(registered, db, ckpt, got)
    assert sorted(got) == [(100, "cp-a", "x"), (100, "cp-b", "y"), (200, "cp-c", "z")]

    # late row with an ALREADY-SEEN ts but later id must not be skipped;
    # plus a normal append
    _write(db, [(200, "cp-d", "late-same-ts"), (300, "cp-e", "new")])
    got2: list = []
    _drain(registered, db, ckpt, got2)  # same checkpoint -> resumes offset
    assert sorted(got2) == [(200, "cp-d", "late-same-ts"), (300, "cp-e", "new")]

    # a third drain with nothing new delivers nothing (offset is durable)
    got3: list = []
    _drain(registered, db, ckpt, got3)
    assert got3 == []
