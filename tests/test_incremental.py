"""Incremental polling reader: offset advance, equal-ts tie handling,
crash recovery (uncommitted poll re-reads)."""

from __future__ import annotations

import pandas as pd

from cdc_agents_data_stream_spark.sources.incremental import IncrementalReader


def _append(base, name, rows):
    pd.DataFrame(rows, columns=["ts_millis", "checkpoint_id", "payload"]).to_parquet(
        base / f"{name}.parquet"
    )


def test_poll_commit_cycle(spark, tmp_path):
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    _append(table_dir, "a", [(100, "c1", "x"), (200, "c2", "y")])
    rd = IncrementalReader(str(tmp_path / "offset.json"), "ts_millis", "checkpoint_id")

    t = lambda: spark.read.parquet(str(table_dir))
    b1 = rd.poll(t())
    assert {r["checkpoint_id"] for r in b1.collect()} == {"c1", "c2"}
    rd.commit()

    # equal-ts, larger-id row must still be picked up
    _append(table_dir, "b", [(200, "c3", "z"), (300, "c4", "w")])
    b2 = rd.poll(t())
    assert {r["checkpoint_id"] for r in b2.collect()} == {"c3", "c4"}
    rd.commit()

    assert rd.poll(t()).count() == 0


def test_uncommitted_poll_replays(spark, tmp_path):
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    _append(table_dir, "a", [(100, "c1", "x")])
    path = str(tmp_path / "offset.json")
    rd = IncrementalReader(path, "ts_millis", "checkpoint_id")
    t = lambda: spark.read.parquet(str(table_dir))
    assert rd.poll(t()).count() == 1
    # no commit -> a fresh reader (post-crash) re-reads the batch
    rd2 = IncrementalReader(path, "ts_millis", "checkpoint_id")
    assert rd2.poll(t()).count() == 1
    rd2.commit()
    assert IncrementalReader(path, "ts_millis", "checkpoint_id").poll(t()).count() == 0


def test_pushdown_reaches_scan(spark, tmp_path):
    table_dir = tmp_path / "tbl"
    table_dir.mkdir()
    _append(table_dir, "a", [(100, "c1", "x")])
    rd = IncrementalReader(str(tmp_path / "offset.json"), "ts_millis", "checkpoint_id")
    rd.poll(spark.read.parquet(str(table_dir)))
    rd.commit()
    batch = rd.poll(spark.read.parquet(str(table_dir)))
    plan = batch._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "ts_millis" in plan.split("PushedFilters")[1][:200]


def test_append_log_compaction(spark, tmp_path):
    import pandas as pd

    from cdc_agents_data_stream_spark.state.store import ParquetAppendLog

    log = ParquetAppendLog(spark, str(tmp_path / "log"))
    for i in range(40):
        log.append(
            spark.createDataFrame(
                [(f"s{i % 3}", i, "cdc", "{}", 1000 + i)],
                "session_id string, sequence_number int, source string, diff_data string, ts_millis long",
            ).coalesce(1)
        )
    assert log.file_count() >= 40
    assert log.compact(target_files=4) is True
    assert log.file_count() <= 4
    # content preserved
    assert log.read().count() == 40
    assert log.read().selectExpr("max(sequence_number)").collect()[0][0] == 39
    # below threshold -> no-op
    assert log.compact() is False


def test_applog_python_datasource_write_roundtrip(spark, tmp_path):
    """The Python DataSource WRITE path (Spark 4 DataSourceWriter):
    partition-parallel stage-then-rename commit, then the applog READER
    must reproduce the exact rows — the custom connector is now
    symmetric. No _tmp staging files may survive the commit."""
    import os

    import pyspark.sql.functions as F

    from cdc_agents_data_stream_spark.sources.pylog import register

    register(spark)
    d = str(tmp_path / "out")
    src = spark.range(0, 500).select(
        F.concat(F.lit("k"), (F.col("id") % 7).cast("string")).alias("key"),
        (F.col("id") * 1000).alias("ts_ms"),
        F.when(F.col("id") % 2 == 0, "event").otherwise("audit").alias("kind"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(4)
    src.write.format("applog").option("path", d).mode("append").save()
    files = os.listdir(d)
    assert all(f.startswith("part-") and f.endswith(".applog") for f in files)
    assert len(files) == 4
    back = spark.read.format("applog").option("path", d).load()
    assert back.count() == 500
    assert back.exceptAll(src).count() == 0 and src.exceptAll(back).count() == 0


def test_applog_stream_sink_idempotent_publish(spark, tmp_path):
    """Streaming applog sink: three micro-batches publish
    batch-id-stamped shards; a second run over the SAME checkpoint must
    publish nothing new (the replayed plan sees no new input), leaving
    the row set exactly equal to the source — the idempotence contract
    an at-least-once engine requires from a file sink."""
    import os

    import pyspark.sql.functions as F

    from cdc_agents_data_stream_spark.sources.pylog import register

    register(spark)
    src_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    base = spark.range(0, 90).select(
        F.concat(F.lit("k"), (F.col("id") % 5).cast("string")).alias("key"),
        (F.col("id") * 10).alias("ts_ms"),
        F.lit("event").alias("kind"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    for i in range(3):
        base.filter((F.col("ts_ms") / 10) % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src_dir)

    def run():
        q = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .writeStream.format("applog")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(timeout=180)
        q.stop()

    run()
    files1 = sorted(os.listdir(out_dir))
    assert files1 and all(f.startswith("part-b") for f in files1)
    back = spark.read.format("applog").option("path", out_dir).load()
    assert back.count() == 90
    assert back.exceptAll(base).count() == 0
    run()  # same checkpoint: no new input -> no new shards
    assert sorted(os.listdir(out_dir)) == files1


def test_applog_writer_abort_publishes_nothing(spark, tmp_path):
    """Failure path of the two-phase commit: when a task fails the
    write job, abort() must leave NO published part files (staged _tmp
    shards are cleaned or at worst orphaned as _tmp — never visible to
    the reader's *.applog glob... which ignores _tmp names only via the
    part- prefix check, so assert both)."""
    import os

    import pyspark.sql.functions as F
    from pyspark.sql.functions import udf

    from cdc_agents_data_stream_spark.sources.pylog import register

    register(spark)
    d = str(tmp_path / "out")

    @udf("string")
    def boom(x):
        if x == 37:
            raise ValueError("injected task failure")
        return f"p{x}"

    src = spark.range(0, 100).repartition(4).select(
        F.lit("k").alias("key"),
        F.col("id").alias("ts_ms"),
        F.lit("event").alias("kind"),
        boom(F.col("id")).alias("payload"),
    )
    import pytest as _pytest

    with _pytest.raises(Exception):
        src.write.format("applog").option("path", d).mode("append").save()
    published = [f for f in os.listdir(d)] if os.path.exists(d) else []
    assert not [f for f in published if f.startswith("part-")], published
