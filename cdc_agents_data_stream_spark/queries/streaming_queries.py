"""Oracle-checked query driving the LIVE Structured Streaming pipeline
(streaming/pipeline.py::run_foreachbatch_pipeline) end-to-end — the X1
micro-batch loop the reference runs off LISTEN/NOTIFY
(subscriber/AgentsPostgresSubscriber.java:28-49 →
service/DataStreamService.java:61-93).

Determinism strategy: the constructed write files are split into ticks by
TIME (ntile over distinct event seconds), so each micro-batch's rows are
strictly newer than everything already absorbed — absorption order is
then fully determined, the final per-task winner equals the global
argmax, and a session's sequence number equals the number of ticks in
which it had any surviving row. Wall-clock fields (``updated_ts_millis``,
diff timestamps) are excluded from the output.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Q, load


def stream_pipeline_state(spark, sf_dir):
    """Stage the synthetic writes as three tick files, stream them through
    ``run_foreachbatch_pipeline`` (``maxFilesPerTrigger=1`` → one
    micro-batch per tick, the reference's one-transition-per-NOTIFY
    cadence), then crack the final state store open to one row per
    (session, task). The store lives in a TemporaryDirectory, so the
    result is collected and re-wrapped before the directory vanishes."""
    import os
    import shutil
    import tempfile
    import time as _time
    from datetime import datetime, timezone

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..state.store import ParquetAppendLog, ParquetStateStore
    from ..streaming.pipeline import run_foreachbatch_pipeline

    # Spark 4.1's streaming-checkpoint checksum manager can starve on
    # local[...]; session.py disables it at build time, but this query must
    # also run on the driver's vanilla session (it is runtime-settable).
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")

    # quarter-sample the events: keeps every tick well above the
    # small-batch threshold (the distributed path stays the one under
    # test) while the gate run stays fast
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 4 == 1)
        .select(
            "event_id",
            "user_id",
            F.floor(F.unix_millis("ts") / 1000).cast("long").alias("sec"),
        )
        .toPandas()
    )
    secs = sorted(ev["sec"].unique())
    n = len(secs)
    tick_of_sec = {s: i * 3 // n for i, s in enumerate(secs)}

    def iso(sec: int) -> str:
        return datetime.fromtimestamp(sec, tz=timezone.utc).strftime(
            "%Y-%m-%d %H:%M:%S"
        )

    rows = []
    for eid, uid, sec in ev.itertuples(index=False):
        eid, uid, sec = int(eid), int(uid), int(sec)
        rows.append(
            {
                "thread_id": f"th-{uid % 50}",
                "checkpoint_ns": None,
                "checkpoint_id": f"cp-{eid:08d}",
                "task_id": f"task-{eid % 5}",
                "idx": 0,
                "channel": "values" if eid % 11 == 0 else "messages",
                "type": "list",
                "blob": b"" if eid % 13 == 0 else f"content-{eid}".encode(),
                "task_path": f"task-{eid % 5}",
                "tick": tick_of_sec[sec],
                "cp_json": '{"ts": "%s"}' % iso(sec),
            }
        )
    writes_schema = pa.schema(
        [
            ("thread_id", pa.string()),
            ("checkpoint_ns", pa.string()),
            ("checkpoint_id", pa.string()),
            ("task_id", pa.string()),
            ("idx", pa.int32()),
            ("channel", pa.string()),
            ("type", pa.string()),
            ("blob", pa.binary()),
            ("task_path", pa.string()),
        ]
    )
    base = tempfile.mkdtemp(prefix="stream-gate-")
    try:
        os.makedirs(f"{base}/writes")
        os.makedirs(f"{base}/cps")
        now = _time.time()
        for tick in range(3):
            sub = [r for r in rows if r["tick"] == tick]
            tbl = pa.Table.from_pylist(
                [{k: r[k] for k in writes_schema.names} for r in sub],
                schema=writes_schema,
            )
            path = f"{base}/writes/tick-{tick}.parquet"
            pq.write_table(tbl, path)
            # the file source lists oldest-mtime-first; pin the order
            os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))
        pq.write_table(
            pa.Table.from_pylist(
                [
                    {"checkpoint_id": r["checkpoint_id"], "checkpoint": r["cp_json"]}
                    for r in rows
                ]
            ),
            f"{base}/cps/all.parquet",
        )
        store = ParquetStateStore(spark, f"{base}/state")
        log = ParquetAppendLog(spark, f"{base}/diffs")
        query = run_foreachbatch_pipeline(
            spark,
            f"{base}/writes",
            f"{base}/cps",
            store,
            log,
            checkpoint_location=f"{base}/ckpt",
            max_files_per_trigger=1,
        )
        try:
            query.processAllAvailable()
        finally:
            query.stop()
        content_t = "map<string, array<struct<content:string>>>"
        out = (
            store.read()
            .select(
                "session_id",
                F.col("sequence_number").cast("long").alias("seq"),
                F.explode(F.from_json("cdc_content", content_t)).alias(
                    "task_id", "items"
                ),
            )
            .select(
                "session_id",
                "seq",
                "task_id",
                F.col("items")[0]["content"].alias("content"),
            )
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected, "session_id string, seq long, task_id string, content string"
    )


STREAM_PIPELINE_STATE_SQL = """
WITH secs AS (
  SELECT DISTINCT (epoch_ms(ts) // 1000) AS s FROM events WHERE event_id % 4 = 1
), ticks AS (
  SELECT s,
         CAST(((ROW_NUMBER() OVER (ORDER BY s) - 1) * 3) // (COUNT(*) OVER ())
              AS INT) AS tick
  FROM secs
), rows_kept AS (
  SELECT 'th-' || CAST(user_id % 50 AS VARCHAR) AS session_id,
         'cp-' || lpad(CAST(event_id AS VARCHAR), 8, '0') AS checkpoint_id,
         'task-' || CAST(event_id % 5 AS VARCHAR) AS task_id,
         (epoch_ms(ts) // 1000) * 1000 AS ts_millis,
         (epoch_ms(ts) // 1000) AS s,
         'content-' || CAST(event_id AS VARCHAR) AS content
  FROM events
  WHERE event_id % 4 = 1 AND event_id % 11 <> 0 AND event_id % 13 <> 0
), seqs AS (
  SELECT r.session_id, CAST(COUNT(DISTINCT t.tick) AS BIGINT) AS seq
  FROM rows_kept r JOIN ticks t ON r.s = t.s
  GROUP BY r.session_id
), ranked AS (
  SELECT session_id, task_id, content,
         ROW_NUMBER() OVER (PARTITION BY session_id, task_id
                            ORDER BY ts_millis DESC, checkpoint_id DESC) AS rn
  FROM rows_kept
)
SELECT r.session_id, q.seq, r.task_id, r.content
FROM ranked r JOIN seqs q ON q.session_id = r.session_id
WHERE r.rn = 1
"""


def difflog_compaction(spark, sf_dir):
    """Diff-log lifecycle under the gate (state/store.py::ParquetAppendLog;
    the small-file problem every micro-batch sink has at scale): 40
    driver-fast-path appends (one per micro-batch, as the pipeline does) →
    pointer-swap compaction once ``min_files`` accumulate → a FURTHER
    append against the compacted generation → dedup read. Checks the
    invariants a production log must keep: compaction preserves the keyed
    row set bit-for-bit, the post-compaction dir is small, and appends
    keep landing after the swap. diff_data is a pure function of the dedup
    key (session, seq, source), so the dedup survivor is deterministic."""
    import shutil
    import tempfile

    from ..state.store import ParquetAppendLog

    ev = (
        load(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .toPandas()
    )

    def diff_row(uid: int, seq: int) -> dict:
        sid = f"th-{uid % 50}"
        return {
            "session_id": sid,
            "sequence_number": seq,
            "source": "cdc",
            "diff_data": f'{{"k": "{sid}:{seq}"}}',
            "ts_millis": seq,
        }

    base = tempfile.mkdtemp(prefix="difflog-gate-")
    try:
        log = ParquetAppendLog(spark, base)
        for batch in range(40):
            sub = ev[ev["event_id"] % 40 == batch]
            log.append_rows(
                [diff_row(int(u), batch) for u in sub["user_id"]]
            )
        pre_files = log.file_count()
        compacted = log.compact(target_files=4, min_files=32)
        post_files = log.file_count()
        sub = ev[ev["event_id"] % 40 == 0]
        log.append_rows([diff_row(int(u), 40) for u in sub["user_id"]])
        deduped = log.read(dedup=True)
        agg = deduped.agg(
            F.count("*").cast("long").alias("n_keys"),
            F.countDistinct("session_id").cast("long").alias("n_sessions"),
            F.sum("sequence_number").cast("long").alias("seq_sum"),
            F.sum(
                (
                    F.get_json_object("diff_data", "$.k")
                    == F.concat_ws(":", "session_id", "sequence_number")
                ).cast("int")
            )
            .cast("long")
            .alias("n_payload_ok"),
        ).collect()[0]
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                int(pre_files >= 40),
                int(bool(compacted)),
                int(post_files <= 4),
                int(agg.n_keys),
                int(agg.n_sessions),
                int(agg.seq_sum),
                int(agg.n_payload_ok),
            )
        ],
        "many_pre int, compacted int, few_post int, n_keys long, "
        "n_sessions long, seq_sum long, n_payload_ok long",
    )


DIFFLOG_COMPACTION_SQL = """
WITH keys AS (
  SELECT DISTINCT 'th-' || CAST(user_id % 50 AS VARCHAR) AS session_id,
         CAST(event_id % 40 AS INT) AS seq
  FROM events
  UNION
  SELECT DISTINCT 'th-' || CAST(user_id % 50 AS VARCHAR), 40
  FROM events WHERE event_id % 40 = 0
)
SELECT CAST(1 AS INT) AS many_pre,
       CAST(1 AS INT) AS compacted,
       CAST(1 AS INT) AS few_post,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(DISTINCT session_id) AS BIGINT) AS n_sessions,
       CAST(SUM(seq) AS BIGINT) AS seq_sum,
       CAST(COUNT(*) AS BIGINT) AS n_payload_ok
FROM keys
"""


def stream_hourly_rollup(spark, sf_dir):
    """LIVE Structured Streaming watermarked window aggregation — the
    hypertable-rollup semantics (`events_hourly_rollup`) run as a real
    readStream with late-data drops and append-mode window emission.

    Determinism: the sampled events are staged as three tick files split
    by event TIME (each tick strictly newer), except that rows with
    ``event_id % 7 == 3`` are rewritten to 2 hours BEFORE the stream's
    minimum and staged in the LAST tick — by then the watermark (max event
    time seen minus 30 min) sits ~20 days later, so Spark must drop every
    one of them. The final no-data micro-batch flushes all windows whose
    end <= final watermark; windows still open at termination are withheld
    by append mode. The oracle reproduces exactly that: hourly rollup over
    punctual rows, restricted to closed windows."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 11 == 0)
        .select("event_id", "ts", "event_type", "value")
        .toPandas()
    )
    import pandas as pd

    min_ts = ev["ts"].min()
    late = ev["event_id"] % 7 == 3
    ev.loc[late, "ts"] = min_ts - pd.Timedelta(hours=2) + pd.to_timedelta(
        (ev.loc[late, "event_id"] % 3600), unit="s"
    )
    punctual = ev[~late].sort_values("ts")
    n = len(punctual)
    base = tempfile.mkdtemp(prefix="stream-rollup-")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        for tick in range(3):
            part = punctual.iloc[tick * n // 3 : (tick + 1) * n // 3]
            if tick == 2:
                part = pd.concat([part, ev[late]])
            path = f"{base}/in/tick-{tick}.parquet"
            pq.write_table(
                pa.Table.from_pandas(
                    part[["event_id", "ts", "event_type", "value"]],
                    schema=schema,
                    preserve_index=False,
                ),
                path,
            )
            os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))
        stream = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                    "sum_cents"
                ),
            )
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_hourly_rollup_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.table("stream_hourly_rollup_sink").select(
            F.unix_millis("window.start").alias("win_start_ms"),
            "event_type",
            F.col("n_events").cast("long").alias("n_events"),
            "sum_cents",
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_hourly_rollup_sink")
    return spark.createDataFrame(
        collected,
        "win_start_ms long, event_type string, n_events long, sum_cents long",
    )


STREAM_HOURLY_ROLLUP_SQL = """
WITH s AS (SELECT * FROM events WHERE event_id % 11 = 0),
punctual AS (SELECT * FROM s WHERE event_id % 7 <> 3),
wm AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM punctual)
SELECT epoch_ms(date_trunc('hour', ts)) AS win_start_ms,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM punctual
GROUP BY date_trunc('hour', ts), event_type
HAVING epoch_ms(date_trunc('hour', ts) + INTERVAL 1 HOUR)
         <= (SELECT epoch_ms(w) FROM wm)
"""


def stream_rollup_ivm(spark, sf_dir):
    """Continuous hourly aggregate via incremental view maintenance
    (streaming/ivm.py::ContinuousRollup): a LIVE foreachBatch stream
    merges each micro-batch's partial (window, type) counts additively
    into the keyed store. Ticks are split by ``event_id % 3`` — arrival
    order is deliberately arbitrary, because additive IVM is
    order-insensitive (no watermark, no late-data drops) — so the final
    materialized rollup must equal the plain batch GROUP BY, which is the
    oracle."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.ivm import ContinuousRollup

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id", "ts", "event_type", "value")
        .toPandas()
    )
    base = tempfile.mkdtemp(prefix="stream-ivm-")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        for tick in range(3):
            part = ev[ev["event_id"] % 3 == tick]
            path = f"{base}/in/tick-{tick}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False),
                path,
            )
            os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))
        rollup = ContinuousRollup(spark, f"{base}/rollup")
        q = (
            spark.readStream.schema(
                "event_id long, ts timestamp, event_type string, value double"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
            .writeStream.foreachBatch(rollup.merge_batch)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        collected = rollup.read().collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected,
        "win_start_ms long, event_type string, n_events long, sum_cents long",
    )


STREAM_ROLLUP_IVM_SQL = """
SELECT epoch_ms(date_trunc('hour', ts)) AS win_start_ms,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events WHERE event_id % 5 = 0
GROUP BY date_trunc('hour', ts), event_type
"""


def stream_stream_attribution(spark, sf_dir):
    """LIVE stream-stream interval join: a click stream and a purchase
    stream, both watermarked, inner-joined per user on ``purchase.ts ∈
    [click.ts, click.ts + 1h]`` — the attribution join Structured
    Streaming keeps bounded state for (click state evicted once the
    watermark passes ``click.ts + 1h``).

    Determinism: both streams are staged as three tick files split by the
    SAME global time boundaries (each tick strictly newer than the last).
    For any watermark delay δ ≥ 0, every arriving purchase p then
    satisfies p.ts > watermark, so the clicks it can match
    (c ≥ p.ts − 1h > watermark − 1h) are all still in state — no match is
    ever lost to eviction — and inner-join matches are emitted in the
    micro-batch they form, so the final result equals the static interval
    join, which is the oracle. Ancient purchases (event_id % 13 == 1,
    rewritten 2 days before the stream's start) ride in the last tick to
    exercise state-watermark filtering without affecting the result set
    (no click exists that far back)."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("event_id") % 3 == 0)
        .select("event_id", "ts", "user_id", "event_type")
        .toPandas()
    )
    min_ts = ev["ts"].min()
    late = (ev["event_type"] == "purchase") & (ev["event_id"] % 13 == 1)
    ev.loc[late, "ts"] = min_ts - pd.Timedelta(days=2) + pd.to_timedelta(
        (ev.loc[late, "event_id"] % 3600), unit="s"
    )
    punctual = ev[~late]
    bounds = punctual["ts"].quantile([1 / 3, 2 / 3]).tolist()
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    base = tempfile.mkdtemp(prefix="stream-ssjoin-")
    try:
        now = _time.time()
        for side in ("clicks", "purchases"):
            os.makedirs(f"{base}/{side}")
        for tick in range(3):
            lo = punctual["ts"] > bounds[tick - 1] if tick > 0 else True
            hi = punctual["ts"] <= bounds[tick] if tick < 2 else True
            part = punctual[lo & hi]
            for side, etype in (("clicks", "click"), ("purchases", "purchase")):
                sub = part[part["event_type"] == etype]
                if side == "purchases" and tick == 2:
                    sub = pd.concat([sub, ev[late]])
                path = f"{base}/{side}/tick-{tick}.parquet"
                pq.write_table(
                    pa.Table.from_pandas(
                        sub[["event_id", "ts", "user_id"]],
                        schema=schema,
                        preserve_index=False,
                    ),
                    path,
                )
                os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))

        def src(side):
            return (
                spark.readStream.schema("event_id long, ts timestamp, user_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/{side}")
                .withWatermark("ts", "30 minutes")
            )

        clicks = src("clicks").select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "user_id",
        )
        purchases = src("purchases").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("p_user_id"),
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "user_id = p_user_id AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
            ),
            "inner",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_ssjoin_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.table("stream_ssjoin_sink").select(
            "user_id",
            "click_id",
            "purchase_id",
            ((F.unix_millis("purchase_ts") - F.unix_millis("click_ts")) / 1000)
            .cast("long")
            .alias("gap_s"),
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_ssjoin_sink")
    return spark.createDataFrame(
        collected, "user_id long, click_id long, purchase_id long, gap_s long"
    ).orderBy("user_id", "click_id", "purchase_id")


def stream_tws_running_totals(spark, sf_dir):
    """LIVE typed keyed state (streaming/tws.py): per-user running
    totals across three micro-batches — via Spark 4's
    ``transformWithStateInPandas`` where the environment has protobuf,
    else the ``applyInPandasWithState`` equivalent (capability probe,
    same pattern as the optional PIL decoder)
    (ticks split by ``event_id % 3`` — additive totals are
    order-insensitive). The sink keeps every per-batch emission; the
    final totals per key are the emission with the largest ``n`` (counts
    strictly increase), and they must equal the plain batch GROUP BY —
    the oracle."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.tws import running_totals

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 7 == 0)
        .select(
            "event_id",
            "user_id",
            F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
            F.round(F.col("value") * 1e6).cast("long").alias("value_micro"),
        )
        .toPandas()
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("ts_ms", pa.int64()),
            ("value_micro", pa.int64()),
        ]
    )
    base = tempfile.mkdtemp(prefix="stream-tws-")
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        for tick in range(3):
            part = ev[ev["event_id"] % 3 == tick]
            path = f"{base}/in/tick-{tick}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False),
                path,
            )
            os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))
        stream = (
            spark.readStream.schema(
                "event_id long, user_id long, ts_ms long, value_micro long"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        q = (
            running_totals(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("stream_tws_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        from pyspark.sql import Window

        emissions = spark.table("stream_tws_sink")
        final = (
            emissions.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("user_id").orderBy(F.col("n").desc())
                ),
            )
            .filter(F.col("rn") == 1)
            .select("user_id", "n", "sum_micro", "max_ms")
        )
        collected = final.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_tws_sink")
    return spark.createDataFrame(
        collected, "user_id long, n long, sum_micro long, max_ms long"
    ).orderBy("user_id")


STREAM_TWS_RUNNING_TOTALS_SQL = """
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(MAX(epoch_ms(ts)) AS BIGINT) AS max_ms
FROM events
WHERE event_id % 7 = 0
GROUP BY user_id
ORDER BY user_id
"""


def stream_static_enrich(spark, sf_dir):
    """LIVE stream-static broadcast enrichment — the standard CDC
    pattern: a fact stream joined per micro-batch against a slow-changing
    dimension snapshot. The dimension (each user's first signup time) is
    a plain batch DataFrame broadcast into every micro-batch; no state,
    no watermark — the result equals the static join, which is the
    oracle. At 100 TB of stream the dimension is still user-count-sized,
    so the broadcast is the right plan at any scale."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = load(spark, sf_dir, "events")
    dim = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis(F.col("ts").cast("timestamp"))).alias("signup_ms"))
    )
    facts = (
        ev.filter(F.col("event_type") == "click")
        .filter(F.col("event_id") % 5 == 2)
        .select("event_id", "ts", "user_id")
        .toPandas()
    )
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    base = tempfile.mkdtemp(prefix="stream-enrich-")
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        n = len(facts)
        facts = facts.sort_values("ts")
        for tick in range(3):
            part = facts.iloc[tick * n // 3 : (tick + 1) * n // 3]
            path = f"{base}/in/tick-{tick}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False),
                path,
            )
            os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        enriched = stream.join(F.broadcast(dim), "user_id", "inner").select(
            "user_id",
            "event_id",
            (F.unix_millis(F.col("ts").cast("timestamp")) - F.col("signup_ms"))
            .cast("long")
            .alias("age_ms"),
        )
        q = (
            enriched.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_enrich_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        collected = spark.table("stream_enrich_sink").collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_enrich_sink")
    return spark.createDataFrame(
        collected, "user_id long, event_id long, age_ms long"
    ).orderBy("user_id", "event_id")


STREAM_STATIC_ENRICH_SQL = """
WITH dim AS (
  SELECT user_id, MIN(epoch_ms(ts)) AS signup_ms
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
facts AS (
  SELECT event_id, ts, user_id FROM events
  WHERE event_type = 'click' AND event_id % 5 = 2
)
SELECT f.user_id, f.event_id,
       CAST(epoch_ms(f.ts) - d.signup_ms AS BIGINT) AS age_ms
FROM facts f JOIN dim d USING (user_id)
ORDER BY f.user_id, f.event_id
"""


def stream_stream_left_outer(spark, sf_dir):
    """LIVE left-outer stream-stream join: every click, attributed or not.

    The hard part of outer streaming joins is WHEN the null side is
    emitted: an unmatched click can only be released once the watermark
    proves no future purchase can match it (click_ts + 1h < watermark);
    clicks whose join window is still open at termination are withheld by
    append mode. Staging is identical to `stream_stream_attribution`
    (time-split ticks ⇒ no match ever lost to eviction), so the result is
    deterministic: matched pairs = the static interval join; null rows =
    unmatched clicks with ``click_ts + 1h`` strictly below the FINAL
    GLOBAL watermark — Spark tracks one watermark per source and takes
    the MIN, so the oracle uses least(max click_ts, max purchase_ts) − δ.
    The availableNow no-data final batch flushes eligible null rows. The
    oracle reproduces exactly that closed-window rule."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .filter(F.col("event_id") % 4 == 0)
        .select("event_id", "ts", "user_id", "event_type")
        .toPandas()
    )
    bounds = ev["ts"].quantile([1 / 3, 2 / 3]).tolist()
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
        ]
    )
    base = tempfile.mkdtemp(prefix="stream-ssloj-")
    try:
        now = _time.time()
        for side in ("clicks", "purchases"):
            os.makedirs(f"{base}/{side}")
        for tick in range(3):
            lo = ev["ts"] > bounds[tick - 1] if tick > 0 else True
            hi = ev["ts"] <= bounds[tick] if tick < 2 else True
            part = ev[lo & hi]
            for side, etype in (("clicks", "click"), ("purchases", "purchase")):
                sub = part[part["event_type"] == etype]
                path = f"{base}/{side}/tick-{tick}.parquet"
                pq.write_table(
                    pa.Table.from_pandas(
                        sub[["event_id", "ts", "user_id"]],
                        schema=schema,
                        preserve_index=False,
                    ),
                    path,
                )
                os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))

        def src(side):
            return (
                spark.readStream.schema("event_id long, ts timestamp, user_id long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/{side}")
                .withWatermark("ts", "30 minutes")
            )

        clicks = src("clicks").select(
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
            "user_id",
        )
        purchases = src("purchases").select(
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("user_id").alias("p_user_id"),
        )
        joined = clicks.join(
            purchases,
            F.expr(
                "user_id = p_user_id AND purchase_ts >= click_ts "
                "AND purchase_ts <= click_ts + INTERVAL 1 HOUR"
            ),
            "left_outer",
        )
        q = (
            joined.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_ssloj_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.table("stream_ssloj_sink").select(
            "user_id",
            "click_id",
            F.col("purchase_id").alias("purchase_id"),
            F.when(F.col("purchase_id").isNull(), F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("matched"),
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_ssloj_sink")
    return spark.createDataFrame(
        collected, "user_id long, click_id long, purchase_id long, matched int"
    ).orderBy("user_id", "click_id", "purchase_id")


STREAM_STREAM_LEFT_OUTER_SQL = """
WITH s AS (
  SELECT * FROM events
  WHERE event_type IN ('click', 'purchase') AND event_id % 4 = 0
),
c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
      FROM s WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, ts AS purchase_ts, user_id
      FROM s WHERE event_type = 'purchase'),
-- the GLOBAL watermark is the MIN over sources of (side max - delay):
-- Spark advances each source's watermark independently and takes the min
wm AS (SELECT LEAST((SELECT MAX(click_ts) FROM c),
                    (SELECT MAX(purchase_ts) FROM p))
              - INTERVAL 30 MINUTE AS w),
matched AS (
  SELECT c.user_id, c.click_id, p.purchase_id, 1 AS matched
  FROM c JOIN p
    ON c.user_id = p.user_id
   AND p.purchase_ts >= c.click_ts
   AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
),
unmatched AS (
  SELECT c.user_id, c.click_id, CAST(NULL AS BIGINT) AS purchase_id,
         0 AS matched
  FROM c
  WHERE NOT EXISTS (
          SELECT 1 FROM p
          WHERE p.user_id = c.user_id
            AND p.purchase_ts >= c.click_ts
            AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR)
    AND c.click_ts + INTERVAL 1 HOUR < (SELECT w FROM wm)
)
SELECT user_id, click_id, purchase_id, CAST(matched AS INT) AS matched
FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
ORDER BY user_id, click_id, purchase_id
"""


STREAM_STREAM_ATTRIBUTION_SQL = """
WITH s AS (
  SELECT * FROM events
  WHERE event_type IN ('click', 'purchase') AND event_id % 3 = 0
),
c AS (SELECT event_id AS click_id, ts AS click_ts, user_id
      FROM s WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, ts AS purchase_ts, user_id
      FROM s WHERE event_type = 'purchase' AND event_id % 13 <> 1)
SELECT c.user_id, c.click_id, p.purchase_id,
       CAST((epoch_ms(p.purchase_ts) - epoch_ms(c.click_ts)) // 1000 AS BIGINT)
         AS gap_s
FROM c JOIN p
  ON c.user_id = p.user_id
 AND p.purchase_ts >= c.click_ts
 AND p.purchase_ts <= c.click_ts + INTERVAL 1 HOUR
ORDER BY c.user_id, c.click_id, p.purchase_id
"""


QUERIES = {
    "stream_pipeline_state": Q(
        stream_pipeline_state,
        STREAM_PIPELINE_STATE_SQL,
        "X1 live micro-batch pipeline → final state",
    ),
    "stream_hourly_rollup": Q(
        stream_hourly_rollup,
        STREAM_HOURLY_ROLLUP_SQL,
        "live watermarked hourly window rollup with late-data drops",
    ),
    "stream_rollup_ivm": Q(
        stream_rollup_ivm,
        STREAM_ROLLUP_IVM_SQL,
        "incrementally-maintained continuous hourly aggregate",
    ),
    "difflog_compaction": Q(
        difflog_compaction,
        DIFFLOG_COMPACTION_SQL,
        "append-log pointer-swap compaction lifecycle",
    ),
    "stream_stream_attribution": Q(
        stream_stream_attribution,
        STREAM_STREAM_ATTRIBUTION_SQL,
        "live watermarked stream-stream interval join (attribution)",
    ),
    "stream_tws_running_totals": Q(
        stream_tws_running_totals,
        STREAM_TWS_RUNNING_TOTALS_SQL,
        "transformWithState typed keyed state (running totals)",
    ),
    "stream_static_enrich": Q(
        stream_static_enrich,
        STREAM_STATIC_ENRICH_SQL,
        "live stream-static broadcast dimension enrichment",
    ),
    "stream_stream_left_outer": Q(
        stream_stream_left_outer,
        STREAM_STREAM_LEFT_OUTER_SQL,
        "live left-outer stream-stream join with watermark-gated nulls",
    ),
}


def stream_sessionization(spark, sf_dir):
    """LIVE streaming gap-sessionization — `user_sessionization`'s
    semantics (session_window, inclusive gap — 96 h here, sized so the
    testdata's ~6-day per-user spacing yields real multi-event sessions:
    427 sessions, 192 spanning >1 event at sf0.01) run as a real
    readStream where sessions MERGE ACROSS MICRO-BATCHES in the state
    store: the sampled events are staged as three tick files split by
    event time, so most users' sessions span tick boundaries and the
    final result only exists if Spark's session-merge state machine is
    correct. Watermark 30 min; the availableNow no-data batch flushes
    every session whose end (last event + gap) <= final watermark —
    sessions still open at termination are withheld by append mode, and
    the oracle reproduces exactly that closed-session set via
    gaps-and-islands."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set(
        "spark.sql.streaming.checkpoint.fileChecksum.enabled", "false"
    )
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 13 == 0)
        .select("event_id", "ts", "user_id")
        .toPandas()
        .sort_values("ts")
    )
    n = len(ev)
    base = tempfile.mkdtemp(prefix="stream-sess-")
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("user_id", pa.int64())]
    )
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        for tick in range(3):
            part = ev.iloc[tick * n // 3 : (tick + 1) * n // 3]
            path = f"{base}/in/tick-{tick}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False), path
            )
            os.utime(path, (now - 30 + tick * 10, now - 30 + tick * 10))
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, user_id long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
            .withWatermark("ts", "30 minutes")
            .groupBy(F.session_window("ts", "96 hours").alias("w"), "user_id")
            .agg(F.count("*").cast("long").alias("n_events"))
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_sessionization_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.table("stream_sessionization_sink").select(
            "user_id",
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("session_start_ms"),
            F.unix_millis(F.col("w.end").cast("timestamp")).alias("session_end_ms"),
            "n_events",
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_sessionization_sink")
    return spark.createDataFrame(
        collected,
        "user_id long, session_start_ms long, session_end_ms long, n_events long",
    ).orderBy("user_id", "session_start_ms")


STREAM_SESSIONIZATION_SQL = """
WITH s AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events WHERE event_id % 13 = 0
),
wm AS (SELECT MAX(ts_ms) - 1800000 AS w FROM s),
marked AS (
  SELECT user_id, ts_ms,
         CASE WHEN LAG(ts_ms) OVER w IS NULL
                OR ts_ms - LAG(ts_ms) OVER w > 345600000 THEN 1 ELSE 0 END AS new_sess
  FROM s WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
),
sessioned AS (
  SELECT user_id, ts_ms,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       MIN(ts_ms) AS session_start_ms,
       MAX(ts_ms) + 345600000 AS session_end_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessioned
GROUP BY user_id, sid
HAVING MAX(ts_ms) + 345600000 <= (SELECT w FROM wm)
ORDER BY user_id, session_start_ms
"""

QUERIES["stream_sessionization"] = Q(
    stream_sessionization,
    STREAM_SESSIONIZATION_SQL,
    "LIVE streaming session windows merging across micro-batches, append-mode closed-session emission",
)


def ivm_join_delta(spark, sf_dir):
    """Materialized-JOIN maintenance (streaming/ivm.py::incremental_join):
    orders and lineitem arrive as three interleaved insert batches —
    split by INDEPENDENT functions of the key (mod 3 vs div-3-mod-3), so
    ~2/3 of all matches span batch boundaries and every delta term
    (ΔA⋈B, A⋈ΔB, ΔA⋈ΔB) carries real rows — the
    join view is maintained by the delta-join identity — per batch only
    delta-sized operands ever join — and the maintained view must equal
    the one-shot join, which is what the oracle computes. Output is the
    per-priority rollup of the view (count + cent-grid revenue)."""
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"), "o_orderpriority"
    )
    li = load(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("long")
        .alias("rev_cents"),
    )
    from ..streaming.ivm import incremental_join

    batches_a = [orders.filter(F.col("okey") % 3 == i) for i in range(3)]
    batches_b = [li.filter(F.expr("(okey DIV 3) % 3") == i) for i in range(3)]
    view = incremental_join(batches_a, batches_b, on="okey")
    return (
        view.groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.sum(F.col("rev_cents").cast("decimal(38,0)")).cast("long").alias("rev_cents_sum"),
        )
        .orderBy("o_orderpriority")
    )


IVM_JOIN_DELTA_SQL = """
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT)
                AS DECIMAL(38,0))) AS BIGINT) AS rev_cents_sum
FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
GROUP BY o.o_orderpriority
ORDER BY o.o_orderpriority
"""

QUERIES["ivm_join_delta"] = Q(
    ivm_join_delta,
    IVM_JOIN_DELTA_SQL,
    "delta-join maintained view equals the one-shot join (per-priority rollup)",
)


def stream_dedup_watermark(spark, sf_dir):
    """LIVE watermarked streaming exact dedup
    (operators/dedup.py::streaming_exact_dedup →
    ``dropDuplicatesWithinWatermark``): an at-least-once source replays
    rows across later micro-batches and each replay must drop against
    the seen-key state. Ticks: tick 0 = first half, ticks 1-2 = second
    half plus byte-identical replays of earlier rows (first-arrival-wins
    is only observable through row identity, so replays are exact copies
    — whichever arrival survives, the emitted row is the same).
    The watermark horizon (45 days) exceeds the sample's full time span,
    so no seen-key state evicts during the run and the sink must equal
    exactly DISTINCT input: the oracle is that distinct set. Dedup rows
    pass through append mode on first arrival (no windows to withhold);
    state size is bounded by keys inside the horizon — the eviction
    contract itself is pinned by the pytest streaming suite."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..operators.dedup import streaming_exact_dedup

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 13 == 0)
        .select("event_id", "ts", "event_type", "value")
        .toPandas()
        .sort_values("event_id")
    )
    n = len(ev)
    first, second = ev.iloc[: n // 2], ev.iloc[n // 2 :]
    base = tempfile.mkdtemp(prefix="stream-dedup-")
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("event_type", pa.string()),
            ("value", pa.float64()),
        ]
    )
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        ticks = [
            first,
            # replay a third of tick-0 alongside the new rows
            __import__("pandas").concat([second.iloc[: len(second) // 2], first.iloc[::3]]),
            # replay across a further batch boundary too
            __import__("pandas").concat([second.iloc[len(second) // 2 :], first.iloc[1::3], second.iloc[::4]]),
        ]
        for i, part in enumerate(ticks):
            path = f"{base}/in/tick-{i}.parquet"
            pq.write_table(
                pa.Table.from_pandas(
                    part[["event_id", "ts", "event_type", "value"]],
                    schema=schema,
                    preserve_index=False,
                ),
                path,
            )
            os.utime(path, (now - 30 + i * 10, now - 30 + i * 10))
        stream = spark.readStream.schema(
            "event_id long, ts timestamp, event_type string, value double"
        ).option("maxFilesPerTrigger", 1).parquet(f"{base}/in")
        deduped = streaming_exact_dedup(
            stream, key_cols=["event_id"], event_time_col="ts", watermark="45 days"
        )
        q = (
            deduped.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_dedup_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.table("stream_dedup_sink").select(
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_dedup_sink")
    return spark.createDataFrame(
        collected, "event_id long, ts_ms long, event_type string, cents long"
    )


STREAM_DEDUP_WATERMARK_SQL = """
SELECT DISTINCT event_id, epoch_ms(ts) AS ts_ms, event_type,
       CAST(ROUND(value * 100) AS BIGINT) AS cents
FROM events WHERE event_id % 13 = 0
"""

QUERIES["stream_dedup_watermark"] = Q(
    stream_dedup_watermark,
    STREAM_DEDUP_WATERMARK_SQL,
    "LIVE dropDuplicatesWithinWatermark under cross-batch replays == DISTINCT input",
)


def stream_update_mode_counts(spark, sf_dir):
    """UPDATE output mode pin: a grouped streaming count emits the
    changed (key, count) row every micro-batch, so the memory sink
    accumulates a GROWING count sequence per key; because a grouped
    count under replay-free input is monotone, MAX(count) per key is
    exactly the final total — which is what the oracle computes from
    the batch table. Complements the append-mode gates (append
    withholds open windows; update streams revisions)."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 17 == 0)
        .select("event_id", "ts", "event_type")
        .toPandas()
        .sort_values("event_id")
    )
    n = len(ev)
    base = tempfile.mkdtemp(prefix="stream-update-")
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_type", pa.string())]
    )
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        for i in range(3):
            part = ev.iloc[i * n // 3 : (i + 1) * n // 3]
            path = f"{base}/in/tick-{i}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False), path
            )
            os.utime(path, (now - 30 + i * 10, now - 30 + i * 10))
        counts = (
            spark.readStream.schema("event_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
            .groupBy("event_type")
            .agg(F.count("*").alias("cnt"))
        )
        q = (
            counts.writeStream.outputMode("update")
            .format("memory")
            .queryName("stream_update_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = (
            spark.table("stream_update_sink")
            .groupBy("event_type")
            .agg(F.max("cnt").cast("long").alias("n_events"))
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_update_sink")
    return spark.createDataFrame(collected, "event_type string, n_events long")


STREAM_UPDATE_MODE_COUNTS_SQL = """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events
FROM events WHERE event_id % 17 = 0
GROUP BY event_type
"""

QUERIES["stream_update_mode_counts"] = Q(
    stream_update_mode_counts,
    STREAM_UPDATE_MODE_COUNTS_SQL,
    "UPDATE-mode revision stream: MAX(count) per key == the batch total",
)


def stream_chained_windows(spark, sf_dir):
    """Chained stateful aggregations in ONE streaming query (Spark 4:
    multiple stateful operators in append mode): hourly counts per type
    feed a second windowed aggregation — `window(window_col, '1 day')`
    — producing each day's peak hourly rate and distinct active hours.
    Only CLOSED hourly windows flow downstream, and only CLOSED day
    windows reach the sink, so the oracle is the two-level batch rollup
    restricted to days whose end precedes the final watermark (the
    stream's input is staged punctually, watermark = max ts − 30 min).
    Before Spark 4 this required two queries and an intermediate sink."""
    import os
    import shutil
    import tempfile
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ev = (
        load(spark, sf_dir, "events")
        .filter(F.col("event_id") % 5 == 0)
        .select("event_id", "ts", "event_type")
        .toPandas()
        .sort_values("ts")
    )
    n = len(ev)
    base = tempfile.mkdtemp(prefix="stream-chain-")
    schema = pa.schema(
        [("event_id", pa.int64()), ("ts", pa.timestamp("us")), ("event_type", pa.string())]
    )
    try:
        os.makedirs(f"{base}/in")
        now = _time.time()
        for i in range(3):
            part = ev.iloc[i * n // 3 : (i + 1) * n // 3]
            path = f"{base}/in/tick-{i}.parquet"
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False), path
            )
            os.utime(path, (now - 30 + i * 10, now - 30 + i * 10))
        stream = (
            spark.readStream.schema("event_id long, ts timestamp, event_type string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
            .withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("hw"), "event_type")
            .agg(F.count("*").alias("hourly_n"))
            .groupBy(F.window(F.col("hw"), "1 day").alias("dw"), "event_type")
            .agg(
                F.max("hourly_n").alias("max_hourly"),
                F.count("*").alias("n_hours"),
            )
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("memory")
            .queryName("stream_chain_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.table("stream_chain_sink").select(
            F.unix_millis("dw.start").alias("day_start_ms"),
            "event_type",
            F.col("max_hourly").cast("long").alias("max_hourly"),
            F.col("n_hours").cast("long").alias("n_hours"),
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("stream_chain_sink")
    return spark.createDataFrame(
        collected, "day_start_ms long, event_type string, max_hourly long, n_hours long"
    )


STREAM_CHAINED_WINDOWS_SQL = """
WITH s AS (SELECT * FROM events WHERE event_id % 5 = 0),
wm AS (SELECT MAX(ts) - INTERVAL 30 MINUTE AS w FROM s),
hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type, COUNT(*) AS hourly_n
  FROM s GROUP BY date_trunc('hour', ts), event_type
),
daily AS (
  SELECT date_trunc('day', h) AS d, event_type,
         MAX(hourly_n) AS max_hourly, COUNT(*) AS n_hours
  FROM hourly GROUP BY date_trunc('day', h), event_type
)
SELECT epoch_ms(d) AS day_start_ms, event_type,
       CAST(max_hourly AS BIGINT) AS max_hourly,
       CAST(n_hours AS BIGINT) AS n_hours
FROM daily
WHERE epoch_ms(d + INTERVAL 1 DAY) <= (SELECT epoch_ms(w) FROM wm)
"""

QUERIES["stream_chained_windows"] = Q(
    stream_chained_windows,
    STREAM_CHAINED_WINDOWS_SQL,
    "Spark 4 chained stateful aggregations: day-over-hour windows in one query",
)


def stream_corpus_ingest(spark, sf_dir):
    """LIVE training-corpus ingest loop — the engine's text-pipeline
    stages composed under Structured Streaming: documents arrive over 3
    micro-batches (with byte-identical replays across batch boundaries —
    an at-least-once feed), and each ``foreachBatch`` pass (1) quality-
    gates JVM-side (≥3 whitespace tokens), (2) dedups within the batch
    on a per-lang content hash, (3) anti-joins the accumulated corpus to
    drop cross-batch dups/replays (the incremental exact-dedup shape:
    at 100 TB the seen-hash side is the bucketed store probed by hash
    prefix — here the corpus itself, content-addressed), and (4)
    appends the survivors. Rows carry only (lang, text), so every copy
    of a document is byte-identical and survivorship is unobservable —
    the final corpus must equal exactly the DISTINCT quality-passing
    input, which is the oracle. Trigger.AvailableNow drains the staged
    ticks one file per batch and stops."""
    import os
    import shutil
    import tempfile

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    docs = (
        load(spark, sf_dir, "documents")
        .select("lang", "text")
        .toPandas()
        .sort_values(["lang", "text"])
        .reset_index(drop=True)
    )
    n = len(docs)
    thirds = [docs.iloc[: n // 3], docs.iloc[n // 3 : 2 * n // 3], docs.iloc[2 * n // 3 :]]
    ticks = [
        thirds[0],
        pd.concat([thirds[1], thirds[0].iloc[::4]]),   # replay a quarter of tick 0
        pd.concat([thirds[2], thirds[0].iloc[1::5], thirds[1].iloc[::3]]),
    ]
    base = tempfile.mkdtemp(prefix="stream-corpus-")
    schema = pa.schema([("lang", pa.string()), ("text", pa.string())])
    sink = f"{base}/corpus"
    try:
        os.makedirs(f"{base}/in")
        for i, part in enumerate(ticks):
            pq.write_table(
                pa.Table.from_pandas(part, schema=schema, preserve_index=False),
                f"{base}/in/tick-{i}.parquet",
            )

        def handle(batch_df, batch_id):
            b = (
                batch_df.withColumn(
                    # Length-prefixed encoding: a fixed-width length field
                    # makes the (lang, text) -> string map injective, so the
                    # dedup key is exactly as strong as DISTINCT (lang, text)
                    # (a bare "|" separator would collide when lang values
                    # are prefix-related and text carries pipes).
                    "h",
                    F.md5(
                        F.concat(
                            F.lpad(F.length("lang").cast("string"), 10, "0"),
                            F.col("lang"),
                            F.col("text"),
                        )
                    ),
                )
                .withColumn("n_tokens", F.size(F.split("text", " ")))
                .filter(F.col("n_tokens") >= 3)
                .dropDuplicates(["h"])
            )
            if os.path.isdir(sink) and any(
                f.endswith(".parquet") for f in os.listdir(sink)
            ):
                seen = spark.read.parquet(sink).select("h")
                b = b.join(seen, "h", "left_anti")
            b.select("lang", "text", "h", "n_tokens").write.mode("append").parquet(sink)

        stream = (
            spark.readStream.schema("lang string, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = (
            spark.read.parquet(sink)
            .groupBy("lang")
            .agg(
                F.count("*").cast("bigint").alias("n_docs"),
                F.sum("n_tokens").cast("bigint").alias("sum_tokens"),
                F.sum(F.length("text")).cast("bigint").alias("sum_chars"),
            )
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected, "lang string, n_docs long, sum_tokens long, sum_chars long"
    ).orderBy("lang")


STREAM_CORPUS_INGEST_SQL = """
WITH d AS (SELECT DISTINCT lang, text FROM documents),
f AS (
  SELECT lang, len(string_split(text, ' ')) AS nt, length(text) AS nc
  FROM d WHERE len(string_split(text, ' ')) >= 3
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS sum_tokens,
       CAST(SUM(nc) AS BIGINT) AS sum_chars
FROM f GROUP BY lang ORDER BY lang
"""

QUERIES["stream_corpus_ingest"] = Q(
    stream_corpus_ingest,
    STREAM_CORPUS_INGEST_SQL,
    "LIVE corpus ingest: quality gate + cross-batch content dedup + append corpus",
)


def ivm_agg_retraction(spark, sf_dir):
    """Maintained AGGREGATE under retractions — the weighted-IVM algebra
    streaming engines use for updates/deletes (Δ-weighted multiset: an
    update emits (−old, +new), a delete emits (−current), and the view
    is just SUM(weight) / SUM(weight·value) per key, additively
    mergeable in any batch order). The change log here derives from
    orders (every order inserts; every 3rd re-prices +$10; every 7th
    cancels), arrives as three batches, and the view is maintained by
    merging each batch's partial aggregate into the running view —
    never touching prior batches' rows. The maintained view must equal
    the directly-computed final state (the oracle). At 100 TB each
    merge step aggregates only the delta; the view stays |keys|-sized."""
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    cur = F.when(F.col("k") % 3 == 0, F.col("c") + 1000).otherwise(F.col("c"))
    inserts = o.select("o_orderpriority", F.lit(1).alias("w"), F.col("c").alias("wc"))
    updates = o.filter(F.col("k") % 3 == 0).select(
        "o_orderpriority", F.lit(-1).alias("w"), F.col("c").alias("wc")
    ).unionAll(
        o.filter(F.col("k") % 3 == 0).select(
            "o_orderpriority", F.lit(1).alias("w"), (F.col("c") + 1000).alias("wc")
        )
    )
    deletes = o.filter(F.col("k") % 7 == 0).select(
        "o_orderpriority", F.lit(-1).alias("w"), cur.alias("wc")
    )

    def agg(df):
        return df.groupBy("o_orderpriority").agg(
            F.sum("w").alias("n_live"), F.sum(F.col("w") * F.col("wc")).alias("revenue_cents")
        )

    view = None
    for batch in (inserts, updates, deletes):
        part = agg(batch)
        view = part if view is None else (
            view.unionAll(part)
            .groupBy("o_orderpriority")
            .agg(F.sum("n_live").alias("n_live"), F.sum("revenue_cents").alias("revenue_cents"))
        )
    return view.select(
        "o_orderpriority",
        F.col("n_live").cast("bigint").alias("n_live"),
        F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
    ).orderBy("o_orderpriority")


IVM_AGG_RETRACTION_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
final AS (
  SELECT o_orderpriority,
         CASE WHEN k % 3 = 0 THEN c + 1000 ELSE c END AS c
  FROM base WHERE k % 7 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(c) AS BIGINT) AS revenue_cents
FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["ivm_agg_retraction"] = Q(
    ivm_agg_retraction,
    IVM_AGG_RETRACTION_SQL,
    "weighted-IVM aggregate maintenance under updates/deletes == recomputed state",
)


def stream_ivm_retraction(spark, sf_dir):
    """LIVE weighted-IVM maintenance — the batched `ivm_agg_retraction`
    algebra running under Structured Streaming: the orders change log
    (inserts, then re-prices as (−old,+new) pairs, then cancels as
    retractions) is staged as three tick files, and each foreachBatch
    pass folds ONLY its delta into the persisted view (read-modify-
    write of the |keys|-sized aggregate — prior deltas are never
    touched). Trigger.AvailableNow drains the ticks in order; the final
    maintained view must equal the directly-computed final state. The
    shape is the production continuous-aggregate loop: delta-sized
    input, key-sized state, associative merge."""
    import os
    import shutil
    import tempfile

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    cur = F.when(F.col("k") % 3 == 0, F.col("c") + 1000).otherwise(F.col("c"))
    ticks = [
        o.select("o_orderpriority", F.lit(1).alias("w"), F.col("c").alias("wc")),
        o.filter(F.col("k") % 3 == 0)
        .select("o_orderpriority", F.lit(-1).alias("w"), F.col("c").alias("wc"))
        .unionAll(
            o.filter(F.col("k") % 3 == 0).select(
                "o_orderpriority", F.lit(1).alias("w"), (F.col("c") + 1000).alias("wc")
            )
        ),
        o.filter(F.col("k") % 7 == 0).select(
            "o_orderpriority", F.lit(-1).alias("w"), cur.alias("wc")
        ),
    ]
    base = tempfile.mkdtemp(prefix="stream-ivm-")
    view_dir = f"{base}/view"
    try:
        os.makedirs(f"{base}/in")
        for i, t in enumerate(ticks):
            t.coalesce(1).write.parquet(f"{base}/in/tick-{i}", mode="overwrite")
            for f in os.listdir(f"{base}/in/tick-{i}"):
                if f.endswith(".parquet"):
                    os.rename(
                        f"{base}/in/tick-{i}/{f}", f"{base}/in/tick-{i}.parquet"
                    )
            shutil.rmtree(f"{base}/in/tick-{i}")

        def handle(batch_df, batch_id):
            delta = batch_df.groupBy("o_orderpriority").agg(
                F.sum("w").alias("n_live"),
                F.sum(F.expr("CAST(w AS BIGINT) * wc")).alias("revenue_cents"),
            )
            if os.path.isdir(view_dir) and any(
                f.endswith(".parquet") for f in os.listdir(view_dir)
            ):
                prior = spark.read.parquet(view_dir)
                delta = (
                    prior.unionByName(delta)
                    .groupBy("o_orderpriority")
                    .agg(
                        F.sum("n_live").alias("n_live"),
                        F.sum("revenue_cents").alias("revenue_cents"),
                    )
                )
            tmp = f"{base}/view-next"
            delta.coalesce(1).write.mode("overwrite").parquet(tmp)
            shutil.rmtree(view_dir, ignore_errors=True)
            os.rename(tmp, view_dir)

        stream = (
            spark.readStream.schema("o_orderpriority string, w int, wc long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = spark.read.parquet(view_dir).select(
            "o_orderpriority",
            F.col("n_live").cast("bigint").alias("n_live"),
            F.col("revenue_cents").cast("bigint").alias("revenue_cents"),
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected, "o_orderpriority string, n_live long, revenue_cents long"
    ).orderBy("o_orderpriority")


STREAM_IVM_RETRACTION_SQL = """
WITH base AS (
  SELECT o_orderkey AS k, o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
),
final AS (
  SELECT o_orderpriority,
         CASE WHEN k % 3 = 0 THEN c + 1000 ELSE c END AS c
  FROM base WHERE k % 7 <> 0
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_live,
       CAST(SUM(c) AS BIGINT) AS revenue_cents
FROM final GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["stream_ivm_retraction"] = Q(
    stream_ivm_retraction,
    STREAM_IVM_RETRACTION_SQL,
    "LIVE weighted-IVM view maintenance under retractions == recomputed state",
)


def stream_topk_leaderboard(spark, sf_dir):
    """LIVE maintained top-k — the leaderboard loop: per-user spend
    totals accumulate across three micro-batches in a keyed view
    (delta-sized input folded into |keys|-sized state per batch, the
    `stream_ivm_retraction` merge), and the top 10 is extracted from
    the maintained view at read time — never maintained as ranked
    state, because rank is a pure function of the view (the standard
    production trick: maintain the additive aggregate, derive the
    order). Final leaderboard must equal the batch-computed one."""
    import os
    import shutil
    import tempfile

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") % 3).alias("tick"),
    )
    base = tempfile.mkdtemp(prefix="stream-topk-")
    view_dir = f"{base}/view"
    try:
        os.makedirs(f"{base}/in")
        for i in range(3):
            part = ev.filter(F.col("tick") == i).drop("tick")
            part.coalesce(1).write.parquet(f"{base}/in/t{i}", mode="overwrite")
            for f in os.listdir(f"{base}/in/t{i}"):
                if f.endswith(".parquet"):
                    os.rename(f"{base}/in/t{i}/{f}", f"{base}/in/tick-{i}.parquet")
            shutil.rmtree(f"{base}/in/t{i}")

        def handle(batch_df, batch_id):
            delta = batch_df.groupBy("user_id").agg(F.sum("cents").alias("cents"))
            if os.path.isdir(view_dir) and any(
                f.endswith(".parquet") for f in os.listdir(view_dir)
            ):
                delta = (
                    spark.read.parquet(view_dir)
                    .unionByName(delta)
                    .groupBy("user_id")
                    .agg(F.sum("cents").alias("cents"))
                )
            tmp = f"{base}/view-next"
            delta.coalesce(1).write.mode("overwrite").parquet(tmp)
            shutil.rmtree(view_dir, ignore_errors=True)
            os.rename(tmp, view_dir)

        stream = (
            spark.readStream.schema("user_id long, cents long")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{base}/in")
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        out = (
            spark.read.parquet(view_dir)
            .orderBy(F.col("cents").desc(), F.col("user_id").asc())
            .limit(10)
            .select(
                F.col("user_id").cast("bigint").alias("user_id"),
                F.col("cents").cast("bigint").alias("cents"),
            )
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    df = spark.createDataFrame(collected, "user_id long, cents long")
    return df.orderBy(F.col("cents").desc(), F.col("user_id").asc())


STREAM_TOPK_LEADERBOARD_SQL = """
SELECT CAST(user_id AS BIGINT) AS user_id,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY user_id
ORDER BY cents DESC, user_id ASC
LIMIT 10
"""

QUERIES["stream_topk_leaderboard"] = Q(
    stream_topk_leaderboard,
    STREAM_TOPK_LEADERBOARD_SQL,
    "LIVE leaderboard: additive keyed view maintained per batch, rank derived at read",
)


def stream_restart_resume(spark, sf_dir):
    """Crash-recovery as a hard-signal gate (the pytest restart contract
    `test_pipeline_restart_from_checkpoint`, driver-visible): a keyed
    count view absorbs two ticks under one streaming query, the query
    object is discarded ("crash"), two MORE ticks are staged, and a NEW
    query on the SAME checkpoint must resume from the recorded offsets —
    absorbing exactly the new ticks, never replaying the absorbed ones
    (the foreachBatch sink is a read-modify-write fold, so one replayed
    tick would double-count and fail the oracle). Final view == the
    batch rollup of all four ticks."""
    import os
    import shutil
    import tempfile

    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.col("event_id") % 4).alias("tick"),
    )
    base = tempfile.mkdtemp(prefix="stream-resume-")
    view_dir = f"{base}/view"
    try:
        os.makedirs(f"{base}/in")

        def stage(i):
            part = ev.filter(F.col("tick") == i).drop("tick")
            part.coalesce(1).write.parquet(f"{base}/in/t{i}", mode="overwrite")
            for f in os.listdir(f"{base}/in/t{i}"):
                if f.endswith(".parquet"):
                    os.rename(f"{base}/in/t{i}/{f}", f"{base}/in/tick-{i}.parquet")
            shutil.rmtree(f"{base}/in/t{i}")

        def handle(batch_df, batch_id):
            delta = batch_df.groupBy("event_type").agg(
                F.count("*").alias("n"), F.sum("cents").alias("cents")
            )
            if os.path.isdir(view_dir) and any(
                f.endswith(".parquet") for f in os.listdir(view_dir)
            ):
                delta = (
                    spark.read.parquet(view_dir)
                    .unionByName(delta)
                    .groupBy("event_type")
                    .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
                )
            tmp = f"{base}/view-next"
            delta.coalesce(1).write.mode("overwrite").parquet(tmp)
            shutil.rmtree(view_dir, ignore_errors=True)
            os.rename(tmp, view_dir)

        def run_query():
            stream = (
                spark.readStream.schema("event_type string, cents long")
                .option("maxFilesPerTrigger", 1)
                .parquet(f"{base}/in")
            )
            q = (
                stream.writeStream.foreachBatch(handle)
                .option("checkpointLocation", f"{base}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            try:
                q.awaitTermination(timeout=300)
            finally:
                q.stop()

        stage(0); stage(1)
        run_query()          # absorbs ticks 0-1, then "crashes"
        stage(2); stage(3)
        run_query()          # NEW query, same checkpoint: must resume
        out = spark.read.parquet(view_dir).select(
            "event_type",
            F.col("n").cast("bigint").alias("n"),
            F.col("cents").cast("bigint").alias("cents"),
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected, "event_type string, n long, cents long"
    ).orderBy("event_type")


STREAM_RESTART_RESUME_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY event_type ORDER BY event_type
"""

QUERIES["stream_restart_resume"] = Q(
    stream_restart_resume,
    STREAM_RESTART_RESUME_SQL,
    "LIVE restart-from-checkpoint: resumed query absorbs only new ticks, view == batch truth",
)


def stream_pyds_cdc_source(spark, sf_dir):
    """LIVE Python Data Source API gate (Spark 4, sources/pyds.py): the
    CDC feed consumed through a REGISTERED ``format("cdc_table")``
    streaming source backed by a growing DuckDB table — the reference's
    notify/poll loop (AgentsPostgresSubscriber.java:28-49) as a
    first-class Spark source with Structured Streaming owning the
    (ts, id) offset in the query checkpoint. Three availableNow drains
    over three appends; the middle append includes rows whose ts was
    already seen but whose id is later — the lexicographic watermark
    must deliver them exactly once (the classic equal-timestamp poller
    bug). Output: per-event-type count + ts sum over everything
    delivered, which must equal the batch truth over the deterministic
    90-row event subset."""
    import os
    import shutil
    import tempfile

    import duckdb

    from ..sources.pyds import CdcTableDataSource

    spark.dataSource.register(CdcTableDataSource)
    src = (
        load(spark, sf_dir, "events")
        .orderBy("event_id")
        .limit(90)
        .select("event_id", "event_type")
        .collect()
    )
    # ts = event_id DIV 3 -> repeated timestamps across neighbors, so the
    # tick split below genuinely exercises the equal-ts/later-id edge
    rows = [(r["event_id"] // 3, f"cp-{r['event_id']:05d}", r["event_type"]) for r in src]
    rows.sort(key=lambda x: (x[0], x[1]))
    # 31/61 splits land mid-timestamp (ids come in ts-triples), so drains
    # 2 and 3 each START at an equal-ts/later-id row past the watermark
    ticks = [rows[:31], rows[31:61], rows[61:]]
    base = tempfile.mkdtemp(prefix="pyds-gate-")
    db = f"{base}/cdc.duckdb"
    sink = f"{base}/delivered"
    try:
        con = duckdb.connect(db)
        con.execute("CREATE TABLE checkpoint_writes(ts BIGINT, checkpoint_id VARCHAR, content VARCHAR)")
        con.close()
        for tick in ticks:
            con = duckdb.connect(db)  # writer closed before the drain polls
            con.executemany("INSERT INTO checkpoint_writes VALUES (?, ?, ?)", tick)
            con.close()
            q = (
                spark.readStream.format("cdc_table")
                .option("database", db)
                .option("table", "checkpoint_writes")
                .option("ts_col", "ts")
                .option("id_col", "checkpoint_id")
                .load()
                .writeStream.foreachBatch(
                    lambda bdf, _bid: bdf.write.mode("append").parquet(sink)
                )
                .option("checkpointLocation", f"{base}/ckpt")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(timeout=120)
            q.stop()
        out = (
            spark.read.parquet(sink)
            .groupBy(F.col("content").alias("event_type"))
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum("ts").cast("bigint").alias("sum_ts"),
            )
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected, "event_type string, n long, sum_ts long"
    ).orderBy("event_type")


STREAM_PYDS_CDC_SOURCE_SQL = """
WITH s AS (
  SELECT event_id, event_type FROM events ORDER BY event_id LIMIT 90
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(event_id // 3) AS BIGINT) AS sum_ts
FROM s GROUP BY event_type ORDER BY event_type
"""

QUERIES["stream_pyds_cdc_source"] = Q(
    stream_pyds_cdc_source,
    STREAM_PYDS_CDC_SOURCE_SQL,
    "LIVE registered Python Data Source stream: checkpointed (ts,id) offsets, equal-ts late ids delivered once",
)


def stream_state_reader(spark, sf_dir):
    """Spark 4 State Data Source: crack a committed streaming-aggregation
    checkpoint open as a BATCH DataFrame. An availableNow stream runs a
    grouped count+sum over the events feed into a noop sink (state is the
    only output, exactly how a production state-repair / debugging job
    sees it); then ``spark.read.format("statestore")`` reads the
    operator's keyed state files directly — key struct, aggregation
    buffer struct, partition id — with no re-execution of the stream.
    The buffer carries the running COUNT and SUM on the cent grid, so
    the state contents equal the batch GROUP BY, which is the oracle.
    At 100 TB this read is one task per state partition over the
    checkpoint's delta/snapshot files — observability that costs a scan
    of the STATE, never of the source.

    The read must happen in the session that ran a streaming query (the
    reader resolves the StateStoreCoordinator endpoint); the gate runs
    its own stream first, so any caller-supplied session works.
    """
    import shutil
    import tempfile

    base = tempfile.mkdtemp(prefix="statestore-read-")
    try:
        ev = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
        ev.write.parquet(f"{base}/in")
        stream = (
            spark.readStream.schema("user_id long, event_type string, value double")
            .parquet(f"{base}/in")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
            )
        )
        q = (
            stream.writeStream.outputMode("update")
            .format("noop")
            .option("checkpointLocation", f"{base}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination(timeout=300)
        finally:
            q.stop()
        # Aggregation buffers expose positional field names (count, sum).
        st = spark.read.format("statestore").load(f"{base}/ckpt").select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").cast("long").alias("n_events"),
            F.col("value.sum").cast("long").alias("sum_cents"),
        )
        collected = st.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected, "event_type string, n_events long, sum_cents long"
    )


STREAM_STATE_READER_SQL = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY event_type
"""

QUERIES["stream_state_reader"] = Q(
    stream_state_reader,
    STREAM_STATE_READER_SQL,
    "State Data Source: committed agg checkpoint read back as batch key/buffer rows",
)
