"""Source-format breadth: prove the engine ingests JSONL and CSV lakes
losslessly, not just parquet.

The gate stages the events table as JSON-lines and CSV via DISTRIBUTED
writes (``df.write.json/csv`` — executor-side, no driver funnel), reads
each back with an explicit schema (schema inference is a full extra scan
at 100 TB — never rely on it), and emits one identical aggregate row per
format. Text formats carry timestamps as epoch-ms BIGINT and values on
the micro grid: float→text→float round-trips and timezone formatting are
exactly the hazards a lake pipeline must design out, and the integer
columns make the parity bit-exact. The oracle computes the same
aggregates straight off the parquet table once per format label.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Q, load

_FORMATS = ("parquet", "jsonl", "csv", "orc", "xml")


def format_roundtrip_parity(spark, sf_dir):
    import shutil
    import tempfile

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("value_micro"),
    )
    schema = "event_id long, ts_ms long, event_type string, value_micro long"
    base = tempfile.mkdtemp(prefix="fmt-parity-")
    try:
        ev.write.mode("overwrite").json(f"{base}/jsonl")
        ev.write.mode("overwrite").option("header", "true").csv(f"{base}/csv")
        ev.write.mode("overwrite").orc(f"{base}/orc")
        # Spark 4 built-in XML (SPARK-44265): distributed write, rowTag framing
        ev.write.mode("overwrite").option("rowTag", "event").format("xml").save(f"{base}/xml")
        readers = {
            "parquet": ev,
            "jsonl": spark.read.schema(schema).json(f"{base}/jsonl"),
            "csv": spark.read.schema(schema)
            .option("header", "true")
            .csv(f"{base}/csv"),
            "orc": spark.read.schema(schema).orc(f"{base}/orc"),
            "xml": spark.read.schema(schema)
            .option("rowTag", "event")
            .format("xml")
            .load(f"{base}/xml"),
        }
        aggs = [
            df.agg(
                F.lit(fmt).alias("fmt"),
                F.count("*").cast("long").alias("n_rows"),
                F.sum("event_id").cast("long").alias("sum_id"),
                F.sum(F.col("ts_ms").cast("decimal(38,0)"))
                .cast("double")
                .alias("sum_ts_ms"),
                F.sum("value_micro").cast("long").alias("sum_value_micro"),
                F.countDistinct("event_type").cast("long").alias("n_types"),
            )
            for fmt, df in readers.items()
        ]
        out = aggs[0]
        for a in aggs[1:]:
            out = out.unionAll(a)
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected,
        "fmt string, n_rows long, sum_id long, sum_ts_ms double, "
        "sum_value_micro long, n_types long",
    ).orderBy("fmt")


FORMAT_ROUNDTRIP_PARITY_SQL = f"""
WITH base AS (
  SELECT COUNT(*) AS n_rows,
         CAST(SUM(event_id) AS BIGINT) AS sum_id,
         CAST(CAST(SUM(CAST(epoch_ms(ts) AS DECIMAL(38,0))) AS DECIMAL(38,0))
              AS DOUBLE) AS sum_ts_ms,
         CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
           AS sum_value_micro,
         CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
  FROM events
)
SELECT f.fmt, b.n_rows, b.sum_id, b.sum_ts_ms, b.sum_value_micro, b.n_types
FROM (VALUES {", ".join(f"('{f}')" for f in sorted(_FORMATS))}) AS f(fmt)
CROSS JOIN base b
ORDER BY f.fmt
"""


QUERIES = {
    "format_roundtrip_parity": Q(
        format_roundtrip_parity,
        FORMAT_ROUNDTRIP_PARITY_SQL,
        "lossless JSONL/CSV/ORC/XML lake ingestion parity vs parquet",
    ),
}


def applog_source_scan(spark, sf_dir):
    """Custom Python DataSource end-to-end (sources/pylog.py): stage the
    events table as 4 tab-separated .applog shard files, read them back
    through ``spark.read.format("applog")`` — one InputPartition per
    shard, executor-side parsing — and aggregate per kind. Oracle: the
    same rollup straight off parquet."""
    import os
    import shutil
    import tempfile

    from ..sources.pylog import register

    register(spark)
    ev = load(spark, sf_dir, "events").select(
        F.concat(F.lit("u"), F.col("user_id")).alias("key"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_type").alias("kind"),
        F.concat(F.lit("v="), F.round(F.col("value") * 1e6).cast("long")).alias(
            "payload"
        ),
        (F.col("event_id") % 4).alias("shard"),
    )
    rows = ev.collect()
    base = tempfile.mkdtemp(prefix="applog-")
    try:
        for shard in range(4):
            with open(os.path.join(base, f"part-{shard}.applog"), "w") as fh:
                fh.write("# applog v1\n")
                for r in rows:
                    if r["shard"] == shard:
                        fh.write(
                            f"{r['key']}\t{r['ts_ms']}\t{r['kind']}\t{r['payload']}\n"
                        )
        logs = spark.read.format("applog").option("path", base).load()
        out = (
            logs.groupBy("kind")
            .agg(
                F.count("*").cast("long").alias("n"),
                F.countDistinct("key").cast("long").alias("n_keys"),
                F.sum(F.col("ts_ms").cast("decimal(38,0)"))
                .cast("double")
                .alias("sum_ts_ms"),
                F.sum(F.expr("CAST(substring(payload, 3) AS BIGINT)"))
                .cast("long")
                .alias("sum_value_micro"),
            )
            .orderBy("kind")
        )
        collected = out.collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        collected,
        "kind string, n long, n_keys long, sum_ts_ms double, sum_value_micro long",
    )


APPLOG_SOURCE_SCAN_SQL = """
SELECT event_type AS kind,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
       CAST(CAST(SUM(CAST(epoch_ms(ts) AS DECIMAL(38,0))) AS DECIMAL(38,0))
            AS DOUBLE) AS sum_ts_ms,
       CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT)
         AS sum_value_micro
FROM events
GROUP BY event_type
ORDER BY kind
"""

QUERIES["applog_source_scan"] = Q(
    applog_source_scan,
    APPLOG_SOURCE_SCAN_SQL,
    "custom Python DataSource (partition-per-shard applog reader)",
)


def applog_stream_scan(spark, sf_dir):
    """The custom Python DataSource in STREAMING mode
    (sources/pylog.py::AppLogStreamReader): three pre-staged applog tick
    files drain through `spark.readStream.format("applog")` one file per
    micro-batch (offset = consumed-file count, the file-stream contract),
    with a complete-mode rollup in the memory sink. The final aggregate
    must equal the batch rollup — the oracle — proving the streaming
    offsets lose and duplicate nothing across the three batches."""
    import os
    import shutil
    import tempfile

    from ..sources.pylog import register

    register(spark)
    spark.conf.set("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 9 == 0).select(
        F.concat(F.lit("u"), F.col("user_id")).alias("key"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ts_ms"),
        F.col("event_type").alias("kind"),
        F.concat(F.lit("v="), F.round(F.col("value") * 1e6).cast("long")).alias(
            "payload"
        ),
        (F.col("event_id") % 3).alias("tick"),
    )
    rows = ev.collect()
    base = tempfile.mkdtemp(prefix="applog-stream-")
    try:
        for tick in range(3):
            with open(os.path.join(base, f"tick-{tick}.applog"), "w") as fh:
                fh.write("# applog v1\n")
                for r in rows:
                    if r["tick"] == tick:
                        fh.write(
                            f"{r['key']}\t{r['ts_ms']}\t{r['kind']}\t{r['payload']}\n"
                        )
        stream = (
            spark.readStream.format("applog")
            .option("path", base)
            .option("maxFilesPerBatch", "1")
            .load()
        )
        # no countDistinct: streaming aggregation forbids distinct
        # aggregates (state would be unbounded); keys are signalled via
        # the exact micro sum + count instead
        agg = stream.groupBy("kind").agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.expr("CAST(substring(payload, 3) AS BIGINT)"))
            .cast("long")
            .alias("sum_value_micro"),
        )
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("applog_stream_sink")
            .option("checkpointLocation", f"{base}/ckpt")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        collected = spark.table("applog_stream_sink").collect()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        spark.catalog.dropTempView("applog_stream_sink")
    return spark.createDataFrame(
        collected, "kind string, n long, sum_value_micro long"
    ).orderBy("kind")


APPLOG_STREAM_SCAN_SQL = """
SELECT event_type AS kind,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS sum_value_micro
FROM events
WHERE event_id % 9 = 0
GROUP BY event_type
ORDER BY kind
"""

QUERIES["applog_stream_scan"] = Q(
    applog_stream_scan,
    APPLOG_STREAM_SCAN_SQL,
    "custom Python DataSource streaming: file-count offsets, one shard per micro-batch",
)
