"""Live-JDBC integration for the incremental poller (S1).

The reference consumes Postgres via LISTEN/NOTIFY
(subscriber/AgentsPostgresSubscriber.java:28-49); the engine's
replacement is the offset poller, whose incrementality depends on the
offset predicate reaching the DATABASE as a pushed-down WHERE. This
test runs the poller against an actual JDBC source — DuckDB's JDBC
driver, when a jar is discoverable locally — and asserts:

1. the offset comparison appears in the JDBC scan's PushedFilters
   (so the database, not Spark, prunes old rows);
2. poll -> commit -> poll returns exactly the new rows.

The Spark JVM needs the jar on its classpath at session build, so the
whole scenario runs in a subprocess with its own SparkSession (the
shared test session can't load new jars). Skips when no jar is found
(set DUCKDB_JDBC_JAR to point at one explicitly).
"""

from __future__ import annotations

import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_duckdb_jdbc_jar() -> str | None:
    env = os.environ.get("DUCKDB_JDBC_JAR")
    if env and os.path.isfile(env):
        return env
    for root in (
        os.path.expanduser("~/.cache/coursier"),
        os.path.expanduser("~/.m2"),
        "/opt",
    ):
        hits = glob.glob(os.path.join(root, "**", "duckdb_jdbc*.jar"), recursive=True)
        if hits:
            return sorted(hits)[-1]
    return None


SCRIPT = r"""
import os, sys
sys.path.insert(0, {repo!r})
jar, db, offsets = sys.argv[1], sys.argv[2], sys.argv[3]
from pyspark.sql import SparkSession
spark = (
    SparkSession.builder.master("local[2]")
    .appName("jdbc-poller-it")
    .config("spark.jars", jar)
    .config("spark.driver.extraClassPath", jar)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
url = f"jdbc:duckdb:{{db}}"
driver = "org.duckdb.DuckDBDriver"

# Seed the database through plain JDBC in the same JVM (DriverManager via
# py4j) — one process owns the DuckDB file, Spark's scans read through it.
spark._jvm.java.lang.Class.forName(driver)
conn = spark._jvm.java.sql.DriverManager.getConnection(url)
st = conn.createStatement()
st.execute("CREATE TABLE checkpoint_writes(event_id BIGINT, ts BIGINT, cid VARCHAR)")
vals = ", ".join(f"({{i}}, {{1000 + i // 2}}, 'cp-{{i:03d}}')" for i in range(20))
st.execute(f"INSERT INTO checkpoint_writes VALUES {{vals}}")

from cdc_agents_data_stream_spark.sources.incremental import IncrementalReader, jdbc_table
table = jdbc_table(spark, url, "checkpoint_writes", driver=driver)
reader = IncrementalReader(offsets, ts_col="ts", id_col="cid")

b1 = reader.poll(table)
plan = b1._jdf.queryExecution().executedPlan().toString()
pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
assert pushed, f"no PushedFilters line in JDBC scan plan:\n{{plan}}"
assert any("ts" in ln and ("GreaterThan" in ln or ">" in ln) for ln in pushed), pushed[0]
print("PUSHED", pushed[0].strip()[:200])
assert b1.count() == 20
reader.commit()

# append 5 newer rows, second poll must return exactly those
more = [(100 + i, 2000 + i, f"cp-n{{i}}") for i in range(5)]
st.execute(
    "INSERT INTO checkpoint_writes VALUES "
    + ", ".join(f"({{e}}, {{t}}, '{{c}}')" for e, t, c in more)
)
b2 = reader.poll(table)
got = sorted(r["cid"] for r in b2.collect())
assert got == sorted(r[2] for r in more), got
reader.commit()
b3 = reader.poll(table)
assert b3.count() == 0
print("OK incremental JDBC poll verified")
st.close(); conn.close()
spark.stop()
"""


def test_poller_pushes_offset_predicate_into_jdbc_scan(tmp_path):
    jar = _find_duckdb_jdbc_jar()
    if jar is None:
        pytest.skip("no DuckDB JDBC jar discoverable (set DUCKDB_JDBC_JAR)")
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            SCRIPT.format(repo=REPO),
            jar,
            str(tmp_path / "it.duckdb"),
            str(tmp_path / "offsets.json"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "OK incremental JDBC poll verified" in proc.stdout
    assert "PUSHED" in proc.stdout


SCRIPT_E2E = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
jar, base = sys.argv[1], sys.argv[2]
os.makedirs(f"{{base}}/writes"); os.makedirs(f"{{base}}/cps"); os.makedirs(f"{{base}}/stage")
from pyspark.sql import SparkSession
from pyspark.sql import functions as F
spark = (
    SparkSession.builder.master("local[4]")
    .appName("jdbc-pipeline-e2e")
    .config("spark.jars", jar)
    .config("spark.driver.extraClassPath", jar)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
url = f"jdbc:duckdb:{{base}}/it.duckdb"
driver = "org.duckdb.DuckDBDriver"

from cdc_agents_data_stream_spark.sources.incremental import IncrementalReader, jdbc_table
from cdc_agents_data_stream_spark.state.store import ParquetAppendLog, ParquetStateStore
from cdc_agents_data_stream_spark.streaming.pipeline import run_foreachbatch_pipeline
from tests.checkpointgen import gen_checkpoint_tables

# Stage the reference scenario per tick (1 thread x 3 ticks), exactly like
# the file-cadence test: the SAME rows go (a) into the live JDBC table for
# the poller and (b) directly to parquet for the file-source control run.
N_TICKS = 3
cps, writes = gen_checkpoint_tables(n_threads=1, n_ticks=N_TICKS, repeat_tick=None)
for tick in range(N_TICKS):
    tick_of = lambda df: df[df.checkpoint_id.str.split("-").str[2].astype(int) == tick]
    tick_of(cps).to_parquet(f"{{base}}/cps/tick-{{tick}}.parquet")
    tick_of(writes).to_parquet(f"{{base}}/stage/tick-{{tick}}.parquet")

# Live database: checkpoint_writes plus the database-side ordering column
# every CDC-polled table carries (the reference's NOTIFY ordering analogue).
spark._jvm.java.lang.Class.forName(driver)
conn = spark._jvm.java.sql.DriverManager.getConnection(url)
st = conn.createStatement()
# the 1.0.0 JDBC driver has no ResultSet.getBytes — carry the blob as
# hex text over the wire and unhex Spark-side (byte-exact round trip)
_COLS = "thread_id, checkpoint_ns, checkpoint_id, task_id, idx, channel, type, hex(blob) AS blob_hex, task_path"
st.execute(
    f"CREATE TABLE checkpoint_writes AS "
    f"SELECT {{_COLS}}, CAST(0 AS BIGINT) AS write_ts "
    f"FROM read_parquet('{{base}}/stage/tick-0.parquet') LIMIT 0"
)

def insert_tick(tick):
    st.execute(
        f"INSERT INTO checkpoint_writes "
        f"SELECT {{_COLS}}, CAST({{1000 + tick}} AS BIGINT) AS write_ts "
        f"FROM read_parquet('{{base}}/stage/tick-{{tick}}.parquet')"
    )

table = jdbc_table(spark, url, "checkpoint_writes", driver=driver)
reader = IncrementalReader(f"{{base}}/offsets.json", ts_col="write_ts", id_col="checkpoint_id")

def poll_to_file(tick):
    batch = reader.poll(table)
    if tick == 0:
        plan = batch._jdf.queryExecution().executedPlan().toString()
        pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
        assert pushed and any("write_ts" in ln for ln in pushed), plan
        print("PUSHED", pushed[0].strip()[:160])
    out = batch.select(
        "thread_id", "checkpoint_ns", "checkpoint_id", "task_id",
        F.col("idx").cast("int").alias("idx"),
        "channel", "type", F.unhex("blob_hex").alias("blob"), "task_path",
    ).toPandas()
    assert len(out) == 6, f"tick {{tick}}: polled {{len(out)}} rows"
    out.to_parquet(f"{{base}}/writes/tick-{{tick}}.parquet")
    reader.commit()

# --- live loop: insert -> poll -> bridge file -> pipeline micro-batch ------
store = ParquetStateStore(spark, f"{{base}}/state")
log = ParquetAppendLog(spark, f"{{base}}/diffs")
insert_tick(0)
poll_to_file(0)
query = run_foreachbatch_pipeline(
    spark, f"{{base}}/writes", f"{{base}}/cps", store, log,
    checkpoint_location=f"{{base}}/ckpt",
    trigger={{"processingTime": "300 milliseconds"}},
    max_files_per_trigger=1,
)
try:
    for tick in range(1, N_TICKS):
        insert_tick(tick)
        poll_to_file(tick)
        time.sleep(0.3)
    deadline = time.time() + 180
    while time.time() < deadline:
        rows = {{r["session_id"]: r for r in store.read().collect()}}
        if rows.get("thread-0") and rows["thread-0"]["sequence_number"] == N_TICKS:
            break
        time.sleep(0.5)
finally:
    query.stop()
# idle poll returns nothing new
assert reader.poll(table).count() == 0

# --- control: the same ticks through the pure file-source pipeline --------
store2 = ParquetStateStore(spark, f"{{base}}/state2")
log2 = ParquetAppendLog(spark, f"{{base}}/diffs2")
q2 = run_foreachbatch_pipeline(
    spark, f"{{base}}/stage", f"{{base}}/cps", store2, log2,
    checkpoint_location=f"{{base}}/ckpt2",
    trigger={{"availableNow": True}},
    max_files_per_trigger=1,
)
q2.awaitTermination(180)

a = {{r["session_id"]: r for r in store.read().collect()}}
b = {{r["session_id"]: r for r in store2.read().collect()}}
assert set(a) == set(b) == {{"thread-0"}}, (sorted(a), sorted(b))
assert a["thread-0"]["sequence_number"] == b["thread-0"]["sequence_number"] == N_TICKS
ca, cb = json.loads(a["thread-0"]["cdc_content"]), json.loads(b["thread-0"]["cdc_content"])
assert ca == cb, "state doc diverged between JDBC-polled and file-source runs"
da = sorted(r["sequence_number"] for r in log.read(dedup=True).collect())
db = sorted(r["sequence_number"] for r in log2.read(dedup=True).collect())
assert da == db == list(range(1, N_TICKS + 1)), (da, db)
print("OK jdbc end-to-end pipeline state parity")
st.close(); conn.close()
spark.stop()
"""


def test_jdbc_poller_drives_pipeline_end_to_end(tmp_path):
    """The reference's full lifecycle (AgentsPostgresSubscriber.java:28-49
    -> DataStreamService.java:61-93) against a LIVE JDBC source in one
    loop: poll the DuckDB table through the offset reader (pushdown
    asserted), bridge each polled batch into the writes stream, let the
    foreachBatch pipeline MERGE state + append diffs, and require the
    final state doc and diff log to equal a pure file-source control run
    over the same ticks."""
    jar = _find_duckdb_jdbc_jar()
    if jar is None:
        pytest.skip("no DuckDB JDBC jar discoverable (set DUCKDB_JDBC_JAR)")
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT_E2E.format(repo=REPO), jar, str(tmp_path)],
        capture_output=True,
        text=True,
        timeout=540,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr[-3000:]}"
    assert "OK jdbc end-to-end pipeline state parity" in proc.stdout
    assert "PUSHED" in proc.stdout
