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
