"""Shared helpers for the declared, oracle-checkable queries.

Every query is a ``(spark, sf_dir) -> DataFrame`` callable paired with an
ANSI-SQL oracle string DuckDB runs on the same parquet tables. Cross-engine
hash parity rules used throughout:

- event/order timestamps are emitted as **epoch milliseconds BIGINT**
  (``unix_millis`` / ``epoch_ms``) — parquet stores ns, Spark truncates to
  µs, so raw timestamp values would differ;
- money aggregates are computed in **exact DECIMAL arithmetic** and cast to
  DOUBLE once at the end — float summation order is engine-dependent,
  decimal sums are not;
- ratios/averages are **rounded** to a fixed scale;
- ranks / row numbers / counts are cast to **BIGINT** on both sides;
- every computed column carries the **same alias** in Spark and SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is TIMESTAMP(NANOS) in parquet, which vanilla Spark
        # rejects outright (PARQUET_TYPE_ILLEGAL). nanosAsLong is a
        # runtime-settable SQL conf, so set it here — the contract must work
        # on ANY caller-supplied session, not only ones built by session.py.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # With nanosAsLong Spark reads ts as a bigint of epoch-nanoseconds.
        # Normalize to a µs-precision timestamp. Oracles must order by
        # epoch_us(ts) so both engines sort at µs precision.
        if dict(df.dtypes).get("ts") == "bigint":
            # integer DIV — ns values overflow double precision, so no `/`
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Testdata generations vary in parquet timestamp flavor: ns (handled
    # above), µs-with-UTC (reads as TIMESTAMP), µs-no-tz (reads as
    # TIMESTAMP_NTZ, which unix_millis/datetime arithmetic reject). DuckDB
    # treats the naive values as UTC instants, so re-tag NTZ columns as
    # TIMESTAMP here — sessions run UTC, making the cast an identity re-tag
    # and keeping every downstream query engine-agnostic.
    ntz = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    if ntz:
        df = df.withColumns({c: F.col(c).cast("timestamp") for c in ntz})
    return df


def ms(col_name: str):
    """Epoch-millis BIGINT from a timestamp column; tolerates TIMESTAMP_NTZ
    (session TZ is UTC, so the cast is an identity re-tag)."""
    return F.unix_millis(F.col(col_name).cast("timestamp"))


class Q:
    """A declared query: Spark callable + optional DuckDB oracle SQL."""

    def __init__(self, fn, oracle: str | None, doc: str = ""):
        self.fn = fn
        self.oracle = oracle
        self.doc = doc
