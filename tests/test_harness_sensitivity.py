"""Negative controls for the oracle harness itself: compare() must FAIL
when values, types, columns, or row counts diverge — a comparator that
never fires makes every green gate vacuous. Each control corrupts one
axis and asserts the harness reports it."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


def _con():
    return duck_con(SF_DIR)


def test_value_corruption_is_detected(spark):
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    ok = compare(df, con, "SELECT r_regionkey, r_name FROM region", "ctl")
    assert not ok
    bad = compare(
        df.withColumn("r_regionkey", F.col("r_regionkey") + 1),
        con,
        "SELECT r_regionkey, r_name FROM region",
        "ctl",
    )
    assert bad and any("row" in p for p in bad)


def test_type_mismatch_is_detected(spark):
    """BIGINT vs DOUBLE of the same numeric value must flag — the
    driver hashes raw typed values."""
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/region.parquet").select(
        F.col("r_regionkey").cast("double").alias("r_regionkey"), "r_name"
    )
    bad = compare(df, con, "SELECT r_regionkey, r_name FROM region", "ctl")
    assert bad and any("type" in p for p in bad)


def test_column_and_count_divergence_detected(spark):
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    bad_cols = compare(
        df.withColumnRenamed("r_name", "region_name"),
        con,
        "SELECT r_regionkey, r_name FROM region",
        "ctl",
    )
    assert bad_cols and "columns differ" in bad_cols[0]
    bad_rows = compare(
        df.limit(3), con, "SELECT r_regionkey, r_name FROM region", "ctl"
    )
    assert bad_rows and "rowcount" in bad_rows[0]


def test_row_order_is_irrelevant(spark):
    """The compare sorts canonically — a repartitioned (arbitrary-order)
    result must still pass. This is the property every gate relies on."""
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet").repartition(7)
    ok = compare(
        df.select("c_custkey", "c_name"),
        con,
        "SELECT c_custkey, c_name FROM customer",
        "ctl",
    )
    assert not ok
