"""Bucketed-table co-located join: the lake-layout answer to the biggest
recurring shuffle at 100 TB.

Writing both join sides bucketed by the join key (`bucketBy` + sorted)
lets Catalyst plan the join with NO exchange on either side — each bucket
pair joins locally. This is the layout the engine's big fact-fact joins
(writes ⋈ checkpoints at full history scale) would use on a real lake;
the state store's md5-bucket scheme is the same idea applied to MERGE.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Two bucketed tables over the same join key, written once."""
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    for name, df, key in (
        ("b_orders", orders, "o_custkey"),
        ("b_customer", customer, "c_custkey"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        (
            df.write.mode("overwrite")
            .bucketBy(8, key)
            .sortBy(key)
            .option("path", str(base / name))
            .saveAsTable(name)
        )
    yield spark
    for name in ("b_orders", "b_customer"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_exchange(warehouse):
    spark = warehouse
    # disable broadcast for this plan so the join strategy under test is
    # the sort-merge between co-bucketed scans, not a broadcast shortcut
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        # co-located bucketed scans: no shuffle on either side
        assert "Exchange hashpartitioning" not in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(warehouse):
    spark = warehouse
    bucketed = (
        spark.table("b_orders")
        .join(spark.table("b_customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .join(
            spark.read.parquet(f"{SF_DIR}/customer.parquet"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )
