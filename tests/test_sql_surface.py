"""The spark.sql(...) entry point: registered views answer the same
questions as the DataFrame API, with pushdown intact through the views."""

from __future__ import annotations

import pytest

from cdc_agents_data_stream_spark.sql import register_tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def views(spark):
    return register_tables(spark, SF_DIR)


def test_tables_and_derived_views_registered(spark, views):
    assert set(views) >= {"region", "orders", "events", "events_ms"}
    assert spark.sql("SELECT COUNT(*) AS n FROM region").first()["n"] == 5


def test_sql_matches_dataframe_api(spark, views):
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    got = spark.sql(
        """
        SELECT o_orderstatus AS status, COUNT(*) AS n
        FROM orders GROUP BY o_orderstatus ORDER BY status
        """
    ).collect()
    df_side = (
        spark.table("orders")
        .groupBy("o_orderstatus")
        .count()
        .orderBy("o_orderstatus")
        .collect()
    )
    assert [(r["status"], r["n"]) for r in got] == [
        (r["o_orderstatus"], r["count"]) for r in df_side
    ]


def test_checkpoint_views_register_when_tables_exist(spark, tmp_path):
    from cdc_agents_data_stream_spark.sql import register_derived_views
    from tests.checkpointgen import gen_checkpoint_tables

    cps, writes = gen_checkpoint_tables(n_threads=1, n_ticks=2, repeat_tick=None)
    cps_path, writes_path = tmp_path / "cps.parquet", tmp_path / "writes.parquet"
    cps.to_parquet(cps_path)
    writes.to_parquet(writes_path)
    spark.read.parquet(str(cps_path)).createOrReplaceTempView("checkpoints")
    spark.read.parquet(str(writes_path)).createOrReplaceTempView("checkpoint_writes")
    names = register_derived_views(spark)
    assert {"message_writes", "latest_checkpoints", "latest_blobs"} <= set(names)
    # the noise channel rows are filtered by the view
    assert spark.sql(
        "SELECT COUNT(*) AS n FROM message_writes WHERE channel <> 'messages'"
    ).first()["n"] == 0
    latest = spark.sql(
        "SELECT task_id, content FROM latest_blobs WHERE thread_id = 'thread-0'"
    ).collect()
    assert len(latest) == 5  # one latest blob per task


def test_pushdown_survives_the_view(spark, views):
    plan = (
        spark.sql("SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F'")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan
    assert "o_orderstatus" in plan.split("PushedFilters:")[1].split("]")[0]
