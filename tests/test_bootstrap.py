"""S8 schema bootstrap: idempotent CREATE TABLE IF NOT EXISTS."""

from cdc_agents_data_stream_spark.sources.bootstrap import TABLE_DDL, bootstrap_tables


def test_bootstrap_idempotent(spark, tmp_path):
    created = bootstrap_tables(spark, str(tmp_path), database="boot_test")
    assert len(created) == len(TABLE_DDL)
    # second boot is a no-op
    assert bootstrap_tables(spark, str(tmp_path), database="boot_test") == created
    tables = {t.name for t in spark.catalog.listTables("boot_test")}
    assert tables == set(TABLE_DDL)
    # empty table readable with declared schema
    df = spark.table("boot_test.checkpoint_writes")
    assert df.count() == 0
    assert "task_path" in df.columns
