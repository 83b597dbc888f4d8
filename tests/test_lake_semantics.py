"""Lakehouse write/read semantics pins:

- dynamic partition overwrite replaces ONLY the partitions present in
  the incoming batch (static mode would wipe the table) — the
  idempotent-backfill write pattern;
- mergeSchema reads union the footers of heterogeneous parquet files
  (added columns null-fill for old files) — the schema-evolution read
  the state store's MERGE path relies on.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_dynamic_partition_overwrite_touches_only_incoming(spark, tmp_path):
    tgt = str(tmp_path / "tbl")
    base = spark.range(0, 100).select(
        F.col("id"),
        (F.col("id") % 4).alias("p"),
        F.lit("v1").alias("tag"),
    )
    base.write.partitionBy("p").parquet(tgt)

    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
    try:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        patch = spark.range(0, 10).select(
            (F.col("id") + 1000).alias("id"),
            F.lit(2).alias("p"),
            F.lit("v2").alias("tag"),
        )
        patch.write.mode("overwrite").partitionBy("p").parquet(tgt)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
        else:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    out = spark.read.parquet(tgt)
    # partition 2 fully replaced by the 10 v2 rows
    p2 = out.filter(F.col("p") == 2)
    assert p2.count() == 10
    assert p2.filter(F.col("tag") == "v1").count() == 0
    # the other three partitions are untouched v1 data
    rest = out.filter(F.col("p") != 2)
    assert rest.count() == 75
    assert rest.filter(F.col("tag") != "v1").count() == 0


def test_merge_schema_read_unions_footers(spark, tmp_path):
    d = str(tmp_path / "evo")
    spark.range(0, 5).select(F.col("id"), F.lit("a").alias("old_col")).write.parquet(
        f"{d}/f1"
    )
    spark.range(5, 10).select(
        F.col("id"), F.lit("b").alias("old_col"), F.lit(7).alias("new_col")
    ).write.parquet(f"{d}/f2")

    merged = spark.read.option("mergeSchema", "true").parquet(f"{d}/f1", f"{d}/f2")
    assert set(merged.columns) == {"id", "old_col", "new_col"}
    # old files null-fill the added column; new files carry it
    assert merged.filter(F.col("new_col").isNull()).count() == 5
    assert merged.filter(F.col("new_col") == 7).count() == 5
    # WITHOUT mergeSchema the read keeps one footer's schema — the
    # documented reason the state store rewrites schemas explicitly
    plain = spark.read.parquet(f"{d}/f1", f"{d}/f2")
    assert len(plain.columns) <= 3


def test_metadata_columns_expose_file_provenance(spark, tmp_path):
    """The hidden _metadata struct must expose per-row file provenance
    (path, size, modification time) on parquet reads — the mechanism a
    lake debugger uses to trace a bad row to its file without a manifest
    join. Row counts per file must agree with the written layout."""
    import pyspark.sql.functions as F

    d = str(tmp_path / "files")
    spark.range(0, 30).withColumn("p", F.col("id") % 3).write.partitionBy(
        "p"
    ).parquet(d)
    df = spark.read.parquet(d).select(
        "id", "p", F.col("_metadata.file_path").alias("fp"),
        F.col("_metadata.file_size").alias("sz"),
    )
    per_file = df.groupBy("fp").count().collect()
    assert sum(r["count"] for r in per_file) == 30
    # every file path carries its partition directory
    for r in per_file:
        assert "/p=" in r["fp"]
    assert df.filter(F.col("sz") <= 0).count() == 0
