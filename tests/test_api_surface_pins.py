"""Small semantics/API pins that justify engine-wide conventions:

- join-strategy hints are honored (the plan obeys BROADCAST / MERGE);
- ``df.sample`` is a function of the partition LAYOUT, not just the
  seed — the reason every sampling operator in this repo keys on md5 of
  the row id instead;
- ``mapInArrow`` (the raw Arrow batch API under mapInPandas) reproduces
  the codegen Morton key bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_join_hints_are_honored(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    bhj = _plan(li.join(o.hint("broadcast"), li.l_orderkey == o.o_orderkey))
    assert "BroadcastHashJoin" in bhj
    smj = _plan(li.join(o.hint("merge"), li.l_orderkey == o.o_orderkey))
    assert "SortMergeJoin" in smj and "BroadcastHashJoin" not in smj


def test_sample_depends_on_partition_layout(spark):
    """Same seed, same data, different partitioning → different sample.
    df.sample draws per-partition from a seeded stream, so any upstream
    repartition silently changes WHICH rows survive. This is the
    documented reason the repo's stratified/shuffle/split operators key
    on md5(id) — a pure row function, invariant to layout."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("event_id")
    a = set(r.event_id for r in ev.sample(0.2, seed=42).collect())
    b = set(
        r.event_id for r in ev.repartition(7).sample(0.2, seed=42).collect()
    )
    assert a != b  # deterministic given fixed layouts; differs across them
    # and the md5 rule is layout-invariant by construction:
    md5_keep = F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10) % 5 == 0
    c = set(r.event_id for r in ev.filter(md5_keep).collect())
    d = set(r.event_id for r in ev.repartition(7).filter(md5_keep).collect())
    assert c == d


def test_map_in_arrow_matches_codegen_zorder(spark):
    """mapInArrow — the raw Arrow-RecordBatch API — computes the Morton
    key with pyarrow/numpy and must agree bit-for-bit with the
    literal-unrolled codegen expression (zorder_expr_sql)."""
    import pyarrow as pa

    from cdc_agents_data_stream_spark.operators.zorder import zorder_expr_sql

    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select(
            "event_id",
            (F.col("event_id") % 1024).alias("a"),
            F.least(F.round(F.col("value") * 10).cast("long"), F.lit(1023)).alias("b"),
        )
    )
    expected = ev.selectExpr(
        "event_id", f"CAST({zorder_expr_sql(['a', 'b'], 10)} AS BIGINT) AS zkey"
    )

    def morton(batches):
        import numpy as np

        for batch in batches:
            a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
            b = batch.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
            z = np.zeros_like(a)
            for bit in range(10):
                z |= ((a >> bit) & 1) << (bit * 2)
                z |= ((b >> bit) & 1) << (bit * 2 + 1)
            yield pa.RecordBatch.from_arrays(
                [batch.column("event_id"), pa.array(z)], names=["event_id", "zkey"]
            )

    got = ev.mapInArrow(morton, "event_id long, zkey long")
    diff = expected.join(got, "event_id").filter(
        expected.zkey != got.zkey
    )
    assert diff.count() == 0
    assert got.count() == ev.count()


def test_arrow_optimized_python_udf(spark):
    """Spark 4 Arrow-optimized Python UDFs (useArrow=True) must produce
    identical results to the row-at-a-time form AND actually take the
    Arrow path (ArrowEvalPython vs BatchEvalPython in the plan) — the
    difference is the Arrow batch transfer, ~an order of magnitude on
    wide scans, which is why the engine's hot paths never use the
    legacy form."""
    from pyspark.sql.functions import udf

    @udf("long", useArrow=True)
    def tri_arrow(x):
        return x * (x + 1) // 2

    @udf("long", useArrow=False)
    def tri_legacy(x):
        return x * (x + 1) // 2

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", (F.col("event_id") % 100).alias("x")
    )
    a = ev.select("event_id", tri_arrow("x").alias("t"))
    b = ev.select("event_id", tri_legacy("x").alias("t"))
    assert "ArrowEvalPython" in _plan(a)
    assert "BatchEvalPython" in _plan(b)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_approx_percentile_respects_rank_error(spark):
    """approx_percentile's accuracy contract: with accuracy parameter A,
    the returned value's TRUE rank must lie within n/A of the target
    rank (Greenwald-Khanna guarantee). Pinned against the exact sorted
    ranks at two accuracies — the contract an engine relies on when it
    swaps exact percentile for the sketch at scale."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select("value")
    n = ev.count()
    vals = sorted(r.value for r in ev.collect())
    for acc in (100, 10_000):
        got = ev.agg(
            F.expr(f"approx_percentile(value, 0.5, {acc})").alias("p")
        ).collect()[0]["p"]
        import bisect

        lo = bisect.bisect_left(vals, got)
        hi = bisect.bisect_right(vals, got)
        target = 0.5 * n
        slack = n / acc + 1
        assert lo - slack <= target <= hi + slack, (
            f"acc={acc}: rank window [{lo},{hi}] vs target {target} ± {slack}"
        )


def test_sql_scripting_control_flow(spark):
    """Spark 4 SQL scripting (BEGIN/DECLARE/WHILE/SET): an iterative
    script's result must equal the declarative equivalent — the
    procedural surface migrating stored-procedure workloads needs.
    DuckDB has no counterpart, so this pin is engine-internal."""
    spark.read.parquet(f"{SF_DIR}/orders.parquet").createOrReplaceTempView(
        "orders_script"
    )
    got = spark.sql(
        """
        BEGIN
          DECLARE total BIGINT DEFAULT 0;
          DECLARE i INT DEFAULT 0;
          WHILE i < 3 DO
            SET total = total + (
              SELECT COUNT(*) FROM orders_script
              WHERE o_orderstatus = element_at(array('P','O','F'), i + 1)
            );
            SET i = i + 1;
          END WHILE;
          SELECT total;
        END
        """
    ).collect()[0][0]
    want = spark.sql("SELECT COUNT(*) FROM orders_script").collect()[0][0]
    spark.catalog.dropTempView("orders_script")  # listTables() sees temp views
    assert got == want


def test_transpose_small_aggregate(spark):
    """Spark 4 ``df.transpose()``: rows become columns keyed by the first
    column — pinned on a tiny aggregate (transpose collects the frame to
    derive the output schema, so it is a driver-sized-results-only API)."""
    df = spark.createDataFrame(
        [("clicks", 10, 20), ("views", 30, 40)], "metric string, jan long, feb long"
    )
    t = df.transpose()
    assert t.columns == ["key", "clicks", "views"]
    rows = {r["key"]: (r["clicks"], r["views"]) for r in t.collect()}
    assert rows == {"jan": (10, 30), "feb": (20, 40)}


def test_lateral_join_top2_per_key(spark):
    """Spark 4 ``df.lateralJoin``: a correlated LIMIT-per-row subquery
    (the SQL LATERAL idiom as a DataFrame API). Must match the
    window-function top-2.

    Pin within the pin: the outer reference's NAME must not also resolve
    against the inner frame's lineage — ``col("user_id").outer()`` with
    user_id on both sides silently binds inner (the predicate degenerates
    to true and the subquery decorrelates to a global top-2; measured
    here before aliasing). Hence the left side is aliased ``uid`` first.
    """
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("user_id", "event_id", "value")
        .where(F.col("user_id") < 5)
    )
    users = ev.select(F.col("user_id").alias("uid")).distinct()
    top2_lateral = (
        users.lateralJoin(
            ev.where(F.col("user_id") == F.col("uid").outer())
            .orderBy(F.col("value").desc(), F.col("event_id"))
            .limit(2)
            .select("event_id", "value")
        )
        .select(F.col("uid").alias("user_id"), F.col("event_id"))
    )

    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    top2_window = (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select("user_id", "event_id")
    )
    assert sorted(map(tuple, top2_lateral.collect())) == sorted(
        map(tuple, top2_window.collect())
    )


def test_tvf_namespace_matches_select_explode(spark):
    """Spark 4 ``spark.tvf``: the table-valued-function namespace returns
    the same rows as the expression form of explode."""
    got = sorted(
        r["col"] for r in spark.tvf.explode(F.array(F.lit(3), F.lit(1), F.lit(2))).collect()
    )
    assert got == [1, 2, 3]


def test_to_arrow_roundtrip(spark):
    """``df.toArrow()`` hands back a pyarrow.Table whose values and types
    survive a createDataFrame round-trip bit-for-bit."""
    import pyarrow as pa

    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.25)], "id long, s string, x double"
    )
    tbl = df.toArrow()
    assert isinstance(tbl, pa.Table)
    assert tbl.schema.names == ["id", "s", "x"]
    back = spark.createDataFrame(tbl)
    assert back.schema == df.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
