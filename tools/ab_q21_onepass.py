#!/usr/bin/env python3
"""Paired in-process A/B for a one-pass tpch_q21 restructure.

BEFORE (shipped): the spec-shaped LeftSemi (another supplier exists) +
LeftAnti (no other supplier shipped later) pair — 3 passes over l1 and,
at scale, up to 4 lineitem-sized exchanges.

AFTER (candidate): one l1 pass. Per (orderkey, suppkey) the max ship
date; per orderkey the top supplier-max (m1), how many suppliers reach
it (cnt_m1), the second distinct supplier-max (m2), and the distinct
supplier count — all windows over ONE orderkey exchange. A row's
"latest ship date among OTHER suppliers" is then m1 unless this
supplier alone holds m1 (then m2); the semi+anti pair collapses to
  n_supp >= 2 AND coalesce(max_other <= l_shipdate, true).

Equivalence is asserted row-for-row at sf0.01 AND sf0.1 before timing.

Run: python tools/ab_q21_onepass.py [n_rounds]  (AB_SF_DIR to re-point)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from cdc_agents_data_stream_spark.queries.base import load  # noqa: E402
from cdc_agents_data_stream_spark.queries.tpch_queries import (  # noqa: E402
    tpch_q21_waiting_supplier,
)
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def q21_onepass(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    supp = load(spark, sf_dir, "supplier")
    l1 = li.join(orders, li.l_orderkey == orders.o_orderkey, "left_semi").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    # per (order, supplier): latest ship date
    g = l1.groupBy("l_orderkey", "l_suppkey").agg(F.max("l_shipdate").alias("ds"))
    wo = Window.partitionBy("l_orderkey")
    g = (
        g.withColumn("m1", F.max("ds").over(wo))
        .withColumn("n_supp", F.count("*").over(wo))
        .withColumn(
            "cnt_m1", F.sum(F.when(F.col("ds") == F.col("m1"), 1)).over(wo)
        )
        .withColumn(
            "m2", F.max(F.when(F.col("ds") < F.col("m1"), F.col("ds"))).over(wo)
        )
        .withColumn(
            "max_other",
            F.when(
                (F.col("ds") == F.col("m1")) & (F.col("cnt_m1") == 1), F.col("m2")
            ).otherwise(F.col("m1")),
        )
        .select("l_orderkey", "l_suppkey", "n_supp", "max_other")
    )
    waiting = (
        l1.join(g, ["l_orderkey", "l_suppkey"])
        .filter(
            (F.col("n_supp") >= 2)
            & (
                F.col("max_other").isNull()
                | (F.col("max_other") <= F.col("l_shipdate"))
            )
        )
    )
    return (
        waiting.groupBy("l_suppkey")
        .agg(F.count("*").cast("bigint").alias("numwait"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("numwait").cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-q21-onepass")
    spark.sparkContext.setLogLevel("ERROR")
    for eq_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        rows_b = [tuple(r) for r in tpch_q21_waiting_supplier(spark, eq_dir).collect()]
        rows_a = [tuple(r) for r in q21_onepass(spark, eq_dir).collect()]
        assert rows_a == rows_b, (
            f"MISMATCH at {eq_dir}: {rows_a[:5]} vs {rows_b[:5]}"
        )
        print(f"equivalence ok at {eq_dir}: {len(rows_a)} identical rows (ordered)")

    arms = {
        "before": lambda: tpch_q21_waiting_supplier(spark, SF_DIR).count(),
        "after": lambda: q21_onepass(spark, SF_DIR).count(),
    }
    for fn in arms.values():  # warm both plans
        fn()
    out = {k: [] for k in arms}
    for i in range(n):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab-q21:{arm}:{i}")
            t0 = time.perf_counter()
            fn()
            out[arm].append(time.perf_counter() - t0)
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"tpch_q21 {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
