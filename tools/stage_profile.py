#!/usr/bin/env python3
"""Stage-level profile of one registry query: run it once on a UI-enabled
session, then dump per-stage executor-time, task-skew (median vs max task),
and shuffle volumes from the UI REST API. This is the tool that localized
the round-5 fuzzy_entity_match cost (uniform verify volume, NOT a
straggler — median task 56.8 s vs max 58.6 s in the dominant stage),
turning a guessed "salt the skew" plan into a measured volume fix.

Usage: python tools/stage_profile.py QUERY [SF_DIR] [top_n]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main(query: str, sf_dir: str = "/root/testdata/sf0.1", top_n: str = "18") -> None:
    import os

    from pyspark.sql import SparkSession

    # mirror session.get_spark's tuned defaults, with the UI enabled
    # (get_spark disables it; the REST API is the whole point here)
    spark = (
        SparkSession.builder.appName(f"profile-{query}")
        .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "true")
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    fn = all_queries()[query].fn
    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]

    # warm runs: a cold first run is dominated by whole-stage-codegen C2
    # compilation (a 2.3 s warm query reads 41 s cold), which mis-ranks
    # every stage; profile the LAST run only, after the JIT settles
    warm_runs = int(os.environ.get("SPARK_GRAFT_PROFILE_WARMUPS", "3"))
    for i in range(warm_runs):
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        print(f"# warm{i}: {time.perf_counter() - t0:.2f}s", file=sys.stderr)
        spark.catalog.clearCache()
        for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            rdd.unpersist()
    seen = {
        s["stageId"]
        for s in json.load(
            urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/stages")
        )
    }
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    print(f"# {query} @ {sf_dir}: {dt:.2f}s, {n} rows", file=sys.stderr)

    stages = [
        s
        for s in json.load(
            urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app}/stages?status=complete"
            )
        )
        if s["stageId"] not in seen
    ]
    rows = []
    for s in stages:
        sid = s["stageId"]
        try:
            q = json.load(
                urllib.request.urlopen(
                    f"{ui}/api/v1/applications/{app}/stages/{sid}/0/taskSummary?quantiles=0.5,1.0"
                )
            )
            med, mx = q["executorRunTime"]
        except Exception:
            med, mx = -1, -1
        rows.append(
            (
                s.get("executorRunTime", 0) / 1000.0,
                sid,
                s["numCompleteTasks"],
                med / 1000.0,
                mx / 1000.0,
                s.get("shuffleWriteBytes", 0) // 2**20,
                s.get("shuffleReadBytes", 0) // 2**20,
            )
        )
    rows.sort(reverse=True)
    print("sumRun_s stage tasks medTask_s maxTask_s shufW_MB shufR_MB  (skew = max/med)")
    for r in rows[: int(top_n)]:
        skew = (r[4] / r[3]) if r[3] > 0 else float("nan")
        print(
            f"{r[0]:8.1f} {r[1]:5d} {r[2]:5d} {r[3]:9.2f} {r[4]:9.2f} "
            f"{r[5]:8d} {r[6]:8d}  {skew:5.2f}"
        )
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:4])
