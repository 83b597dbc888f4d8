#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Measures steady-state plan cost: each query is first executed at sf0.001
(identical plan/codegen, negligible data) to warm whole-stage-codegen JIT
and the Arrow python-worker pool, then timed once at the target SF
(scan -> execute -> collect-to-count). Without the warm-up the first
md5/conv-heavy query absorbs ~5-20 s of one-time C2 compilation that is
not plan cost (verified by 5x repeat runs converging 9.6s -> 1.9s). Keep
this list aligned with the heaviest representative plans: aggregation
(q1), multi-join (q3/q5), window dedup (latest), shuffle-heavy text dedup
(minhash), vector search (ann), and the CDC state pipeline.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

BENCH_QUERIES = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5_region_revenue",
    "latest_event_per_user",
    "user_event_type_concat",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ann_cosine_topk",
    "text_quality_score",
    "multimodal_decode_stub",
]


def main() -> None:
    from cdc_agents_data_stream_spark.queries.registry import all_queries
    from cdc_agents_data_stream_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm outside the measured region: JVM, parquet readers, the Arrow
    # python-worker pool, and per-query whole-stage codegen (each plan runs
    # once against the smallest SF so C2 compiles the same generated code)
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 10).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).count()
    warm_dir = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")
    if os.path.isdir(warm_dir):
        for name in BENCH_QUERIES:
            try:
                registry[name].fn(spark, warm_dir).count()
            except Exception as exc:  # never let warm-up kill the bench
                print(f"# warmup {name} failed: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = registry[name]
        t0 = time.perf_counter()
        n = q.fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)
        print(f"# {name}: {timings[name]}s ({n} rows)", file=sys.stderr)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
