#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed once as a warm-up-free wall-clock measurement of the
full plan (scan -> execute -> collect-to-count); the JVM/session start is
excluded. Keep this list aligned with the heaviest representative plans:
aggregation (q1), multi-join (q3/q5), window dedup (latest), shuffle-heavy
text dedup (minhash), vector search (ann), and the CDC state pipeline.
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

    # trigger JVM + parquet footer warmup outside the measured region
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

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
