#!/usr/bin/env python3
"""Solo re-measure of registry queries, bench-methodology-compatible:
one session, per-query sf0.001 codegen warm-up, then N timed reps
(scan -> execute -> count), reporting min AND median with the same host
forensics bench.py stamps (loadavg + hypervisor steal%).

This is the round-7/8 noise protocol's "solo min-of-5" encoded: a query
flagged ">30% regressed" by a full-bench comparison on this drifting
host converges back to ~its quiet value under solo re-measure when the
flag was contention, and stays inflated when it was code.

Usage:
    python3 tools/solo_remeasure.py [--sf SF_DIR] [--reps N] [--discard K]
                                    QUERY [QUERY ...]

Prints one JSON line to stdout:
    {"metric": "solo_remeasure", "sf": ..., "reps": N, "queries":
     {name: {"min": s, "median": s, "samples": [...]}}, "host": {...}}

Methodology matches bench.py (no cache clearing between reps — pinned
intermediates behave exactly as they do inside the bench); ``--discard``
drops the first K timed reps per query from the stats for long-warm-up
queries (minhash-family solo runs decay over several reps).
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402  (repo-root module: _loadavg/_cpu_jiffies/_steal_pct)


def measure_queries(
    spark,
    names: list[str],
    sf_dir: str,
    reps: int = 5,
    discard: int = 0,
    warm_dir: str = "/root/testdata/sf0.001",
) -> dict[str, dict]:
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    registry = all_queries()
    out: dict[str, dict] = {}
    for name in names:
        fn = registry[name].fn
        try:
            fn(spark, warm_dir).count()
        except Exception as exc:  # pragma: no cover - warmup must not kill the run
            print(f"# warmup {name} failed: {exc}", file=sys.stderr)
        samples = []
        for _ in range(reps + discard):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples.append(round(time.perf_counter() - t0, 3))
        kept = samples[discard:]
        out[name] = {
            "min": min(kept),
            "median": round(statistics.median(kept), 3),
            "samples": samples,
        }
        print(f"# {name}: min={out[name]['min']}s median={out[name]['median']}s "
              f"samples={samples}", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--discard", type=int, default=0)
    ap.add_argument("--metric", default="solo_remeasure")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from cdc_agents_data_stream_spark.session import get_spark

    load_start = bench._loadavg()
    jiffies_start = bench._cpu_jiffies()
    spark = get_spark("solo-remeasure")
    spark.sparkContext.setLogLevel("ERROR")
    # same pool warm-up as bench.py main()
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 10).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    results = measure_queries(spark, args.queries, args.sf, args.reps, args.discard)
    import os

    host = {
        "load_start": load_start,
        "load_end": bench._loadavg(),
        "cpus": os.cpu_count(),
        "steal_pct": bench._steal_pct(jiffies_start),
    }
    print(json.dumps({
        "metric": args.metric,
        "sf": args.sf,
        "reps": args.reps,
        "discard": args.discard,
        "queries": results,
        "host": host,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
