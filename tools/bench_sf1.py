#!/usr/bin/env python3
"""sf1-decade heavy-query bench — the standing artifact the sf0.1 bench
cannot provide (VERDICT r7: at sf0.1 8 cores ≈ 32 cores on 29/42 queries,
i.e. per-job overhead dominates and neither parallelism nor long-document
behavior is measurable).

Runs the ten heaviest sf-driven bench queries against the sf1 derivative
(built by tools/make_sfx.py if missing — 10 key-shifted,
distribution-preserving copies of sf0.1), one session, per-query warm-up
(sf0.001 codegen + one discarded sf1 rep for the minhash-family
intra-session decay), then min/median of 5 timed reps, with the same
host forensics bench.py stamps (loadavg + hypervisor steal%).

Re-run command (the artifact under plans/r08/ records the output):

    python3 tools/bench_sf1.py > plans/rXX/bench_sf1_<tag>.json

Env: SPARK_GRAFT_SF1_DIR (default /tmp/spark-graft-sf1),
SPARK_GRAFT_CPUS (session cores, honored via session.get_spark).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402
from tools.solo_remeasure import measure_queries  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# the sf-driven heavy tail of BENCH_QUERIES, by round-7 recorded cost
# (the CDC family generates its own data and is scaled by
# tools/scaling_cdc.py instead)
HEAVY_QUERIES = [
    "fuzzy_entity_match",
    "dedup_minhash_lsh",
    "graph_pagerank",
    "ann_ivfpq",
    "ann_pq_trained",
    "stream_corpus_ingest",
    "ann_pq_adc",
    "dedup_simhash",
    "dedup_span_detect",
    "bpe_train_merges",
]


def ensure_sf1(sf_dir: str) -> None:
    from cdc_agents_data_stream_spark.schemas import TABLE_NAMES

    complete = os.path.isfile(os.path.join(sf_dir, "_COMPLETE")) and all(
        os.path.isfile(os.path.join(sf_dir, f"{t}.parquet")) for t in TABLE_NAMES
    )
    if complete:
        return
    print(f"# building sf1 derivative at {sf_dir} ...", file=sys.stderr)
    rc = subprocess.call(
        [sys.executable, os.path.join(REPO, "tools", "make_sfx.py"),
         "/root/testdata/sf0.1", sf_dir, "10"]
    )
    if rc != 0:
        raise SystemExit(f"make_sfx.py failed with rc={rc}")


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark-graft-sf1")
    ensure_sf1(sf_dir)

    from cdc_agents_data_stream_spark.session import get_spark

    load_start = bench._loadavg()
    jiffies_start = bench._cpu_jiffies()
    spark = get_spark("bench-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    par = spark.sparkContext.defaultParallelism
    spark.range(par * 10).repartition(par).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # discard=1: one full sf1 rep per query absorbs the intra-session
    # warm-up decay (recorded: minhash solo 8.3 -> ~2 s over early reps)
    results = measure_queries(spark, HEAVY_QUERIES, sf_dir, reps=5, discard=1)

    mins = {k: v["min"] for k, v in results.items()}
    medians = {k: v["median"] for k, v in results.items()}
    min_total = round(sum(mins.values()), 3)
    med_total = round(sum(medians.values()), 3)
    host = {
        "load_start": load_start,
        "load_end": bench._loadavg(),
        "cpus": os.cpu_count(),
        "spread": round(med_total / min_total, 3) if min_total else -1.0,
        "steal_pct": bench._steal_pct(jiffies_start),
    }
    print(json.dumps({
        "metric": "bench_sf1_heavy",
        "value": med_total,
        "unit": "sec",
        "stat": "median_of_5_warm",
        "queries": medians,
        "queries_min": mins,
        "min_total": min_total,
        "host": host,
        "sf": 1.0,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
