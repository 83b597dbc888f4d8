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
    "training_prep_pipeline",
    "merge_transition_seq",
    "ann_pq_adc",
    "ann_pq_trained",
    "pack_sequences_stats",
    "vocab_idf_topk",
    "pii_scrub_stats",
    # round-3 additions: incremental dedup (map-only bloom probe),
    # substring-span dedup (the heaviest new text kernel), model-based
    # quality scoring, interval join, context-window chunking
    "dedup_bloom_incremental",
    "dedup_span_detect",
    "quality_classifier",
    "event_attribution_window",
    "chunk_documents",
    # distributed-ML additions: normal-equation OLS (one partial agg),
    # d2-bounded covariance partials, JL projection (map-only), and the
    # z-order clustering key (pure codegen bit math)
    "event_value_trend",
    "ann_ivfpq",
    "embedding_covariance",
    "embedding_rp_project",
    "zorder_events_key",
    # iterative-join representative: 3 PageRank rounds over the ~970k-edge
    # purchase graph (edge list materialized once, rank side per round)
    "graph_pagerank",
    # record-linkage representative: 20k dirtied entities probe the clean
    # catalog's MinHash band index (blocking + restricted verify)
    "fuzzy_entity_match",
    # session-5 additions: the scan-bound TPC-H probe (pushdown-only),
    # the heaviest new join shape (EXISTS+NOT-EXISTS via 3 lineitem
    # passes), the per-doc gram screens, and cluster-blocked SemDeDup
    "tpch_q6_forecast_revenue",
    "tpch_q21_waiting_supplier",
    "gopher_repetition_signals",
    "semdedup_prune",
    # PIT feature retrieval (two as-of carries) and the Arrow grouped-agg
    # UDAF path — the two newest execution shapes worth tracking
    "pit_feature_join",
    "value_gini_ppm",
    # session-7 additions: iterative declarative BPE training (5 argmax
    # rounds riding broadcasts), the live streaming corpus-ingest
    # composite (quality gate + cross-batch dedup + append publish), and
    # the histogram-trick split search
    "bpe_train_merges",
    "stream_corpus_ingest",
    "tree_split_histogram",
]


def bench_streaming_cadence(spark, n_ticks: int = 20, n_threads: int = 1) -> float:
    """The reference's only measured figure: a sustained
    insert -> notify -> latest-per-task -> merge -> diff -> upsert loop at
    2 batches/s with 5 tasks per tick for 20 consecutive state updates
    (BASELINE.md). Here: 20 one-tick micro-batches through the foreachBatch
    pipeline (join + argmax + state transition + MERGE + diff append),
    end-to-end seconds for all 20 (baseline equivalent: 10 s).

    ``n_threads`` scales the per-tick batch width (sessions per tick) —
    the CDC family's data-decade knob, used by tools/scaling_cdc.py. Past
    ``small_batch_max_rows`` rows per tick the pipeline flips from the
    driver fast path to the distributed plan by design."""
    import shutil
    import tempfile

    from cdc_agents_data_stream_spark.state.store import ParquetAppendLog, ParquetStateStore
    from cdc_agents_data_stream_spark.streaming.pipeline import run_foreachbatch_pipeline
    from tests.checkpointgen import gen_checkpoint_tables

    base = tempfile.mkdtemp(prefix="bench-stream-")
    # size shuffle partitions to per-batch volume (a handful of rows per
    # tick); restored afterwards so the relational queries keep theirs
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        cps, writes = gen_checkpoint_tables(
            n_threads=n_threads, n_ticks=n_ticks, repeat_tick=None
        )
        os.makedirs(f"{base}/writes")
        os.makedirs(f"{base}/cps")
        cps.to_parquet(f"{base}/cps/all.parquet")
        # checkpoint_id = cp-{thread}-{tick}-{hex}: slice on the exact tick
        # field (a substring match would leak other ticks into the file)
        tick_of = writes.checkpoint_id.str.split("-").str[2].astype(int)
        for tick in range(n_ticks):
            writes[tick_of == tick].to_parquet(f"{base}/writes/tick-{tick}.parquet")
        store = ParquetStateStore(spark, f"{base}/state")
        log = ParquetAppendLog(spark, f"{base}/diffs")
        t0 = time.perf_counter()
        query = run_foreachbatch_pipeline(
            spark,
            f"{base}/writes",
            f"{base}/cps",
            store,
            log,
            checkpoint_location=f"{base}/ckpt",
            max_files_per_trigger=1,
        )
        try:
            # blocks until every pre-staged tick file is processed; the
            # query is stopped only when idle (stopping mid-batch interrupts
            # the file-source listing thread and spams stack traces)
            query.processAllAvailable()
            elapsed = round(time.perf_counter() - t0, 3)
            seq = store.max_sequence_number()
            if seq < n_ticks:
                print(f"# streaming cadence incomplete: seq={seq} < {n_ticks}", file=sys.stderr)
        finally:
            query.stop()
        return elapsed
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        shutil.rmtree(base, ignore_errors=True)


def bench_backfill_throughput(spark, n_sessions: int = 100, n_ticks: int = 5) -> float:
    """Throughput counterpart to the cadence metric: absorb the FULL
    checkpoint history of ``n_sessions`` sessions in one batch backfill
    (join + argmax + keyed transition + MERGE + diff log). The reference
    processes sessions sequentially over JDBC at its 2-ticks/s cadence, so
    the equivalent work there is ~(n_sessions * n_ticks / 2) seconds
    (250 s at the defaults); one Spark batch does it in a handful of jobs
    regardless of session count — this is the number that scales to a
    cluster."""
    import shutil
    import tempfile

    from cdc_agents_data_stream_spark.plans.backfill import backfill
    from cdc_agents_data_stream_spark.state.store import ParquetAppendLog, ParquetStateStore
    from tests.checkpointgen import gen_checkpoint_tables

    base = tempfile.mkdtemp(prefix="bench-backfill-")
    try:
        # warm the transition plan's codegen + Arrow worker pool outside the
        # measured region (the streaming cadence no longer exercises the
        # distributed plan — its small ticks take the driver fast path)
        wcps, wwrites = gen_checkpoint_tables(n_threads=2, n_ticks=2, repeat_tick=None)
        wcps.to_parquet(f"{base}/wcps.parquet")
        wwrites.to_parquet(f"{base}/wwrites.parquet")
        backfill(
            spark,
            spark.read.parquet(f"{base}/wwrites.parquet"),
            spark.read.parquet(f"{base}/wcps.parquet"),
            ParquetStateStore(spark, f"{base}/wstate"),
            ParquetAppendLog(spark, f"{base}/wdiffs"),
        ).count()

        cps, writes = gen_checkpoint_tables(n_threads=n_sessions, n_ticks=n_ticks, repeat_tick=None)
        cps.to_parquet(f"{base}/cps.parquet")
        writes.to_parquet(f"{base}/writes.parquet")
        store = ParquetStateStore(spark, f"{base}/state")
        log = ParquetAppendLog(spark, f"{base}/diffs")
        writes_df = spark.read.parquet(f"{base}/writes.parquet")
        cps_df = spark.read.parquet(f"{base}/cps.parquet")
        t0 = time.perf_counter()
        state = backfill(spark, writes_df, cps_df, store, log)
        n = state.count()
        elapsed = round(time.perf_counter() - t0, 3)
        if n != n_sessions:
            print(f"# backfill produced {n} state docs, expected {n_sessions}", file=sys.stderr)
        return elapsed
    finally:
        shutil.rmtree(base, ignore_errors=True)


def _loadavg() -> float:
    """Host 1-minute load average, or -1 where /proc is unavailable."""
    try:
        with open("/proc/loadavg") as fh:
            return float(fh.read().split()[0])
    except (OSError, ValueError, IndexError):
        return -1.0


def _cpu_jiffies() -> tuple[float, float] | None:
    """(steal_jiffies, monotonic_now) from /proc/stat, or None.

    loadavg only sees THIS VM's runnable threads; on a shared hypervisor
    the dominant noise source is CPU steal (cycles the host gave to other
    guests), which inflates every query uniformly while load_start reads
    quiet. Sampling the steal counter around the run makes that
    adjudicable from the artifact itself."""
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return float(parts[8]), time.monotonic()
    except (OSError, ValueError, IndexError):
        return None


def _steal_pct(start: tuple[float, float] | None) -> float:
    """% of total machine CPU capacity stolen since ``start`` (USER_HZ=100)."""
    end = _cpu_jiffies()
    if start is None or end is None:
        return -1.0
    dt = end[1] - start[1]
    if dt <= 0:
        return -1.0
    return round((end[0] - start[0]) / 100.0 / (dt * (os.cpu_count() or 1)) * 100.0, 3)


def main() -> None:
    from cdc_agents_data_stream_spark.queries.registry import all_queries
    from cdc_agents_data_stream_spark.session import get_spark

    load_start = _loadavg()
    jiffies_start = _cpu_jiffies()
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

    # min AND median of N=3 per metric: min is the steady-state plan cost
    # (the comparable, headline number — a single run is hostage to
    # transient host load; one noisy-neighbor burst showed as a 4x outlier,
    # and back-to-back FULL runs have disagreed 2.3s vs 6.5s on one query);
    # the median quantifies how noisy THIS host was during THIS run, so a
    # drift between rounds can be attributed to code vs load without
    # re-running (tools/bench_compare.py measured ~2x uniform inflation on
    # identical code across driver rounds)
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}

    def measure(name: str, run, n_runs: int = 3) -> None:
        samples = []
        for _ in range(n_runs):
            samples.append(run())
        samples.sort()
        timings[name] = round(samples[0], 3)
        medians[name] = round(samples[len(samples) // 2], 3)
        print(
            f"# {name}: min={timings[name]}s median={medians[name]}s", file=sys.stderr
        )

    for name in BENCH_QUERIES:
        q = registry[name]

        def run_query(q=q):
            t0 = time.perf_counter()
            q.fn(spark, SF_DIR).count()
            return time.perf_counter() - t0

        measure(name, run_query)

    bench_streaming_cadence(spark, n_ticks=2)  # warm the streaming plans
    measure("cdc_stream_20_ticks", lambda: bench_streaming_cadence(spark))
    measure("cdc_backfill_100_sessions", lambda: bench_backfill_throughput(spark))
    # 20x the sessions through the DISTRIBUTED transition + MERGE sink (the
    # 100-session run's small result takes the driver fast path); reference
    # sequential-equivalent is ~5000 s — this is the scale-out story
    measure(
        "cdc_backfill_2000_sessions",
        lambda: bench_backfill_throughput(spark, n_sessions=2000),
    )

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # stdout stays EXACTLY one JSON line (the driver contract), sized to
    # fit the driver's ~2000-char recorded tail: the round-4 artifact
    # carried min AND median blocks in one line and the min block was
    # front-truncated out of the record. The primary line now carries the
    # medians (the robust stat) plus min_total; the full per-query
    # min-of-3 detail goes to stderr with the progress lines.
    print(
        json.dumps(
            {
                "metric": "bench_min_detail",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
            }
        ),
        file=sys.stderr,
    )
    # host-state stamp: a drifted artifact should carry its own noise
    # forensics (the r6 driver run read +18% uniformly vs a same-code
    # quiet-host run — load metadata makes that adjudicable without
    # re-deriving it from untouched-query drift). spread = median/min
    # totals: ~1.0 on a quiet host, inflating with contention.
    min_total = round(sum(timings.values()), 3)
    med_total = round(sum(medians.values()), 3)
    host = {
        "load_start": load_start,
        "load_end": _loadavg(),
        "cpus": os.cpu_count(),
        "spread": round(med_total / min_total, 3) if min_total else -1.0,
        # % of machine CPU capacity the hypervisor gave other guests over
        # the whole run — the contention loadavg cannot see (~0 on a quiet
        # host; a few % inflates every query uniformly)
        "steal_pct": _steal_pct(jiffies_start),
    }
    print(
        json.dumps(
            {
                "metric": "bench_total",
                "value": med_total,
                "unit": "sec",
                "stat": "median_of_3",
                "queries": medians,
                "min_total": min_total,
                "host": host,
                "sf": sf_val,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
