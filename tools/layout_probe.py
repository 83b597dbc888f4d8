#!/usr/bin/env python3
"""Layout-invariance probe: run a diverse query subset on an adversarial
session (local[3], 5 shuffle partitions — nothing like the tuned
defaults) and compare against the DuckDB oracles. Any result that
depends on partitioning, partition order, or parallelism fails here
even though the driver-shaped replica passes — the check behind the
engine-wide md5-coin / integer-grid discipline (df.sample's layout
dependence, the counterexample, is pinned in
tests/test_api_surface_pins.py). Must run in its own process: the JVM
pins one master per process.

Run: python tools/layout_probe.py [sf_dir]

A second axis via SPARK_GRAFT_PROBE_MODE=codegen-off: same subset with
whole-stage codegen AND adaptive execution disabled (interpreted
expression evaluation, static planning) — results must not depend on
the execution engine variant any more than on layout. Run each mode in
its own process.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

SUBSET = [
    "dedup_minhash_lsh", "dedup_components", "shuffle_order_sample",
    "stratified_sample_counts", "pack_sequences_stats", "ann_ivf_kmeans",
    "graph_pagerank", "bpe_train_merges", "ts_sax_motifs",
    "value_ewma_exact", "user_event_type_concat", "latest_event_per_user",
    "kfold_assignment", "ab_test_analysis", "weighted_median_cents",
    "market_basket_pairs", "tree_split_histogram", "embedding_covariance",
    "vocab_idf_topk", "doc_embedding_mean_pool", "zorder_events_key",
    "value_gini_ppm", "user_rolling_median", "orders_skyline",
    "dedup_quality_keeper",
    # session-8 window idioms — ordering-sensitive by construction, so the
    # adversarial layout is exactly where they could break
    "user_active_streaks", "interval_union_coverage", "user_value_drawdown",
    "daily_local_peaks", "revenue_share_hierarchy",
    "tpch_q11_important_stock", "tpch_q16_supplier_cnt",
    # round-4 gates: clock-stamped ctx enrichment (mapInPandas grouping
    # must be layout-invariant) and real PNG decode (map-only, but the
    # Arrow batch split changes under local[3])
    "ctx_timestamp_stamp", "multimodal_decode_real",
]


def main(sf_dir: str = "/root/testdata/sf0.01") -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as e
    from tests.oracle_harness import compare, duck_con

    import os

    builder = (
        SparkSession.builder.master("local[3]")
        .appName("layout-probe")
        .config("spark.sql.shuffle.partitions", "5")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if os.environ.get("SPARK_GRAFT_PROBE_MODE") == "codegen-off":
        builder = (
            builder.config("spark.sql.codegen.wholeStage", "false")
            .config("spark.sql.codegen.factoryMode", "NO_CODEGEN")
            .config("spark.sql.adaptive.enabled", "false")
        )
    spark = builder.getOrCreate()
    con = duck_con(sf_dir)
    qs, oracles = e.queries(), e.oracle_sql()
    failed = []
    for name in SUBSET:
        try:
            problems = compare(qs[name](spark, sf_dir), con, oracles[name], name)
            print(("ok   " if not problems else "FAIL ") + name)
            if problems:
                failed.append(name)
                print("    " + problems[0])
        except Exception as ex:  # noqa: BLE001
            failed.append(name)
            print(f"ERR  {name}: {str(ex)[:120]}")
    print(f"\n{len(SUBSET) - len(failed)}/{len(SUBSET)} green; failed: {failed}")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:2]))
