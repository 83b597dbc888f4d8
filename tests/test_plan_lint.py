"""Fleet-wide physical-plan lint over the queries that matter most (the
driver's 50-entry CORRECTNESS window + the bench roster): no
CartesianProduct anywhere, and BroadcastNestedLoopJoin / unpartitioned
Window only where an allowlist records WHY the shape is scale-safe
(1-row scalar broadcasts, dimension-bounded windows). A new query that
sneaks in an all-pairs join or a global row-window fails here before it
ever reaches a 100 TB cluster."""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"

# name -> reason the flagged construct is bounded (audited)
BNLJ_ALLOWED = {
    "tpch_q22_prospects": "threshold is a 1-row broadcast scalar (avg balance)",
    "tpch_q15_top_supplier": "max-revenue scalar: 1-row broadcast",
    "tpch_q14_promo_revenue": "single-row aggregate join",
    "tpch_q8_market_share": "single-row aggregate join",
    "ann_cosine_topk": "corpus x broadcast 5-row query set (intended rerank cross)",
    "ann_ivf_kmeans": "corpus x broadcast centroid table (bounded by MAX_CENTROIDS)",
    "ann_pq_trained": "corpus x broadcast codebook (bounded)",
    "semdedup_prune": "corpus x broadcast centroid table (bounded)",
    "mixture_budget_allocation": "source-dim x 1-row total",
    "graph_pagerank": "1-row dangling-mass scalar per round",
    "dedup_minhash_lsh": "band signatures x broadcast permutation literals",
    "quality_classifier": "doc batch x broadcast literal weight rows",
    "stratified_sample_counts": "strata dim x 1-row total",
    "temperature_mix_counts": "source dim x 1-row total",
    "dedup_lsh_recall": "recall numerator/denominator 1-row scalars",
    "corpus_build_pipeline": "composition: centroid/total scalars from stages",
    "training_prep_pipeline": "composition: quality thresholds are scalars",
    "value_pareto_cutoff": "1-row total-value scalar",
    "decontam_overlap": "1-row probe-set aggregate",
    "vocab_idf_topk": "1-row corpus-doc-count scalar for idf",
    "ann_ivfpq": "corpus x broadcast centroids + per-probe ADC tables (bounded)",
    "bpe_train_merges": "vocab x 1-row broadcast argmax merge rule per round",
}

WINDOW_GLOBAL_ALLOWED = {
    "orders_skyline": "window over per-date maxima (calendar-bounded)",
    "mixture_budget_allocation": "window over the source dimension (~20 rows)",
    "top1_global_event": "global top-1 via TakeOrdered, not a data-wide sort",
    "value_equidepth_bins": "window over bounded quantile boundaries",
    "shuffle_order_sample": "epoch-shuffle rank: range exchange, documented",
    "events_keyset_page": "page of 20 rows after keyset predicate",
    "dedup_prefix_filter": "token-frequency rank over the vocabulary",
    "fuzzy_best_link": "rank over per-entity candidate slivers",
    "graph_cheapest_route": "orderBy on the bounded reached set (output ordering)",
    "graph_bfs_reach": "orderBy on the bounded reached set (output ordering)",
    "skew_salted_join": "row_number over DISTINCT event types (dimension-bounded, ~5 rows)",
    "tree_split_histogram": "cumulative window over the <=100-bin value histogram",
}


def _window_queries():
    from cdc_agents_data_stream_spark.queries.registry import DRIVER_WINDOW, all_queries

    import bench

    names = list(dict.fromkeys(list(DRIVER_WINDOW) + bench.BENCH_QUERIES))
    qs = all_queries()
    # streaming/source gates execute real jobs (streams, git scans) at
    # construction time — their plans are audited by their own tests
    skip_prefixes = ("stream_", "applog_", "incremental_", "report_", "git_",
                     "schema_", "backfill_", "writes_")
    return [(n, qs[n]) for n in names if n in qs and not n.startswith(skip_prefixes)]


@pytest.mark.parametrize("name,q", _window_queries(), ids=lambda x: x if isinstance(x, str) else "")
def test_no_unbounded_plan_constructs(spark, name, q):
    df = q.fn(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product in plan"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_ALLOWED, (
            f"{name}: BroadcastNestedLoopJoin not in allowlist — audit whether "
            f"the broadcast side is scalar/bounded and record the reason"
        )
    # A physical Window line prints `Window [exprs], [partSpec], [orderSpec]`,
    # and EMPTY specs disappear from the print entirely. So:
    #   zero `], [` groups -> no partition AND no order spec (global window);
    #   one group whose content carries ASC/DESC -> it's an orderSpec, i.e.
    #     ordered-but-unpartitioned (global window);
    #   one group without a sort direction -> it's a partitionSpec, i.e. a
    #     partitioned-unordered window (e.g. pagerank's sum(w) OVER
    #     (PARTITION BY src)) — fine, not global;
    #   two groups -> partitioned and ordered — fine.
    for line in plan.splitlines():
        if "Window [" not in line:
            continue
        groups = line.count("], [")
        if groups >= 2:
            continue
        last = line.rsplit("], [", 1)[-1] if groups == 1 else ""
        if groups == 1 and " ASC" not in last and " DESC" not in last:
            continue  # lone group is a partition spec
        assert name in WINDOW_GLOBAL_ALLOWED, (
            f"{name}: unpartitioned Window — audit the row bound: {line[:160]}"
        )
