#!/usr/bin/env python3
"""Scaling-curve evidence: time representative queries across the three
driver SFs (sf0.001 / sf0.01 / sf0.1 — 100× data spread) and report
seconds + rows at each point, plus the 0.01→0.1 (10× data) time ratio.

A plan that "would survive 100 TB" should show time growing no faster
than data once per-query fixed overhead (~0.1-0.3 s of job launch at
these SFs) stops dominating: ratio ≲ 10 on the 10× step for scan-bound
shapes, far below 10 for shapes whose reduction happens map-side.

Run: python tools/scaling_curve.py [out.md]   (writes SCALING.md)

A 4th decade is added automatically when the sf1-equivalent derivative
exists (generate it with ``python tools/make_sfx.py`` — 10 key-shifted
copies of sf0.1 in scratch space, distribution- and dup-rate-preserving);
the ``x10 ratio`` column then reports the sf0.1→sf1 step, the decade
where data cost clearly dominates job-launch overhead.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark-graft-sf1")
SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/spark-graft-sf10")

# One representative per execution-shape family (the bench's heavy set,
# minus the streaming/backfill pipelines whose cost is cadence-bound, not
# data-bound at these SFs).
QUERIES = [
    ("tpch_q1", "scan + one partial agg"),
    ("tpch_q3", "broadcast multi-join + agg"),
    ("tpch_q21_waiting_supplier", "semi/anti join chain"),
    ("latest_event_per_user", "window dedup-to-latest"),
    ("dedup_minhash_lsh", "shingle->minhash->band join->verify"),
    ("dedup_exact", "hash-group dedup"),
    ("ann_cosine_topk", "broadcast query x corpus scan"),
    ("ann_ivf_kmeans", "iterative k-means + cluster probe"),
    ("vocab_idf_topk", "salted two-level token agg"),
    ("pack_sequences_stats", "per-shard prefix-sum packing"),
    ("doc_embedding_mean_pool", "hashed embed + mean pool"),
    ("graph_pagerank", "3-round iterative join"),
    ("auc_roc_exact", "histogram rank statistic"),
    ("embedding_covariance", "d2-bounded moment partials"),
    ("bpe_train_merges", "iterative vocab aggregation"),
    ("market_basket_pairs", "bitmask basket fan-out + broadcast supports"),
    ("fuzzy_entity_match", "LSH-blocked record linkage"),
    ("ann_ivfpq", "IVF-PQ residual index probe"),
    ("survival_hazard_table", "bounded histogram + reverse cumulative"),
    ("tree_split_histogram", "histogram split search"),
    ("interval_union_coverage", "running-max interval coalescing (one window pass)"),
    ("user_active_streaks", "gaps-and-islands run collapse"),
]


def main(out: str = "SCALING.md") -> None:
    from cdc_agents_data_stream_spark.queries.registry import all_queries
    from cdc_agents_data_stream_spark.session import get_spark

    spark = get_spark("scaling")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()

    # warm each plan once at the smallest SF (codegen + Arrow pool);
    # warm failures must not abort the sweep — the timed loop records
    # them per-cell
    only = set(sys.argv[2:])
    for name, _ in QUERIES:
        if only and name not in only:
            continue
        try:
            registry[name].fn(spark, SFS[0]).count()
        except Exception as exc:
            print(f"# {name} warm FAILED: {exc}", file=sys.stderr)

    sfs = list(SFS)
    extra_tags = []
    for d, tag in ((SF1_DIR, "sf1*"), (SF10_DIR, "sf10*")):
        if os.path.isdir(d):
            sfs.append(d)
            extra_tags.append(tag)
    rows = []
    for name, shape in QUERIES:
        if only and name not in only:
            continue
        cells = []
        for sf in sfs:
            best, n = None, 0
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    n = registry[name].fn(spark, sf).count()
                    dt = time.perf_counter() - t0
                    best = dt if best is None or dt < best else best
                cells.append((round(best, 3), n))
                print(f"# {name} @ {sf.rsplit('/',1)[-1]}: {best:.3f}s ({n} rows)", file=sys.stderr)
            except Exception as exc:
                print(f"# {name} @ {sf.rsplit('/',1)[-1]}: FAILED {exc}", file=sys.stderr)
                cells.append((None, 0))
            finally:
                # Drop blocks pinned by this point (localCheckpoint /
                # persist materializations) before the next one: a
                # 22-query session otherwise accumulates every query's
                # pinned blocks in the block store, and by the heavy tail
                # the storage pool — not the query under test — is what
                # OOMs the JVM. MUST run on the failure path too: a
                # failed/OOM query leaves the MOST blocks behind.
                spark.catalog.clearCache()
                for rdd in spark.sparkContext._jsc.getPersistentRDDs().values():
                    try:
                        rdd.unpersist(True)
                    except Exception:
                        pass
        # ratio over the LAST decade step — the one where data cost
        # dominates fixed overhead
        measured = [c for c in cells if c[0] is not None]
        ratio = (
            round(measured[-1][0] / measured[-2][0], 1)
            if len(measured) >= 2 and measured[-2][0] > 0
            else float("inf")
        )
        rows.append((name, shape, cells, ratio))

    if only and out == "SCALING.md":
        # a filtered run would silently overwrite the committed full table
        # with only the filtered rows — force a scratch output instead
        out = "/tmp/SCALING_subset.md"
        print(f"# query filter active: redirecting output to {out}", file=sys.stderr)

    sf1_cols = "".join(f" {t} |" for t in extra_tags)
    sf1_note = (
        "\nStarred columns are synthetic 10×/100×-sf0.1 derivatives from\n"
        "tools/make_sfx.py (key-shifted copies, dup-rate- and distribution-\n"
        "preserving); `x10 ratio` then reports the LAST measured 10× step\n"
        f"({'sf1→sf10' if len(extra_tags) == 2 else 'sf0.1→sf1'}) — a\n"
        "measured 4th"
        + ("-and-5th" if len(extra_tags) == 2 else "")
        + " decade, not an extrapolation.\n"
        if extra_tags
        else ""
    )
    with open(out, "w") as fh:
        fh.write(
            "# SCALING — time vs data size (generated by tools/scaling_curve.py)\n\n"
            "Best-of-2 per point on local[32]; each column is 10× the data of the\n"
            "previous. `x10 ratio` = the time ratio of the LAST 10×-data step: the\n"
            "marginal cost of 10× more data once fixed job-launch overhead is\n"
            "amortized. Ratios at or below ~10 mean the plan scales\n"
            "linearly-or-better in data — the property that carries to a\n"
            "1000-executor 100 TB run (plan shapes are data-size-independent;\n"
            "see PLANS.md and tests/test_plan_lint.py).\n"
            + sf1_note
            + "\n| query | shape | sf0.001 | sf0.01 | sf0.1 |"
            + sf1_cols
            + " x10 ratio |\n|---|---|---|---|---|"
            + "---|" * len(extra_tags)
            + "---|\n"
        )
        for name, shape, cells, ratio in rows:
            fh.write(
                f"| {name} | {shape} | "
                + " | ".join(
                    f"{t}s ({n})" if t is not None else "OOM†" for t, n in cells
                )
                + f" | {ratio} |\n"
            )
    print(f"wrote {out}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main(*sys.argv[1:2])
