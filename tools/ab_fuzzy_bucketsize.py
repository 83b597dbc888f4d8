#!/usr/bin/env python3
"""Paired in-process A/B re-test of OPTIMIZATION_r07 "not yet optimized"
item 1: the max_bucket cap mechanics inside minhash_lsh_incremental.

BEFORE (shipped): per-side windowed COUNT over (band, bucket) — one
exchange + sort per side, filter inline (r5's measured winner).

AFTER (candidate): pin each side's raw bucket table, aggregate bucket
sizes with a partial-agg groupBy, and apply the cap / salt domain via
broadcast anti- and left-joins of the tiny over-cap and near-cap lists
(over-cap buckets: bsz > max_bucket; hot buckets: bsz > _SALT_BLOCK).
The r5 A/B measured this 2x slower because the size agg re-evaluated the
signature subtree; with the raw bucket table pinned that cost is gone —
the re-test the r7 notes asked for, at sf0.1 and the sf1 derivative.

Candidate-set equivalence (doc pairs after cap+salt+verify) is asserted
vs the shipped operator at sf0.01 before timing.

Run: python tools/ab_fuzzy_bucketsize.py [n_rounds]  (AB_SF_DIR re-points)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.queries.dedup_queries import (  # noqa: E402
    _fuzzy_entity_corpus,
    fuzzy_entity_match,
)
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def incremental_aggcap(
    df_hist, df_new, threshold=0.6, n=1, max_bucket=256
):
    """minhash_lsh_incremental(verify='array') with the cap applied via
    pinned bucket tables + aggregated-size broadcast lists instead of the
    windowed per-side counts."""
    df_hist = D._normalize_id(df_hist, "doc_id")
    df_new = D._normalize_id(df_new, "doc_id")
    sh_hist = D.shingles(df_hist, "text", n, "doc_id")
    sh_new = D.shingles(df_new, "text", n, "doc_id")
    bh = D._pin_spill(D.minhash_band_buckets(D.minhash_signatures(sh_hist)))
    bn = D._pin_spill(D.minhash_band_buckets(D.minhash_signatures(sh_new)))
    sizes_h = bh.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    sizes_n = bn.groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    over_h = sizes_h.filter(F.col("bsz") > max_bucket).select("band", "bucket")
    over_n = sizes_n.filter(F.col("bsz") > max_bucket).select("band", "bucket")
    hot = (
        sizes_h.filter(
            (F.col("bsz") > D._SALT_BLOCK) & (F.col("bsz") <= max_bucket)
        )
        .select(
            "band",
            "bucket",
            F.ceil(F.col("bsz") / F.lit(D._SALT_BLOCK)).cast("int").alias("n_salt"),
        )
    )
    bh2 = (
        bh.join(F.broadcast(over_h), ["band", "bucket"], "left_anti")
        .join(F.broadcast(hot), ["band", "bucket"], "left")
        .withColumn(
            "salt",
            F.pmod(F.xxhash64("doc_id"), F.coalesce(F.col("n_salt"), F.lit(1))).cast(
                "int"
            ),
        )
        .drop("n_salt")
    )
    bn2 = (
        bn.join(F.broadcast(over_n), ["band", "bucket"], "left_anti")
        .join(F.broadcast(hot), ["band", "bucket"], "left")
        .withColumn(
            "salt",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1)
            ),
        )
        .drop("n_salt")
    )
    candidates = (
        bn2.alias("n")
        .join(
            bh2.alias("h"),
            (F.col("n.band") == F.col("h.band"))
            & (F.col("n.bucket") == F.col("h.bucket"))
            & (F.col("n.salt") == F.col("h.salt")),
        )
        .select(F.col("n.doc_id").alias("doc_a"), F.col("h.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = df_new.select(
        F.col("doc_id").alias("doc_a"), F.split(F.col("text"), " ").alias("__toks")
    ).select("doc_a", D._gram_array_of(F.col("__toks"), n).alias("g_a"))
    gb = df_hist.select(
        F.col("doc_id").alias("doc_b"), F.split(F.col("text"), " ").alias("__toks")
    ).select("doc_b", D._gram_array_of(F.col("__toks"), n).alias("g_b"))
    inter = F.size(F.array_intersect("g_a", "g_b"))
    return (
        candidates.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / (F.size("g_a") + F.size("g_b") - inter), 6).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(
            F.col("doc_a").alias("doc_new"),
            F.col("doc_b").alias("doc_hist"),
            "jaccard",
        )
    )


def fuzzy_aggcap(spark, sf_dir):
    clean, dirty = _fuzzy_entity_corpus(spark, sf_dir)
    return (
        incremental_aggcap(clean, dirty, threshold=0.6, n=1, max_bucket=256)
        .select(
            F.col("doc_new").alias("dirty_id"),
            F.col("doc_hist").alias("part_id"),
            "jaccard",
        )
        .orderBy("dirty_id", "part_id")
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-fuzzy-bucketsize")
    spark.sparkContext.setLogLevel("ERROR")
    eq_dir = "/root/testdata/sf0.01"
    rows_b = [tuple(r) for r in fuzzy_entity_match(spark, eq_dir).collect()]
    spark.catalog.clearCache()
    rows_a = [tuple(r) for r in fuzzy_aggcap(spark, eq_dir).collect()]
    spark.catalog.clearCache()
    assert rows_a == rows_b, f"MISMATCH: {len(rows_a)} vs {len(rows_b)} rows"
    print(f"equivalence ok at {eq_dir}: {len(rows_a)} identical links (ordered)")

    arms = {
        "before": lambda: fuzzy_entity_match(spark, SF_DIR).count(),
        "after": lambda: fuzzy_aggcap(spark, SF_DIR).count(),
    }

    def run(fn):
        t0 = time.perf_counter()
        fn()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()  # CACHE CONTRACT: release operator pins
        return dt

    for fn in arms.values():  # warm both plans
        run(fn)
    out = {k: [] for k in arms}
    for i in range(n):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab-fuzzy-cap:{arm}:{i}")
            out[arm].append(run(fn))
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"fuzzy_entity_match {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
