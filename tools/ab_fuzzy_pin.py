#!/usr/bin/env python3
"""Paired in-process A/B for fuzzy_entity_match's corpus-pass structure
(VERDICT r7 "next round" item 6: re-test subtree pinning post-hoist).

The shipped array-verify path reads each side of the corpus twice — once
for the signature/banding subtree and once for the verify's gram-array
attach — and each read re-derives the clean/dirty entity corpus from the
part scan. r5 measured pinning as neutral, but that measurement predates
the round-7 split-hoist (which cut the per-row cost the duplicated passes
pay). Arms (value identity asserted at sf0.01 before timing):

- ship      : current fuzzy_entity_match shape (minhash_lsh_incremental,
              n=1, max_bucket=256, verify="array").
- corpuspin : clean/dirty localCheckpoint'd before the operator — the
              part-scan + entity-derivation subtree runs once per side
              instead of twice (feeds both the signature and gram pass).
- gramshare : the distinct-gram ARRAY computed once per side and
              localCheckpoint'd; the signature subtree explodes it and
              the verify joins it — one tokenize+distinct pass per side
              instead of two (the strongest structural form; costs a
              corpus-sized materialization).

Usage: [AB_SF_DIR=...] python3 tools/ab_fuzzy_pin.py [n_reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

import bench  # noqa: E402
from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.queries.dedup_queries import (  # noqa: E402
    _fuzzy_entity_corpus,
)
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
THRESHOLD, N, MAX_BUCKET = 0.6, 1, 256


def _links(matched):
    return matched.select(
        F.col("doc_new").alias("dirty_id"),
        F.col("doc_hist").alias("part_id"),
        "jaccard",
    )


def ship(clean, dirty):
    return _links(
        D.minhash_lsh_incremental(
            clean, dirty, threshold=THRESHOLD, n=N, max_bucket=MAX_BUCKET, verify="array"
        )
    )


def corpuspin(clean, dirty):
    return _links(
        D.minhash_lsh_incremental(
            clean.localCheckpoint(),
            dirty.localCheckpoint(),
            threshold=THRESHOLD,
            n=N,
            max_bucket=MAX_BUCKET,
            verify="array",
        )
    )


def gramshare(clean, dirty):
    """Re-implementation of the operator's array-verify + max_bucket path
    with ONE pinned gram-array table per side feeding both the signature
    explode and the verify joins. Mirrors operators/dedup.py
    minhash_lsh_incremental line-for-line apart from the shared gram
    source; the equivalence assert below is the guard against drift."""
    par = clean.sparkSession.sparkContext.defaultParallelism

    def gram_table(df):
        df = D._normalize_id(df, "doc_id")
        return (
            df.repartition(par, F.col("doc_id"))
            .select(F.col("doc_id"), F.split(F.col("text"), " ").alias("__toks"))
            .select(
                "doc_id", D._gram_array_of(F.col("__toks"), N).alias("g")
            )
            .localCheckpoint()
        )
    g_hist, g_new = gram_table(clean), gram_table(dirty)
    sh_hist = g_hist.select("doc_id", F.explode("g").alias("shingle"))
    sh_new = g_new.select("doc_id", F.explode("g").alias("shingle"))
    bh = D.minhash_band_buckets(D.minhash_signatures(sh_hist))
    bn = D.minhash_band_buckets(D.minhash_signatures(sh_new))
    w = Window.partitionBy("band", "bucket")
    n_salt = F.greatest(
        F.lit(1), F.ceil(F.col("bsz") / F.lit(D._SALT_BLOCK)).cast("int")
    )
    bh = (
        bh.withColumn("bsz", F.count("*").over(w))
        .filter(F.col("bsz") <= MAX_BUCKET)
        .withColumn("n_salt", n_salt)
        .drop("bsz")
    )
    bh = D._pin_spill(bh)
    hot = bh.filter(F.col("n_salt") > 1).select("band", "bucket", "n_salt").distinct()
    bh = bh.withColumn(
        "salt", F.pmod(F.xxhash64("doc_id"), F.col("n_salt")).cast("int")
    ).drop("n_salt")
    bn = (
        bn.withColumn("bsz", F.count("*").over(w))
        .filter(F.col("bsz") <= MAX_BUCKET)
        .drop("bsz")
        .join(F.broadcast(hot), ["band", "bucket"], "left")
        .withColumn(
            "salt",
            F.explode(F.sequence(F.lit(0), F.coalesce(F.col("n_salt"), F.lit(1)) - 1)),
        )
        .drop("n_salt")
    )
    join_cond = (
        (F.col("n.band") == F.col("h.band"))
        & (F.col("n.bucket") == F.col("h.bucket"))
        & (F.col("n.salt") == F.col("h.salt"))
    )
    candidates = (
        bn.alias("n")
        .join(bh.alias("h"), join_cond)
        .select(F.col("n.doc_id").alias("doc_a"), F.col("h.doc_id").alias("doc_b"))
        .distinct()
    )
    ga = g_new.select(F.col("doc_id").alias("doc_a"), F.col("g").alias("g_a"))
    gb = g_hist.select(F.col("doc_id").alias("doc_b"), F.col("g").alias("g_b"))
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
        .filter(F.col("jaccard") >= THRESHOLD)
        .select(
            F.col("doc_a").alias("dirty_id"),
            F.col("doc_b").alias("part_id"),
            "jaccard",
        )
    )


ARMS = {"ship": ship, "corpuspin": corpuspin, "gramshare": gramshare}


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    jiff = bench._cpu_jiffies()
    spark = get_spark("ab-fuzzy-pin")
    spark.sparkContext.setLogLevel("ERROR")

    c01, d01 = _fuzzy_entity_corpus(spark, "/root/testdata/sf0.01")
    ref = None
    for arm, fn in ARMS.items():
        rows = sorted(map(tuple, fn(c01, d01).collect()))
        if ref is None:
            ref = rows
        assert rows == ref, f"MISMATCH: arm {arm} differs at sf0.01"
        spark.catalog.clearCache()
    print(f"equivalence ok: {len(ref)} identical links at sf0.01 across 3 arms")

    clean, dirty = _fuzzy_entity_corpus(spark, SF_DIR)
    for fn in ARMS.values():  # warm plans/codegen once per arm
        fn(clean, dirty).count()
        spark.catalog.clearCache()
    out = {k: [] for k in ARMS}
    for i in range(n_reps):
        for arm, fn in ARMS.items():
            spark.sparkContext.setJobDescription(f"ab-fuzzy:{arm}:{i}")
            t0 = time.perf_counter()
            fn(clean, dirty).count()
            out[arm].append(time.perf_counter() - t0)
            spark.catalog.clearCache()  # release _pin_spill blocks per rep
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"fuzzy_entity_match {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    print(f"# steal_pct over run: {bench._steal_pct(jiff)}")
    spark.stop()


if __name__ == "__main__":
    main()
