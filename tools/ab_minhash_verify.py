#!/usr/bin/env python3
"""Paired in-process A/B for the minhash_lsh_pairs verify stage.

Arms (all value-identical, asserted at sf0.01 before timing):

- r7        : round-7 shipped shape — sizes aggregated from the candidate
              shingle sliver and joined twice (sliver consumed 4x),
              sliver localCheckpoint'd (1 corpus scan in the verify).
- szcarry   : round-8 shipped shape — per-doc set size computed as a free
              33rd aggregate in minhash_signatures and carried through the
              band self-join onto the candidate rows (sliver consumed 2x),
              sliver still localCheckpoint'd.
- nockpt    : szcarry minus the sliver localCheckpoint — the two
              intersection-side consumers re-derive the semi-joined scan
              as parallel twin subtrees (the simhash lesson: on an idle
              local[N] twins can beat a checkpoint barrier).

Usage: [AB_SF_DIR=...] python3 tools/ab_minhash_verify.py [n_reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = __import__("os").environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def r7_pairs(df, threshold=0.5, n=3):
    """Round-7 shipped shape: no size-carry, sliver checkpointed."""
    df, id_col = D._normalize_id(df, "doc_id"), "doc_id"
    sh = D.shingles(df, "text", n, id_col)
    buckets = D.minhash_band_buckets(D.minhash_signatures(sh))
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint()
    )
    cand_docs = candidates.select(
        F.explode(F.array("doc_a", "doc_b")).alias(id_col)
    ).distinct()
    sh_cand = D.shingles(
        df.join(cand_docs, id_col, "left_semi"), "text", n, id_col
    ).localCheckpoint()
    return D._pair_jaccard(sh_cand, candidates).filter(F.col("jaccard") >= threshold)


def szcarry_pairs(df, threshold=0.5, n=3, ckpt=True):
    """Round-8 size-carry shape; ``ckpt`` toggles the sliver checkpoint."""
    df, id_col = D._normalize_id(df, "doc_id"), "doc_id"
    sh = D.shingles(df, "text", n, id_col)
    buckets = D.minhash_band_buckets(D.minhash_signatures(sh, with_size=True))
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sz").alias("sz_a"),
            F.col("b.sz").alias("sz_b"),
        )
        .distinct()
        .localCheckpoint()
    )
    cand_docs = candidates.select(
        F.explode(F.array("doc_a", "doc_b")).alias(id_col)
    ).distinct()
    sh_cand = D.shingles(df.join(cand_docs, id_col, "left_semi"), "text", n, id_col)
    if ckpt:
        sh_cand = sh_cand.localCheckpoint()
    return D._pair_jaccard(sh_cand, candidates).filter(F.col("jaccard") >= threshold)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    jiff = bench._cpu_jiffies()
    spark = get_spark("ab-minhash-verify")
    spark.sparkContext.setLogLevel("ERROR")
    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows_r7 = sorted(map(tuple, r7_pairs(docs01).collect()))
    rows_sz = sorted(map(tuple, szcarry_pairs(docs01).collect()))
    rows_nc = sorted(map(tuple, szcarry_pairs(docs01, ckpt=False).collect()))
    rows_ship = sorted(map(tuple, D.minhash_lsh_pairs(docs01, threshold=0.5).collect()))
    assert rows_r7 == rows_sz == rows_nc == rows_ship, "MISMATCH between arms"
    print(f"equivalence ok: {len(rows_r7)} identical pairs at sf0.01 across 4 arms")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    arms = {
        "r7": lambda: r7_pairs(docs).count(),
        "szcarry": lambda: szcarry_pairs(docs).count(),
        "nockpt": lambda: szcarry_pairs(docs, ckpt=False).count(),
    }
    for fn in arms.values():  # warm all plans
        fn()
    out = {k: [] for k in arms}
    for i in range(n):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab-minhash:{arm}:{i}")
            t0 = time.perf_counter()
            fn()
            out[arm].append(time.perf_counter() - t0)
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"dedup_minhash_lsh {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    print(f"# steal_pct over run: {bench._steal_pct(jiff)}")
    spark.stop()


if __name__ == "__main__":
    main()
