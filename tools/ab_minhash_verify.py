#!/usr/bin/env python3
"""Paired in-process A/B for the round-7 sh_cand materialization in
minhash_lsh_pairs: BEFORE = verify branch re-derives the candidate-doc
shingles per consumer (4 corpus scans), AFTER = localCheckpoint (1 scan).
Also asserts both arms return identical rows at sf0.01."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = __import__("os").environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def before_pairs(df, threshold=0.5, n=3):
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
    sh_cand = D.shingles(df.join(cand_docs, id_col, "left_semi"), "text", n, id_col)
    return D._pair_jaccard(sh_cand, candidates).filter(F.col("jaccard") >= threshold)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-minhash-verify")
    spark.sparkContext.setLogLevel("ERROR")
    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    rows_b = sorted(map(tuple, before_pairs(docs01).collect()))
    rows_a = sorted(map(tuple, D.minhash_lsh_pairs(docs01, threshold=0.5).collect()))
    assert rows_a == rows_b, f"MISMATCH: {len(rows_a)} vs {len(rows_b)} rows"
    print(f"equivalence ok: {len(rows_a)} identical pairs at sf0.01")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    arms = {
        "before": lambda: before_pairs(docs).count(),
        "after": lambda: D.minhash_lsh_pairs(docs, threshold=0.5).count(),
    }
    for fn in arms.values():  # warm both plans
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
    spark.stop()


if __name__ == "__main__":
    main()
