#!/usr/bin/env python3
"""Paired in-process A/B for the round-7 training_prep_pipeline fusion:
BEFORE = quality_score(kept) self-joined back onto a second derivation of
kept on doc_id (4 corpus scans + a doc_id exchange), AFTER = one fused
projection (2 scans, no join). Asserts identical rows at sf0.01 first."""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.operators import textops as T  # noqa: E402
from cdc_agents_data_stream_spark.queries.text_queries import (  # noqa: E402
    training_prep_pipeline,
)
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = __import__("os").environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


def before_fn(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keepers = D.exact_dup_groups(docs).select(F.col("keeper_doc_id").alias("doc_id"))
    kept = docs.join(keepers, "doc_id", "left_semi")
    q = T.quality_score(kept)
    stop_set = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    toks = F.split(F.col("text"), " ")
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_set, t)))
    enriched = q.join(
        kept.select("doc_id", "lang", stop_cnt.cast("long").alias("stop_cnt")), "doc_id"
    )
    return (
        enriched.filter(F.col("quality_ok") == 1)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("token_cnt").cast("bigint").alias("total_tokens"),
            F.sum("stop_cnt").cast("bigint").alias("total_stopwords"),
            F.round(F.sum("stop_cnt") / F.sum("token_cnt"), 6).alias("stopword_ratio"),
        )
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-training-prep")
    spark.sparkContext.setLogLevel("ERROR")
    rows_b = sorted(map(tuple, before_fn(spark, "/root/testdata/sf0.01").collect()))
    rows_a = sorted(
        map(tuple, training_prep_pipeline(spark, "/root/testdata/sf0.01").collect())
    )
    assert rows_a == rows_b, f"MISMATCH:\n{rows_a}\nvs\n{rows_b}"
    print(f"equivalence ok: {len(rows_a)} identical rows at sf0.01")

    arms = {
        "before": lambda: before_fn(spark, SF_DIR).count(),
        "after": lambda: training_prep_pipeline(spark, SF_DIR).count(),
    }
    for fn in arms.values():
        fn()
    out = {k: [] for k in arms}
    for i in range(n):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab-tpp:{arm}:{i}")
            t0 = time.perf_counter()
            fn()
            out[arm].append(time.perf_counter() - t0)
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"training_prep_pipeline {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
