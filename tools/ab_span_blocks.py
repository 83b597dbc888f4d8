#!/usr/bin/env python3
"""Paired in-process A/B for OPTIMIZATION_r07 "not yet optimized" item 3:
two-level (doc, pos-block) span merging in dup_spans.

BEFORE (shipped): gaps-and-islands in ONE window partitioned by doc —
a corpus dominated by one huge heavily-duplicated doc serializes the
whole merge into a single task (the straggler class the LSH salt fix
addressed for buckets).

AFTER (candidate): positions first merge within fixed-size pos blocks
(Window over (doc, pos DIV B) — parallel across blocks), collapsing to
per-block islands; a second per-doc window merges adjacent islands
(gap <= k). Islands are separated by gaps > k by construction, so the
per-doc pass sees <= maxpos/(k+2) rows — a guaranteed >= 10x task-input
reduction at k=8, and ~runs-sized input for contiguous duplication.
Span partition of marks is identical (transitive adjacency merge), so
the output is bit-identical.

Measures sf0.1 / AB_SF_DIR plus a synthetic pathological corpus: 4 docs
x 400k tokens of a repeated sentence (every position duplicated).

Run: python tools/ab_span_blocks.py [n_rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("AB_SF_DIR", "/root/testdata/sf0.1")
BLOCK = 4096


def dup_spans_blocked(df, text_col="text", id_col="doc_id", k=D.SPAN_K):
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    df = df.select(F.col(id_col), F.split(F.col(text_col), " ").alias("__toks"))
    toks = F.col("__toks")
    grams = df.select(
        F.col(id_col),
        F.explode(
            F.when(
                F.size(toks) >= k,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (k - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(F.concat_ws(" ", F.slice(toks, i, k))).alias("g"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
        ).alias("x"),
    ).select(F.col(id_col), F.col("x.pos").alias("pos"), F.col("x.g").alias("g"))
    dupg = grams.groupBy("g").agg(F.count("*").alias("cnt")).filter(F.col("cnt") > 1)
    marks = (
        grams.join(dupg.select("g"), "g", "left_semi")
        .select(id_col, "pos")
        .distinct()
        .withColumn("blk", ((F.col("pos") - 1) / BLOCK).cast("int"))
    )
    wb = Window.partitionBy(id_col, "blk").orderBy("pos")
    cumb = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = (
        marks.withColumn(
            "brk",
            F.when(F.col("pos") - F.lag("pos").over(wb) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("isl", F.sum("brk").over(cumb))
        .groupBy(id_col, "blk", "isl")
        .agg(
            F.min("pos").alias("s"),
            F.max("pos").alias("e"),
            F.count("*").alias("c"),
        )
    )
    wi = Window.partitionBy(id_col).orderBy("s")
    cumi = wi.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spans = (
        islands.withColumn(
            "brk",
            F.when(F.col("s") - F.lag("e").over(wi) <= k, F.lit(0)).otherwise(
                F.lit(1)
            ),
        )
        .withColumn("span_id", F.sum("brk").over(cumi))
        .groupBy(id_col, "span_id")
        .agg(
            F.min("s").alias("start_pos"),
            (F.max("e") + (k - 1)).alias("end_pos"),
            F.sum("c").alias("n_dup_grams"),
        )
    )
    return spans.select(
        F.col(id_col),
        F.col("start_pos").cast("long"),
        F.col("end_pos").cast("long"),
        (F.col("end_pos") - F.col("start_pos") + 1).cast("long").alias("span_tokens"),
        F.col("n_dup_grams").cast("long"),
    )


def patho_corpus(spark, n_docs=4, n_tokens=400_000):
    """n_docs docs, each a single sentence repeated — every position's
    8-gram duplicates across repeats, so marks ~= positions and the
    shipped form merges each doc's spans in ONE task."""
    sent = "the quick brown fox jumps over the lazy dog again"  # 10 tokens
    reps = n_tokens // 10
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ", F.transform(F.sequence(F.lit(1), F.lit(reps)), lambda _: F.lit(sent))
        ).alias("text"),
    )


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-span-blocks")
    spark.sparkContext.setLogLevel("ERROR")

    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    key = lambda r: (r[0], r[1])  # noqa: E731
    rows_b = sorted(map(tuple, D.dup_spans(docs01).collect()), key=key)
    rows_a = sorted(map(tuple, dup_spans_blocked(docs01).collect()), key=key)
    assert rows_a == rows_b, f"MISMATCH: {len(rows_a)} vs {len(rows_b)} rows"
    print(f"equivalence ok at sf0.01: {len(rows_a)} identical spans")
    patho_small = patho_corpus(spark, n_docs=2, n_tokens=5_000)
    rows_b = sorted(map(tuple, D.dup_spans(patho_small).collect()), key=key)
    rows_a = sorted(map(tuple, dup_spans_blocked(patho_small).collect()), key=key)
    assert rows_a == rows_b, f"PATHO MISMATCH: {rows_a} vs {rows_b}"
    print(f"equivalence ok on the block-straddling pathological corpus: {rows_a}")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    patho = patho_corpus(spark)
    arms = {
        "corpus/before": lambda: D.dup_spans(docs).count(),
        "corpus/after": lambda: dup_spans_blocked(docs).count(),
        "patho/before": lambda: D.dup_spans(patho).count(),
        "patho/after": lambda: dup_spans_blocked(patho).count(),
    }
    for fn in arms.values():  # warm both plans
        fn()
    out = {k: [] for k in arms}
    for i in range(n):
        for arm, fn in arms.items():
            spark.sparkContext.setJobDescription(f"ab-span:{arm}:{i}")
            t0 = time.perf_counter()
            fn()
            out[arm].append(time.perf_counter() - t0)
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"dedup_span_detect {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
