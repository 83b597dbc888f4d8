#!/usr/bin/env python3
"""Long-document gram-kernel microbench: the committed, reproducible form
of the round-7 change-#7 evidence (OPTIMIZATION_r07.md "Hoist tokenization
out of higher-order lambdas").

Why this exists: indexed higher-order lambdas execute interpreted
(CodegenFallback) and re-evaluate their closure per element, so a
positional-gram transform whose lambda slices an INLINE ``split(text)``
re-tokenizes the document once per output gram — O(tokens²) per document.
The shipped kernels bind the token array as its own projection
(``split(text) AS __toks``) first — O(tokens) per document. The sf0.1
corpus (~10²-token docs) cannot show the difference; this tool builds a
deterministic synthetic corpus at two doc lengths and times both forms of
the exact dup_spans positional-gram kernel, so the curve is reproducible
on any checkout.

Usage:
    python3 tools/longdoc_bench.py [n_reps]

Prints one JSON line:
    {"metric": "longdoc_gram_kernel", "k": ..., "shapes": {...},
     "arms": {"<len>": {"hoisted": {...}, "inline": {...}}}, "host": {...}}

Corpus is built with deterministic expressions (xxhash64 of doc_id and
position — no rand(), guide §2.5), equal token mass per shape:
  - 8192 docs × 128 tokens  (the sf0.1-like shape)
  - 512 docs × 2048 tokens  (the long-doc shape the hoist targets)
Timed action is a noop-sink write of the exploded (pos, md5-gram) stream
(guide §1.4 — computes every column, no collect). Value identity between
arms is asserted per shape (count + gram-digest checksum) before timing.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

import bench  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

K = 8  # SPAN_K-like gram width
VOCAB = 1000
SHAPES = [(8192, 128), (512, 2048)]  # (n_docs, tokens_per_doc)


def corpus(spark, n_docs: int, doc_len: int):
    """Deterministic synthetic corpus: token t of doc d is
    w<xxhash64(d*1000003 + t) % VOCAB> — seeded by position, no rand()."""
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(1), F.lit(doc_len)),
                    lambda i: F.concat(
                        F.lit("w"),
                        F.pmod(
                            F.xxhash64(F.col("id") * 1000003 + i.cast("long")),
                            F.lit(VOCAB),
                        ).cast("string"),
                    ),
                ),
            ).alias("text"),
        )
    )


def gram_stream(df, inline: bool):
    """The dup_spans positional-gram kernel, in its two historical forms.

    inline=False (shipped): token array bound as its own projection, the
    lambda slices the bound column — O(tokens) per doc.
    inline=True (pre-round-7): the lambda slices split(text) directly —
    the interpreted HOF path re-runs split per gram, O(tokens²) per doc.
    """
    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.repartition(par, F.col("doc_id"))
    if inline:
        toks = F.split(F.col("text"), " ")
        src = df
    else:
        src = df.select(F.col("doc_id"), F.split(F.col("text"), " ").alias("__toks"))
        toks = F.col("__toks")
    return src.select(
        F.col("doc_id"),
        F.explode(
            F.when(
                F.size(toks) >= K,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (K - 1)),
                    lambda i: F.struct(
                        i.alias("pos"),
                        F.md5(F.concat_ws(" ", F.slice(toks, i, K))).alias("g"),
                    ),
                ),
            ).otherwise(F.array().cast("array<struct<pos:int,g:string>>"))
        ).alias("x"),
    ).select(F.col("doc_id"), F.col("x.pos").alias("pos"), F.col("x.g").alias("g"))


def checksum(df):
    r = df.agg(
        F.count("*").alias("n"),
        F.sum(F.crc32(F.col("g")) + F.col("pos")).alias("chk"),
    ).collect()[0]
    return int(r["n"]), int(r["chk"])


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    n_reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    jiff = bench._cpu_jiffies()
    load0 = bench._loadavg()
    spark = get_spark("longdoc-gram-kernel")
    spark.sparkContext.setLogLevel("ERROR")

    out: dict[str, dict] = {}
    for n_docs, doc_len in SHAPES:
        df = corpus(spark, n_docs, doc_len).localCheckpoint()  # pin inputs so
        # both arms read identical materialized rows, not the generator
        assert checksum(gram_stream(df, False)) == checksum(gram_stream(df, True)), (
            f"arm mismatch at {n_docs}x{doc_len}"
        )
        shape: dict[str, dict] = {}
        for arm, inline in (("hoisted", False), ("inline", True)):
            g = gram_stream(df, inline)
            noop(g)  # warm codegen/plan
            xs = []
            for i in range(n_reps):
                spark.sparkContext.setJobDescription(
                    f"longdoc:{n_docs}x{doc_len}:{arm}:{i}"
                )
                t0 = time.perf_counter()
                noop(g)
                xs.append(time.perf_counter() - t0)
            shape[arm] = {
                "min": round(min(xs), 3),
                "median": round(statistics.median(xs), 3),
                "samples": [round(x, 3) for x in xs],
            }
        out[f"{n_docs}x{doc_len}"] = shape

    print(
        json.dumps(
            {
                "metric": "longdoc_gram_kernel",
                "k": K,
                "reps": n_reps,
                "arms": out,
                "host": {
                    "load_start": load0,
                    "load_end": bench._loadavg(),
                    "steal_pct": bench._steal_pct(jiff),
                },
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
