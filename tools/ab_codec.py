#!/usr/bin/env python3
"""Shuffle-codec sweep (OPTIMIZATION_r07 "not yet optimized" item 4):
time the shuffle-heaviest bench queries under a given
spark.io.compression.codec. The codec is a core conf fixed at JVM start,
so run this tool once per codec and compare:

    python tools/ab_codec.py lz4  [sf_dir] [n]
    python tools/ab_codec.py zstd [sf_dir] [n]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

QUERIES = [
    "dedup_minhash_lsh",
    "fuzzy_entity_match",
    "dedup_simhash",
    "bpe_train_merges",
    "tpch_q3",
]


def main() -> None:
    codec = sys.argv[1] if len(sys.argv) > 1 else "lz4"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/spark-graft-sf1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    import os

    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")
    # the codec must be set before the JVM starts: route it through the
    # engine's own session factory via the default-conf env hook below
    os.environ["SPARK_GRAFT_IO_CODEC"] = codec
    from cdc_agents_data_stream_spark.queries.registry import all_queries
    from cdc_agents_data_stream_spark.session import get_spark

    spark = get_spark(f"ab-codec-{codec}")
    assert spark.conf.get("spark.io.compression.codec") == codec, (
        "codec conf did not take; stop any existing session first"
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in QUERIES:  # warm plans at sf0.001
        qs[name].fn(spark, "/root/testdata/sf0.001").count()
        spark.catalog.clearCache()
    for name in QUERIES:
        samples = []
        for i in range(n):
            spark.sparkContext.setJobDescription(f"codec:{codec}:{name}:{i}")
            t0 = time.perf_counter()
            qs[name].fn(spark, sf_dir).count()
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
        s = sorted(samples)
        print(
            f"{name} codec={codec}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
