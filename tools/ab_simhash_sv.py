#!/usr/bin/env python3
"""Paired in-process A/B for the round-7 sv materialization in
simhash_pairs: BEFORE = localCheckpoint identity-patched away (the simhash
aggregation subtree executes once per self-join side), AFTER = current
code. Asserts identical rows at sf0.01 first."""

from __future__ import annotations

import statistics
import sys
import time
from contextlib import contextmanager

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame  # noqa: E402

from cdc_agents_data_stream_spark.operators import dedup as D  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402

SF_DIR = __import__("os").environ.get("AB_SF_DIR", "/root/testdata/sf0.1")


@contextmanager
def no_checkpoint():
    orig = DataFrame.localCheckpoint
    DataFrame.localCheckpoint = lambda self, eager=True: self
    try:
        yield
    finally:
        DataFrame.localCheckpoint = orig


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    spark = get_spark("ab-simhash-sv")
    spark.sparkContext.setLogLevel("ERROR")
    docs01 = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    with no_checkpoint():
        rows_b = sorted(map(tuple, D.simhash_pairs(docs01, max_hamming=3).collect()))
    rows_a = sorted(map(tuple, D.simhash_pairs(docs01, max_hamming=3).collect()))
    assert rows_a == rows_b, f"MISMATCH: {len(rows_a)} vs {len(rows_b)} rows"
    print(f"equivalence ok: {len(rows_a)} identical pairs at sf0.01")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

    def run_before():
        with no_checkpoint():
            return D.simhash_pairs(docs, max_hamming=3).count()

    def run_after():
        return D.simhash_pairs(docs, max_hamming=3).count()

    run_before(), run_after()  # warm both plans
    out = {"before": [], "after": []}
    for i in range(n):
        for arm, fn in (("before", run_before), ("after", run_after)):
            spark.sparkContext.setJobDescription(f"ab-simhash:{arm}:{i}")
            t0 = time.perf_counter()
            fn()
            out[arm].append(time.perf_counter() - t0)
    for arm, xs in out.items():
        s = sorted(xs)
        print(
            f"dedup_simhash {arm}: min={s[0]:.3f} "
            f"median={statistics.median(s):.3f} all={[round(x, 3) for x in s]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
