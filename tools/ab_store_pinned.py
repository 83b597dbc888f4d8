#!/usr/bin/env python3
"""Paired in-process A/B for the round-7 pinned-schema manifest read
(ParquetStateStore._read_parquet): BEFORE = mergeSchema footer-job read
(monkeypatched back), AFTER = pinned-schema read from the manifest's
dir_schemas. Interleaved warm runs of the two store-heavy bench metrics so
host drift hits both arms equally; prints min/median per arm."""

from __future__ import annotations

import statistics
import sys

sys.path.insert(0, "/root/repo")

from bench import bench_backfill_throughput, bench_streaming_cadence  # noqa: E402
from cdc_agents_data_stream_spark.session import get_spark  # noqa: E402
from cdc_agents_data_stream_spark.state import store as store_mod  # noqa: E402


def merge_read(self, v, paths):
    return self.spark.read.option("mergeSchema", "true").parquet(*paths)


PINNED = store_mod.ParquetStateStore._read_parquet


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    spark = get_spark("ab-store-pinned")
    spark.sparkContext.setLogLevel("ERROR")

    metrics = {
        "cdc_stream_20_ticks": lambda: bench_streaming_cadence(spark),
        "cdc_backfill_2000_sessions": lambda: bench_backfill_throughput(
            spark, n_sessions=2000
        ),
    }
    # warm both arms once (codegen, Arrow pool, file-source listing)
    bench_streaming_cadence(spark, n_ticks=2)
    bench_backfill_throughput(spark)

    out: dict[str, dict[str, list[float]]] = {
        m: {"before": [], "after": []} for m in metrics
    }
    for i in range(n):
        for arm, impl in (("before", merge_read), ("after", PINNED)):
            store_mod.ParquetStateStore._read_parquet = impl
            for name, fn in metrics.items():
                spark.sparkContext.setJobDescription(f"ab:{name}:{arm}:{i}")
                out[name][arm].append(fn())
    store_mod.ParquetStateStore._read_parquet = PINNED

    for name, arms in out.items():
        for arm in ("before", "after"):
            s = sorted(arms[arm])
            print(
                f"{name} {arm}: min={s[0]:.3f} median={statistics.median(s):.3f} "
                f"all={[round(x, 3) for x in s]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
