#!/usr/bin/env python3
"""Long-run state-store soak: per-op flatness over TIME, not just scale.

tools/scaling_store.py proves one MERGE costs O(touched-bucket bytes) at
session decades; this proves the property HOLDS ACROSS A LONG SESSION —
the failure modes it hunts are cumulative, invisible to per-op decades:

- version/manifest debris escaping vacuum (disk creep),
- manifest dictionaries growing per commit (latency creep),
- JVM/session degradation across thousands of write jobs.

Protocol: seed an R-resident store at the 100 TB bucket configuration
(n_buckets = R/1000 so bucket bytes stay bounded — scaling_store's
``store_upsert_scaledb`` shape), then run N consecutive 64-session
micro-batch MERGEs in ONE session (each upsert vacuums on commit, the
store's deployment behavior). Every SAMPLE_EVERY batches, record MERGE
latency, live-manifest count, and store disk bytes.

Pass criteria (asserted, non-zero exit on failure):
- live manifests <= KEEP_VERSIONS at every sample point,
- disk FLAT in steady state: KEEP_VERSIONS retains up to 3 versions of
  every touched bucket, so the bounded steady state is a small multiple
  of the post-seed baseline, reached within the first SAMPLE_EVERY
  batches; from there to the end growth must stay under DISK_CREEP_MAX
  (creep past the retention window = vacuum debris),
- latency flat: median of the last decile <= LAT_CREEP_MAX x median of
  the first decile (medians so host-noise spikes don't fail the run).

Run: python tools/soak_store.py [N_BATCHES] [RESIDENT] [out.md]
Defaults: 2000 batches, 200k resident. Writes /tmp/SOAK_store.md; rows
merged into SCALING.md's store section by hand with the run date.
Measure on a QUIET host — the latency gate is a real gate.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BATCH = 64
SAMPLE_EVERY = 100
DISK_CREEP_MAX = 1.5
LAT_CREEP_MAX = 1.5


def _du(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _manifest_count(path: str) -> int:
    return sum(1 for n in os.listdir(path) if n.startswith("_manifest_v"))


def main() -> int:
    n_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    resident = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else "/tmp/SOAK_store.md"

    from cdc_agents_data_stream_spark.session import get_spark
    from cdc_agents_data_stream_spark.state.store import ParquetStateStore
    from tools.scaling_store import _load_df, _state_df

    spark = get_spark("store-soak")
    base = tempfile.mkdtemp(prefix="soak_store_")
    store = ParquetStateStore(spark, os.path.join(base, "state"),
                              n_buckets=max(8, resident // 1000))
    t0 = time.monotonic()
    store.upsert(_load_df(spark, resident))
    seed_s = time.monotonic() - t0
    disk_baseline = _du(store.path)
    print(f"seeded {resident} sessions in {seed_s:.1f}s, "
          f"baseline {disk_baseline / 1e6:.1f} MB, "
          f"n_buckets={store.n_buckets}", flush=True)

    lat: list[float] = []
    samples: list[dict] = []
    failures: list[str] = []
    for i in range(n_batches):
        # deterministic rolling key window: every batch hits real existing
        # sessions, the window walks the whole store over the run
        ids = [(i * 17 + j * 131) % resident for j in range(BATCH)]
        t0 = time.monotonic()
        store.upsert(_state_df(spark, ids))
        lat.append(time.monotonic() - t0)
        if (i + 1) % SAMPLE_EVERY == 0:
            m = _manifest_count(store.path)
            d = _du(store.path)
            samples.append({
                "batch": i + 1,
                "median_lat_s": round(statistics.median(lat[-SAMPLE_EVERY:]), 3),
                "manifests": m,
                "disk_mb": round(d / 1e6, 1),
                "load": open("/proc/loadavg").read().split()[0],
            })
            print(json.dumps(samples[-1]), flush=True)
            if m > ParquetStateStore.KEEP_VERSIONS:
                failures.append(
                    f"batch {i + 1}: {m} manifests > KEEP_VERSIONS"
                )

    dec = max(1, len(lat) // 10)
    first_med = statistics.median(lat[:dec])
    last_med = statistics.median(lat[-dec:])
    disk_end = _du(store.path)
    if last_med > LAT_CREEP_MAX * first_med:
        failures.append(
            f"latency creep: first-decile median {first_med:.3f}s -> "
            f"last-decile {last_med:.3f}s (> {LAT_CREEP_MAX}x)"
        )
    disk_steady = samples[0]["disk_mb"] if samples else disk_end / 1e6
    if disk_end / 1e6 > DISK_CREEP_MAX * disk_steady:
        failures.append(
            f"disk creep past steady state: {disk_steady:.1f} MB at "
            f"batch {SAMPLE_EVERY} -> {disk_end / 1e6:.1f} MB at end "
            f"(> {DISK_CREEP_MAX}x)"
        )

    with open(out_path, "w") as fh:
        fh.write(
            f"# Store soak: {n_batches} consecutive MERGEs, "
            f"{resident} resident, n_buckets={store.n_buckets}\n\n"
            f"first-decile median {first_med:.3f}s | last-decile median "
            f"{last_med:.3f}s | disk {disk_baseline / 1e6:.1f} -> "
            f"{disk_end / 1e6:.1f} MB | result "
            f"{'FAIL' if failures else 'PASS'}\n\n"
            "| batch | median lat s | manifests | disk MB | load |\n"
            "|---|---|---|---|---|\n"
        )
        for s in samples:
            fh.write(
                f"| {s['batch']} | {s['median_lat_s']} | {s['manifests']} "
                f"| {s['disk_mb']} | {s['load']} |\n"
            )
        for f in failures:
            fh.write(f"\nFAIL: {f}\n")
    print(f"wrote {out_path}; "
          f"{'FAIL: ' + '; '.join(failures) if failures else 'PASS'}",
          flush=True)
    shutil.rmtree(base, ignore_errors=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
