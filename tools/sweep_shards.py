#!/usr/bin/env python3
"""Shard the full-catalog replica sweep across N parallel processes.

The replica harness (tests/driver_replica.py) is single-process by
design — one vanilla local[8] session, queries in registry order. At
sf1-derivative scale the serial sweep takes hours; per-query runs are
independent (read-only parquet + per-process DuckDB), so wall-clock
divides by N with no semantic change. Queries are dealt round-robin by
registry index so each shard gets an even mix of heavy and light
shapes.

Usage: python tools/sweep_shards.py SF_DIR N_SHARDS [mem]
Prints one `python tests/driver_replica.py SF_DIR q1 q2 ...` command
per shard (run them yourself, e.g. under nohup), or with --run spawns
them and waits, merging exit status.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")


def shard_lists(n_shards: int, skip: set[str] | None = None) -> list[list[str]]:
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    names = [n for n in all_queries() if not (skip and n in skip)]
    return [names[i::n_shards] for i in range(n_shards)]


def main() -> int:
    argv = sys.argv[1:]
    skip: set[str] = set()
    if "--skip-file" in argv:
        i = argv.index("--skip-file")
        skip = set(open(argv[i + 1]).read().split())
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--run"]
    run = "--run" in argv
    sf_dir = args[0] if args else "/tmp/spark-graft-sf1"
    n = int(args[1]) if len(args) > 1 else 3
    mem = args[2] if len(args) > 2 else "8g"
    shards = shard_lists(n, skip)
    procs = []
    for i, names in enumerate(shards):
        cmd = [sys.executable, "tests/driver_replica.py", sf_dir, *names]
        if not run:
            print(" ".join(cmd))
            continue
        log = f"/tmp/sweep_shard_{i}.log"
        # SPARK_GRAFT_DUCK_SHARDS lets the oracle harness split its
        # auto-sized DuckDB budget across the concurrent shards so the
        # host never over-commits (tests/oracle_harness._auto_duck_mem_gb)
        env = dict(
            os.environ,
            SPARK_GRAFT_REPLICA_MEM=mem,
            SPARK_GRAFT_DUCK_SHARDS=str(n),
        )
        with open(log, "w") as fh:
            procs.append(
                (i, log, subprocess.Popen(cmd, stdout=fh, stderr=subprocess.STDOUT, env=env))
            )
        print(f"shard {i}: {len(names)} queries -> {log}")
    rc = 0
    for i, log, p in procs:
        p.wait()
        with open(log) as fh:
            lines = fh.read().strip().splitlines()
        tail = lines[-1] if lines else ""
        print(f"shard {i} rc={p.returncode}: {tail}")
        # plain OR mangles negative (signal-kill) codes into misleading
        # merged values; any nonzero shard makes the sweep fail with 1
        rc = rc or (1 if p.returncode != 0 else 0)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
