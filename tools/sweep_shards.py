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

--skip-file FILE: queries (one per line) excluded entirely.
--solo-file FILE: queries excluded from the round-robin shards and run
  SEQUENTIALLY in one process after the parallel shards finish, with
  SPARK_GRAFT_DUCK_SHARDS=1 so each gets the FULL auto-sized DuckDB
  budget — the workflow for oracle-heavy queries (the sf1 fuzzy trio
  spills ~47 GB under a 60 GB budget; six concurrent shards would both
  divide the budget 6x and overlap their spills on disk).
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
    solo: list[str] = []
    if "--skip-file" in argv:
        i = argv.index("--skip-file")
        skip = set(open(argv[i + 1]).read().split())
        argv = argv[:i] + argv[i + 2 :]
    if "--solo-file" in argv:
        i = argv.index("--solo-file")
        solo = [q for q in open(argv[i + 1]).read().split() if q not in skip]
        argv = argv[:i] + argv[i + 2 :]
    args = [a for a in argv if a != "--run"]
    run = "--run" in argv
    sf_dir = args[0] if args else "/tmp/spark-graft-sf1"
    n = int(args[1]) if len(args) > 1 else 3
    mem = args[2] if len(args) > 2 else "8g"
    shards = shard_lists(n, skip | set(solo))
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
    def _verdict(lines: list[str]) -> str:
        # the replica's "N/M green; failed: [...]" line can be followed by
        # shutdown log noise — prefer it over the literal last line
        for ln in reversed(lines):
            if "green; failed" in ln:
                return ln
        return lines[-1] if lines else ""

    rc = 0
    for i, log, p in procs:
        p.wait()
        with open(log) as fh:
            lines = fh.read().strip().splitlines()
        print(f"shard {i} rc={p.returncode}: {_verdict(lines)}")
        # plain OR mangles negative (signal-kill) codes into misleading
        # merged values; any nonzero shard makes the sweep fail with 1
        rc = rc or (1 if p.returncode != 0 else 0)
    if solo:
        cmd = [sys.executable, "tests/driver_replica.py", sf_dir, *solo]
        if not run:
            print(" ".join(cmd) + "  # solo pass, full oracle budget")
            return rc
        log = "/tmp/sweep_solo.log"
        env = dict(
            os.environ,
            SPARK_GRAFT_REPLICA_MEM=mem,
            SPARK_GRAFT_DUCK_SHARDS="1",
        )
        print(f"solo pass: {len(solo)} queries -> {log}")
        with open(log, "w") as fh:
            p = subprocess.Popen(cmd, stdout=fh, stderr=subprocess.STDOUT, env=env)
        p.wait()
        with open(log) as fh:
            lines = fh.read().strip().splitlines()
        print(f"solo rc={p.returncode}: {_verdict(lines)}")
        rc = rc or (1 if p.returncode != 0 else 0)
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
