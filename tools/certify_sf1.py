#!/usr/bin/env python3
"""One-command sf1 re-certification — the per-round routine, encoded.

Does what rounds 5 and 6 assembled by hand:

1. Builds the sf1 derivative with tools/make_sfx.py if the target dir is
   missing (10 key-shifted distribution-preserving copies of sf0.1).
2. Runs the full catalog through tools/sweep_shards.py with
   SPARK_GRAFT_SCALE_ORACLES=1 (the pointer-jumping closure oracles) and
   the oracle-heavy queries listed in tools/sf1_solo.txt routed to the
   sequential solo pass, where each gets the FULL auto-sized DuckDB
   budget instead of a 1/N shard slice (round-6 measurement: the eight
   solo queries' oracles need pinned memory beyond a 10 GB slice at sf1;
   everything else is green inside the slice).

Defaults match the 128 GB / 32-core build host; override per run:

    python tools/certify_sf1.py [SF_DIR] [N_SHARDS] [heap]

Exit status 0 only when every query in the catalog is green.
"""

from __future__ import annotations

import os
import subprocess
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def derivative_complete(sf_dir: str) -> bool:
    """True only for a FULLY built derivative dir: a bare isdir() would
    accept a torso left by an interrupted make_sfx.py run, so require
    BOTH the completion marker (make_sfx writes it last) and every
    table's parquet."""
    from cdc_agents_data_stream_spark.schemas import TABLE_NAMES

    return os.path.isfile(os.path.join(sf_dir, "_COMPLETE")) and all(
        os.path.isfile(os.path.join(sf_dir, f"{t}.parquet")) for t in TABLE_NAMES
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark-graft-sf1"
    n_shards = sys.argv[2] if len(sys.argv) > 2 else "6"
    heap = sys.argv[3] if len(sys.argv) > 3 else "6g"

    complete = derivative_complete(sf_dir)
    if os.path.isdir(sf_dir) and not complete:
        print(f"[certify] {sf_dir} exists but is incomplete — rebuilding")
    if not complete:
        print(f"[certify] building derivative {sf_dir} from sf0.1 ...")
        rc = subprocess.call(
            [
                sys.executable,
                os.path.join(REPO, "tools", "make_sfx.py"),
                "/root/testdata/sf0.1",
                sf_dir,
                "10",
            ]
        )
        if rc != 0:
            print(f"[certify] derivative build failed rc={rc}")
            return rc

    env = dict(os.environ, SPARK_GRAFT_SCALE_ORACLES="1")
    cmd = [
        sys.executable,
        os.path.join(REPO, "tools", "sweep_shards.py"),
        sf_dir,
        n_shards,
        heap,
        "--run",
        "--solo-file",
        os.path.join(REPO, "tools", "sf1_solo.txt"),
    ]
    print("[certify]", " ".join(cmd))
    rc = subprocess.call(cmd, env=env)
    print(f"[certify] {'GREEN' if rc == 0 else 'FAILED'} (rc={rc})")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
