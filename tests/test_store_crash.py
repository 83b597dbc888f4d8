"""Crash-recovery property test for the state store's commit protocol.

A writer process is SIGKILLed at randomized filesystem-operation points
inside a driver-side MERGE (``upsert_rows`` — manifest write, link
claim, pointer advance, parquet data write all happen in-process with
no Spark). After each kill the store must satisfy:

1. every manifest on disk parses as complete JSON (the link-claim makes
   a torn claim impossible by construction);
2. a reader sees a consistent committed version — the pre-kill snapshot,
   or the dead writer's commit iff its claim completed;
3. a fresh writer commits cleanly: a claim the dead writer never
   advanced the pointer for is ROLLED FORWARD, not deadlocked on
   (pre-round-4 this raised CommitTimeout after 30 s and the claimed
   version was permanently wedged);
4. no committed row is ever lost.

Reference semantics being protected: the reference's JPA saveAndFlush
runs inside Postgres transactions (repository/
CdcAgentsDataStreamRepository.java:16-29) — a killed writer there can't
wedge the table either; this is the lake-layout equivalent.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys

import pyarrow.parquet as pq
import pytest

from cdc_agents_data_stream_spark.state.store import ParquetStateStore

# The kill script counts open/link/replace/fsync calls and SIGKILLs
# itself when the counter reaches the requested operation index — so the
# kill lands mid-manifest-write, between claim and pointer advance,
# mid-parquet-write, etc., depending on the index.
KILL_SCRIPT = r"""
import builtins, os, signal, sys
sys.path.insert(0, {repo!r})
path, kill_after = sys.argv[1], int(sys.argv[2])
count = {{"n": 0}}
def arm(mod, name):
    real = getattr(mod, name)
    def wrapped(*a, **k):
        count["n"] += 1
        if 0 < kill_after <= count["n"]:
            os.kill(os.getpid(), signal.SIGKILL)
        return real(*a, **k)
    setattr(mod, name, wrapped)
for fn in ("link", "replace", "fsync"):
    arm(os, fn)
arm(builtins, "open")
from cdc_agents_data_stream_spark.state.store import ParquetStateStore
store = ParquetStateStore(None, path)
store.upsert_rows([{{"session_id": "s-crash", "sequence_number": 7}}])
print("COMPLETED", count["n"])
"""

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _store(path: str) -> ParquetStateStore:
    s = ParquetStateStore(None, path)  # driver-side paths never touch spark
    return s


def _all_rows(store: ParquetStateStore) -> dict[str, int]:
    v = store.current_version()
    if v == 0:
        return {}
    rows: dict[str, int] = {}
    for rel in store._manifest(v).values():
        if rel:
            for r in pq.read_table(os.path.join(store.path, rel)).to_pylist():
                rows[r["session_id"]] = r["sequence_number"]
    return rows


def _assert_manifests_complete(path: str) -> None:
    for name in os.listdir(path):
        if name.startswith("_manifest_v") and name.endswith(".json"):
            with open(os.path.join(path, name)) as fh:
                doc = json.load(fh)  # raises on a torn file
            assert set(doc) == {"version", "buckets", "dir_schemas"}


def _run_killed_writer(path: str, kill_after: int) -> bool:
    """Returns True when the writer completed (kill point past the end)."""
    proc = subprocess.run(
        [sys.executable, "-c", KILL_SCRIPT.format(repo=REPO), path, str(kill_after)],
        capture_output=True,
        text=True,
        timeout=120,
    )
    if proc.returncode == 0:
        assert "COMPLETED" in proc.stdout
        return True
    assert proc.returncode == -signal.SIGKILL, proc.stderr
    return False


@pytest.mark.parametrize("kill_after", list(range(1, 21)))
def test_sigkill_mid_commit_never_corrupts_or_wedges(tmp_path, kill_after):
    path = str(tmp_path / "store")
    seed = _store(path)
    seed.upsert_rows([{"session_id": "s-seed", "sequence_number": 1}])
    assert seed.current_version() == 1
    seed_manifest = seed._manifest(1)

    completed = _run_killed_writer(path, kill_after)

    post = _store(path)
    _assert_manifests_complete(path)
    v = post.current_version()
    if completed:
        assert v == 2
    else:
        assert v in (1, 2)
    if v == 1:
        # reader sees the prior committed snapshot, bit-identical manifest
        assert post._manifest(1) == seed_manifest
        assert _all_rows(post) == {"s-seed": 1}

    # a fresh writer must commit cleanly — rolling forward a dead
    # writer's claimed-but-unpointed version instead of timing out
    post.upsert_rows([{"session_id": "s-recover", "sequence_number": 2}])
    final = _all_rows(post)
    assert final["s-seed"] == 1
    assert final["s-recover"] == 2
    crash_claimed = os.path.exists(post._manifest_file(2)) and v >= 2
    if crash_claimed and "s-crash" in final:
        assert final["s-crash"] == 7
    _assert_manifests_complete(path)
    assert post.current_version() > v


def test_roll_forward_of_claimed_unpointed_version(tmp_path):
    """Surgical torn state (claim exists, pointer lags): the next writer
    adopts the orphan commit rather than raising CommitTimeout."""
    path = str(tmp_path / "store")
    s = _store(path)
    s.upsert_rows([{"session_id": "a", "sequence_number": 1}])
    # fabricate the dead-winner state: claim v2 manually, leave pointer at 1
    man = dict(s._manifest(1))
    with open(s._manifest_file(2), "w") as fh:
        json.dump({"version": 2, "buckets": man}, fh)
    assert s.current_version() == 1

    s.COMMIT_WAIT_SECONDS = 5.0  # a regression would fail fast, not in 30 s
    s.upsert_rows([{"session_id": "b", "sequence_number": 2}])
    assert s.current_version() == 3  # rolled v2 forward, committed v3
    rows = _all_rows(s)
    assert rows == {"a": 1, "b": 2}
