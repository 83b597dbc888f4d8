"""Unit coverage for the sweep sharding logic (tools/sweep_shards.py):
the shard lists must exactly partition the registry (disjoint cover, no
duplicates) with skip/solo sets removed — a bug here silently drops
queries from the sf1 certification sweep, which would read as green
while certifying less than the full catalog."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.sweep_shards import shard_lists


def test_shards_partition_the_registry_exactly():
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    names = list(all_queries())
    for n in (1, 3, 6):
        shards = shard_lists(n)
        flat = [q for s in shards for q in s]
        assert len(shards) == n
        assert sorted(flat) == sorted(names)  # disjoint cover, no dupes


def test_shards_respect_skip_set():
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    names = list(all_queries())
    skip = set(names[:5]) | {names[-1]}
    shards = shard_lists(4, skip)
    flat = [q for s in shards for q in s]
    assert sorted(flat) == sorted(set(names) - skip)
    assert not (set(flat) & skip)


def test_sf1_solo_file_names_real_queries():
    """Every query routed to the solo pass must exist in the registry —
    a typo here would silently shrink the certified catalog."""
    from cdc_agents_data_stream_spark.queries.registry import all_queries

    solo_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "sf1_solo.txt",
    )
    solo = set(open(solo_path).read().split())
    assert solo, "solo file is empty"
    missing = solo - set(all_queries())
    assert not missing, f"solo file names unknown queries: {sorted(missing)}"


def test_bench_host_stamp_and_compare_output(tmp_path, capsys):
    """The bench line carries a host-state stamp (load, cpus, median/min
    spread) so a drifted artifact is adjudicable as code-vs-load without
    re-running (VERDICT r6 #3), and bench_compare prints both sides'
    stamps — including a readable fallback for pre-r7 artifacts."""
    import json

    from bench import _loadavg
    from tools.bench_compare import main as compare_main

    load = _loadavg()
    assert isinstance(load, float) and load >= 0.0  # /proc exists here

    old = {
        "metric": "bench_total", "value": 10.0, "unit": "sec",
        "stat": "median_of_3", "queries": {"a": 5.0, "b": 5.0},
        "min_total": 9.5, "sf": 0.1,
    }
    new = dict(old)
    new["host"] = {"load_start": 1.2, "load_end": 3.4, "cpus": 32, "spread": 1.05}
    po, pn = tmp_path / "o.json", tmp_path / "n.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    compare_main(str(po), str(pn))
    out = capsys.readouterr().out
    assert "host[old]: (no host stamp" in out
    assert "host[new]: load 1.2 -> 3.4 on 32 cpus" in out
    assert "spread 1.05" in out


def test_certify_derivative_completeness_gate(tmp_path):
    """tools/certify_sf1.py must not trust a torso dir from an
    interrupted make_sfx.py run: all table parquets AND the _COMPLETE
    marker (written last by make_sfx) are required (ADVICE r6)."""
    from cdc_agents_data_stream_spark.schemas import TABLE_NAMES
    from tools.certify_sf1 import derivative_complete

    d = tmp_path / "sfX"
    assert not derivative_complete(str(d))  # missing dir

    d.mkdir()
    (d / "region.parquet").touch()
    assert not derivative_complete(str(d))  # torso

    for t in TABLE_NAMES:
        (d / f"{t}.parquet").touch()
    assert not derivative_complete(str(d))  # files but no marker

    (d / "_COMPLETE").touch()
    assert derivative_complete(str(d))


def test_bench_compare_pre_r5_stat_label(tmp_path, capsys):
    """A pre-round-5 artifact (metric present, no stat key) must be
    labeled as an ASSUMED min stat, and an unrecognized shape must read
    'unknown' — key presence alone must never mint a confident 'min'
    label, because the label drives the STAT MISMATCH notice (ADVICE
    r6)."""
    from tools.bench_compare import _q

    q = {"a": 1.0}
    pre_r5 = {"metric": "bench_total", "queries": q}
    label = _q(pre_r5)[1]
    assert label.startswith("min") and "assumed" in label

    alien = {"metric": "something_else", "queries": q}
    assert _q(alien)[1] == "unknown"

    modern = {"metric": "bench_total", "stat": "median_of_3", "queries": q}
    assert _q(modern)[1] == "median"
