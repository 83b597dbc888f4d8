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
