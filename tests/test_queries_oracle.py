"""Every declared query must match its DuckDB oracle (the driver's t2 gate),
at sf0.001 in CI for speed; set ORACLE_SF_DIR to run a bigger SF."""

from __future__ import annotations

import os

import pytest

from cdc_agents_data_stream_spark.queries.registry import all_queries
from tests.oracle_harness import compare, duck_con

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.001")

_REGISTRY = all_queries()


@pytest.fixture(scope="module")
def con():
    c = duck_con(SF_DIR)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_REGISTRY))
def test_query_matches_oracle(spark, con, name):
    q = _REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check (driver's weak gate)
        return
    problems = compare(df, con, q.oracle, name)
    assert not problems, "\n".join(problems)


def test_registry_names_unique_across_modules():
    """all_queries() merges per-module QUERIES dicts — a duplicated name
    would silently shadow an earlier gate and its oracle. Assert every
    module's names are disjoint so a collision fails loudly here instead."""
    import importlib

    from cdc_agents_data_stream_spark.queries import registry as reg

    seen: dict[str, str] = {}
    mods = ["relational"] + [
        "dedup_queries", "text_queries", "similarity_queries",
        "multimodal_queries", "message_queries", "kernel_queries",
        "source_queries", "asof_queries", "window_queries",
        "sampling_queries", "streaming_queries", "sql_queries",
        "sketch_queries", "ml_queries", "zorder_queries",
        "format_queries", "quality_queries", "feature_queries",
        "graph_queries", "tpch_queries",
    ]
    for m in mods:
        mod = importlib.import_module(f"cdc_agents_data_stream_spark.queries.{m}")
        for name in mod.QUERIES:
            assert name not in seen, f"{name} defined in both {seen[name]} and {m}"
            seen[name] = m
    assert len(reg.all_queries()) == len(seen)


def test_driver_window_names_all_resolve():
    """all_queries() silently drops DRIVER_WINDOW names that no module
    defines — a typo there would quietly evict a curated gate from the
    driver's 50-entry CORRECTNESS window. Fail loudly instead."""
    from cdc_agents_data_stream_spark.queries.registry import DRIVER_WINDOW

    missing = [n for n in DRIVER_WINDOW if n not in _REGISTRY]
    assert not missing, f"DRIVER_WINDOW names not in registry: {missing}"
    assert list(_REGISTRY)[: len(DRIVER_WINDOW)] == list(DRIVER_WINDOW)
