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
