"""The scale-oracle variants (pigeonhole-blocked pair generation) must
be RESULT-IDENTICAL to the brute-force gate oracles — the blocking is
lossless for hamming <= 3 on a 32-bit simhash split into 4 disjoint
8-bit blocks (any qualifying pair agrees exactly on >= 1 block), and
everything downstream of the pair CTE is byte-identical SQL.

DuckDB-only (no Spark session): runs in seconds and proves the claim
at two SFs, so beyond-driver-scale sweeps may substitute the blocked
variant without weakening what a green row means.
"""

from __future__ import annotations

import pytest

from cdc_agents_data_stream_spark.queries.dedup_queries import (
    DEDUP_COMPONENTS_SQL,
    DEDUP_KEEP_CORPUS_SQL,
    DEDUP_KEEPER_BY_QUALITY_SQL,
    SCALE_ORACLES,
)
from tests.oracle_harness import duck_con

GATE_SQL = {
    "dedup_components": DEDUP_COMPONENTS_SQL,
    "dedup_keep_corpus": DEDUP_KEEP_CORPUS_SQL,
    "dedup_keeper_by_quality": DEDUP_KEEPER_BY_QUALITY_SQL,
}


def test_scale_oracles_cover_exactly_the_closure_gates():
    assert sorted(SCALE_ORACLES) == sorted(GATE_SQL)
    for name, sql in SCALE_ORACLES.items():
        assert "blk_i" in sql, name  # blocked pair generation present
        assert sql != GATE_SQL[name]


@pytest.mark.parametrize("sf_dir", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"])
@pytest.mark.parametrize("name", sorted(GATE_SQL))
def test_blocked_equals_brute_force(name, sf_dir):
    con = duck_con(sf_dir)
    brute = con.execute(GATE_SQL[name]).fetchall()
    blocked = con.execute(SCALE_ORACLES[name]).fetchall()
    assert sorted(map(tuple, blocked)) == sorted(map(tuple, brute))
