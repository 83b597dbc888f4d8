"""Every declared gate must be NON-VACUOUS: a query whose oracle returns
zero rows at every SF is green by definition (both engines agree on
empty) and therefore verifies nothing. A sweep found three such gates in
session 8 (orders dated 1995-2001 vs events in 2024-01 made any
backward as-of structurally empty; EXCEPT all-error-users was always
empty); this test makes the property permanent.

DuckDB-only — runs all ~300 oracles in seconds, no Spark session.
Oracles are the ground truth here: if the oracle is non-empty and the
driver compare is green, the Spark side is non-empty too.
"""

from __future__ import annotations

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Gates whose sf0.001 emptiness is legitimate (tiny-SF sparsity, not a
# structural vacuity). Every entry must still be non-empty at sf0.01 —
# asserted separately below.
EMPTY_OK_AT_SF0001: set[str] = {
    # 10 suppliers at sf0.001 → the two specific trade nations have none
    "tpch_q7_volume_shipping",
    # 15 users / sparse purchase stream → no click→purchase pair lands
    # inside the attribution watermark window at sf0.001
    "stream_stream_attribution",
}


# Columns legitimately all-NULL at sf0.001 (left-outer no-match sparsity);
# each must carry values at sf0.01 — asserted in the fill-in test.
ALLNULL_OK_AT_SF0001: dict[str, set[str]] = {
    "stream_stream_left_outer": {"purchase_id"},
}


@pytest.fixture(scope="module")
def oracles():
    import __spark_entry__ as e

    return e.oracle_sql()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return c


def test_no_vacuous_gates(con, oracles):
    empty = []
    for name, sql in oracles.items():
        if name in EMPTY_OK_AT_SF0001:
            continue
        if not con.sql(sql).fetchall():
            empty.append(name)
    assert not empty, f"vacuous (0-row) oracles at {SF_DIR}: {empty}"


def test_no_all_null_output_columns(con, oracles):
    """The second degeneracy class: a gate can be non-empty yet carry a
    column that is 100% NULL (pit_feature_join's features were, before
    the era projection) — green because both engines agree on nothing.
    Every output column of every non-empty oracle must have at least one
    non-null value at this SF."""
    bad = {}
    for name, sql in oracles.items():
        rel = con.sql(sql)
        rows = rel.fetchall()
        if not rows:
            continue
        ok = ALLNULL_OK_AT_SF0001.get(name, set())
        for j, col in enumerate(rel.columns):
            if col not in ok and all(r[j] is None for r in rows):
                bad.setdefault(name, []).append(col)
    assert not bad, f"all-NULL output columns: {bad}"


def test_allowlisted_gates_fill_in_at_sf001(oracles):
    if not EMPTY_OK_AT_SF0001:
        return
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            "CREATE VIEW {t} AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.01/{t}.parquet')".format(t=t)
        )
    still_empty = [
        n for n in sorted(EMPTY_OK_AT_SF0001) if not c.sql(oracles[n]).fetchall()
    ]
    assert not still_empty, f"allowlisted gates empty even at sf0.01: {still_empty}"


def test_allowlisted_columns_fill_in_at_sf001(oracles):
    c = duckdb.connect()
    for t in TABLES:
        c.sql(
            "CREATE VIEW {t} AS SELECT * FROM "
            "read_parquet('/root/testdata/sf0.01/{t}.parquet')".format(t=t)
        )
    still_null = {}
    for name, cols in ALLNULL_OK_AT_SF0001.items():
        rel = c.sql(oracles[name])
        rows = rel.fetchall()
        idx = {col: j for j, col in enumerate(rel.columns)}
        for col in sorted(cols):
            if all(r[idx[col]] is None for r in rows):
                still_null.setdefault(name, []).append(col)
    assert not still_null, f"allowlisted columns null even at sf0.01: {still_null}"
