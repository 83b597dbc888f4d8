"""Negative controls for the oracle harness itself: compare() must FAIL
when values, types, columns, or row counts diverge — a comparator that
never fires makes every green gate vacuous. Each control corrupts one
axis and asserts the harness reports it."""

from __future__ import annotations

import pyspark.sql.functions as F

from tests.oracle_harness import compare, duck_con

SF_DIR = "/root/testdata/sf0.001"


def _con():
    return duck_con(SF_DIR)


def test_value_corruption_is_detected(spark):
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    ok = compare(df, con, "SELECT r_regionkey, r_name FROM region", "ctl")
    assert not ok
    bad = compare(
        df.withColumn("r_regionkey", F.col("r_regionkey") + 1),
        con,
        "SELECT r_regionkey, r_name FROM region",
        "ctl",
    )
    assert bad and any("row" in p for p in bad)


def test_type_mismatch_is_detected(spark):
    """BIGINT vs DOUBLE of the same numeric value must flag — the
    driver hashes raw typed values."""
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/region.parquet").select(
        F.col("r_regionkey").cast("double").alias("r_regionkey"), "r_name"
    )
    bad = compare(df, con, "SELECT r_regionkey, r_name FROM region", "ctl")
    assert bad and any("type" in p for p in bad)


def test_column_and_count_divergence_detected(spark):
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/region.parquet")
    bad_cols = compare(
        df.withColumnRenamed("r_name", "region_name"),
        con,
        "SELECT r_regionkey, r_name FROM region",
        "ctl",
    )
    assert bad_cols and "columns differ" in bad_cols[0]
    bad_rows = compare(
        df.limit(3), con, "SELECT r_regionkey, r_name FROM region", "ctl"
    )
    assert bad_rows and "rowcount" in bad_rows[0]


def test_row_order_is_irrelevant(spark):
    """The compare sorts canonically — a repartitioned (arbitrary-order)
    result must still pass. This is the property every gate relies on."""
    con = _con()
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet").repartition(7)
    ok = compare(
        df.select("c_custkey", "c_name"),
        con,
        "SELECT c_custkey, c_name FROM customer",
        "ctl",
    )
    assert not ok


def test_duck_mem_auto_size_budget(monkeypatch):
    """The auto-sized DuckDB budget must follow min(0.5*RAM/shards, 60GB)
    with a 1GB floor, so a default-knob multi-shard sweep can never
    over-commit the host (the round-5 OOM class)."""
    from tests.oracle_harness import _auto_duck_mem_gb

    monkeypatch.delenv("SPARK_GRAFT_DUCK_SHARDS", raising=False)
    one = _auto_duck_mem_gb()
    assert 1 <= one <= 60

    monkeypatch.setenv("SPARK_GRAFT_DUCK_SHARDS", "8")
    sharded = _auto_duck_mem_gb()
    assert 1 <= sharded <= one
    # with >= 16 GB of host RAM, 8 shards must get a strictly smaller
    # slice than 1 shard unless both hit the floor/cap
    if one not in (1, 60):
        assert sharded < one

    monkeypatch.setenv("SPARK_GRAFT_DUCK_SHARDS", "100000")
    assert _auto_duck_mem_gb() == 1  # floor


def test_duck_con_sets_memory_limit_and_cleans_spill(monkeypatch, tmp_path):
    """duck_con must always run with a bounded memory_limit (env override
    wins; auto-size otherwise) and register its per-PID spill dir for
    removal at exit."""
    import os

    from tests.oracle_harness import duck_con

    monkeypatch.setenv("SPARK_GRAFT_DUCK_MEM", "2GB")
    con = duck_con("/root/testdata/sf0.001")
    lim = con.sql(
        "SELECT value FROM duckdb_settings() WHERE name='memory_limit'"
    ).fetchone()[0]
    assert lim in ("2.0 GiB", "1.8 GiB", "2GB", "1.9 GiB"), lim
    tmp = con.sql(
        "SELECT value FROM duckdb_settings() WHERE name='temp_directory'"
    ).fetchone()[0]
    assert tmp == f"/tmp/duck_spill_{os.getpid()}"
    con.close()

    monkeypatch.delenv("SPARK_GRAFT_DUCK_MEM", raising=False)
    con2 = duck_con("/root/testdata/sf0.001")
    lim2 = con2.sql(
        "SELECT value FROM duckdb_settings() WHERE name='memory_limit'"
    ).fetchone()[0]
    assert lim2 != "", "auto-size must set a limit when the env is unset"
    con2.close()


def test_closure_budget_guard_arithmetic(capsys):
    """The replica's closure-budget guard must pass for diameters inside
    the pointer-jumping budget and raise a NAMED error (not an opaque
    hash mismatch) when the observed diameter proxy exceeds it."""
    import pytest as _pytest

    from cdc_agents_data_stream_spark.operators.dedup import connected_components
    from cdc_agents_data_stream_spark.queries.dedup_queries import _LP_ROUNDS
    from tests.driver_replica import _check_closure_budget

    had = hasattr(connected_components, "last_rounds")
    prev = getattr(connected_components, "last_rounds", None)
    try:
        # typical near-dup clusters converge in a handful of rounds
        connected_components.last_rounds = 8
        _check_closure_budget("dedup_components")
        assert "budget _LP_ROUNDS" in capsys.readouterr().out

        # a chain past ~2^_LP_ROUNDS must fail loudly with the knob named
        connected_components.last_rounds = 2 ** (_LP_ROUNDS + 1)
        with _pytest.raises(AssertionError, match="_LP_ROUNDS"):
            _check_closure_budget("dedup_components")
    finally:
        if had:
            connected_components.last_rounds = prev
        elif hasattr(connected_components, "last_rounds"):
            del connected_components.last_rounds


def test_dead_pid_spill_dirs_are_swept(tmp_path):
    """A SIGKILLed shard never runs atexit, so its /tmp/duck_spill_<pid>
    orphan must be reclaimed by the NEXT harness start — but a dir owned
    by a live process (including our own) must be left alone."""
    import os
    import subprocess

    from tests.oracle_harness import _sweep_dead_spill_dirs

    # dead owner: spawn-and-reap a child so the PID is provably dead
    child = subprocess.Popen(["true"])
    child.wait()
    dead = tmp_path / f"duck_spill_{child.pid}"
    dead.mkdir()
    (dead / "orphan.tmp").write_bytes(b"x" * 64)

    live = tmp_path / f"duck_spill_{os.getpid()}"
    live.mkdir()
    not_a_pid = tmp_path / "duck_spill_runid-abc"
    not_a_pid.mkdir()

    _sweep_dead_spill_dirs(str(tmp_path))

    assert not dead.exists(), "dead-PID orphan must be reclaimed"
    assert live.exists(), "live-PID dir must never be touched"
    assert not_a_pid.exists(), "non-PID suffixes are not ours to delete"


def test_closure_rounds_reset_at_entry(spark):
    """connected_components must clear its last_rounds diagnostic at
    ENTRY so a short-circuiting caller can never read a stale diameter
    proxy from a previous graph (ADVICE r6)."""
    from cdc_agents_data_stream_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["doc_a", "doc_b"])
    connected_components(pairs)
    assert connected_components.last_rounds is not None

    # poison, then fail fast inside the operator: the stale value must
    # already be gone even though no new value was recorded
    connected_components.last_rounds = 99
    import pytest as _pytest

    with _pytest.raises(Exception):
        connected_components(pairs, max_iters=0)
    assert connected_components.last_rounds is None


def test_duck_shards_typo_falls_back_to_one(monkeypatch, capsys):
    """A non-integer SPARK_GRAFT_DUCK_SHARDS must degrade to the
    single-shard memory budget with a warning, not crash every oracle
    query in the shard (ADVICE r6)."""
    from tests.oracle_harness import _auto_duck_mem_gb

    monkeypatch.setenv("SPARK_GRAFT_DUCK_SHARDS", "six")
    bad = _auto_duck_mem_gb()
    assert "SPARK_GRAFT_DUCK_SHARDS" in capsys.readouterr().err

    monkeypatch.setenv("SPARK_GRAFT_DUCK_SHARDS", "1")
    assert bad == _auto_duck_mem_gb()
