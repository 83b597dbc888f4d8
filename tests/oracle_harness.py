"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs each declared query in Spark and its oracle SQL in DuckDB over the
same parquet tables, then compares: row count, column-name set, and
name-sorted/row-sorted values. Exact equality is required (parity rules in
queries/base.py are designed for it); floats compare with a tiny absolute
epsilon only to absorb engine-level summation-order noise we cannot
control — report it if it triggers.

Float tolerance is absolute AND relative: the absolute 1e-9 absorbs
summation-order noise near zero, and the 1e-12 relative term absorbs the
final decimal→double CONVERSION divergence — Spark (BigDecimal.doubleValue)
converts correctly rounded, DuckDB's int128·10^-s path can land 1 ulp away,
and one ulp at revenue magnitudes (~1e8) is ~1.5e-8, over the absolute
epsilon. First observed at the sf1-derivative sweep on tpch_q7 (identical
exact decimal sums, doubles 1 ulp apart); a pure-absolute epsilon can never
hold across magnitudes for that artifact. 1e-12 is still ~4 orders of
magnitude stricter than any real aggregation error.
"""

from __future__ import annotations

import atexit
import math
import os
import shutil
import sys

import duckdb

from cdc_agents_data_stream_spark.schemas import TABLE_NAMES

FLOAT_EPS = 1e-9
FLOAT_REL = 1e-12

# Hard ceiling on the auto-sized oracle budget. DuckDB's own default is 80%
# of host RAM *per process*; the round-5 sf1 sweep showed that default both
# OOM-kills concurrent shards (33 GB RSS each) and, once a limit IS set,
# can spill ~78 GB of disk on the fuzzy-join oracle if the limit is far
# below the join's working set. 60 GB was the measured green budget for
# the heaviest oracle (fuzzy_entity_match at sf1) on this 128 GB host.
_DUCK_MEM_CAP_GB = 60


def _auto_duck_mem_gb() -> int:
    """Pick a safe default DuckDB memory budget from host RAM and shard count.

    Default = min(0.5 * host_RAM / shards, 60 GB), floor 1 GB. The 0.5
    factor leaves headroom for the Spark JVM(s) sharing the host; the
    shard divisor (SPARK_GRAFT_DUCK_SHARDS, set by tools/sweep_shards.py)
    splits the budget across concurrent replica processes so the HOST
    never over-commits — the exact class of failure that OOM-killed a
    round-5 sf1 shard under DuckDB's 80%-of-RAM-per-process default.
    """
    try:
        shards = max(1, int(os.environ.get("SPARK_GRAFT_DUCK_SHARDS", "1")))
    except ValueError:
        # A typo'd knob must degrade to the single-shard budget, not crash
        # every oracle query in the shard.
        print("[oracle] bad SPARK_GRAFT_DUCK_SHARDS; assuming 1", file=sys.stderr)
        shards = 1
    try:
        page = os.sysconf("SC_PAGE_SIZE")
        pages = os.sysconf("SC_PHYS_PAGES")
        ram_gb = page * pages / (1 << 30)
    except (ValueError, OSError):
        ram_gb = 16.0  # conservative fallback when sysconf is unavailable
    return max(1, min(_DUCK_MEM_CAP_GB, int(ram_gb * 0.5 / shards)))


def _sweep_dead_spill_dirs(tmp: str = "/tmp") -> None:
    """Remove /tmp/duck_spill_<pid> dirs whose owning process is gone.

    atexit cleanup never runs for a SIGKILLed (OOM-killed) shard, and the
    next run has a new PID, so orphaned spill dirs — tens of GB for the
    heavy sf1 oracles — would otherwise accumulate forever. A dir whose
    PID is still alive belongs to a concurrently running shard and is
    left strictly alone (deleting it would abort that shard's DuckDB).
    """
    try:
        entries = os.listdir(tmp)
    except OSError:
        return
    for name in entries:
        if not name.startswith("duck_spill_"):
            continue
        suffix = name[len("duck_spill_"):]
        if not suffix.isdigit():
            continue
        pid = int(suffix)
        if pid == os.getpid():
            continue
        try:
            os.kill(pid, 0)  # signal 0: existence probe, sends nothing
            continue  # alive — a live shard owns this dir
        except ProcessLookupError:
            pass  # dead — orphan, safe to reclaim
        except PermissionError:
            continue  # alive under another uid
        shutil.rmtree(os.path.join(tmp, name), ignore_errors=True)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    # DuckDB grabs every core by default; when several replica shards run
    # side by side (tools/sweep_shards.py) that thrashes the host — honor
    # an opt-in thread cap. Unset = DuckDB's default, the driver behavior.
    threads = os.environ.get("SPARK_GRAFT_DUCK_THREADS")
    if threads:
        con.execute(f"SET threads = {int(threads)}")
    # DuckDB's default memory_limit is 80% of host RAM PER PROCESS; a
    # multi-shard sweep with heavy oracles (the sf1 fuzzy/dedup SQL) can
    # therefore drive the HOST out of memory — a shard was OOM-killed at
    # 33 GB RSS during the round-5 sf1 sweep. Auto-size a safe budget by
    # default (host RAM / shard count, capped); SPARK_GRAFT_DUCK_MEM
    # overrides. DuckDB spills to temp past the limit instead of dying.
    mem = os.environ.get("SPARK_GRAFT_DUCK_MEM")
    if not mem:
        mem = f"{_auto_duck_mem_gb()}GB"
        print(f"[oracle] duckdb memory_limit auto-sized to {mem} "
              f"(override: SPARK_GRAFT_DUCK_MEM)")
    con.execute(f"SET memory_limit = '{mem}'")
    # per-PROCESS spill dir: concurrent shards sharing one directory
    # delete each other's temp files on query cleanup, which aborts
    # the other shard's DuckDB with an unrecoverable C++ IOException.
    # atexit covers clean exits only — a SIGKILLed (OOM-killed) shard
    # never runs atexit and its PID won't recur, so ALSO sweep any
    # /tmp/duck_spill_<pid> whose owning process is dead before
    # creating ours; that reclaims orphans from killed shards.
    _sweep_dead_spill_dirs()
    spill = f"/tmp/duck_spill_{os.getpid()}"
    con.execute(f"SET temp_directory = '{spill}'")
    atexit.register(shutil.rmtree, spill, ignore_errors=True)
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, float):
        # 12 significant digits (after the 9-decimal absolute round) so
        # the row-sort key is stable across a 1-ulp conversion divergence
        # at any magnitude — mirrors the rel/abs compare below.
        return ("f", float(f"{round(v, 9):.12g}"))
    if isinstance(v, int):
        return ("i", int(v))
    try:  # Decimal
        from decimal import Decimal

        if isinstance(v, Decimal):
            return ("f", float(f"{round(float(v), 9):.12g}"))
    except ImportError:
        pass
    return v


def compare(spark_df, con, oracle_sql: str, name: str) -> list[str]:
    problems: list[str] = []
    s_rows = spark_df.collect()
    s_cols = sorted(spark_df.columns)
    d = con.sql(oracle_sql)
    d_cols_raw = list(d.columns)
    d_rows = d.fetchall()
    d_cols = sorted(d_cols_raw)

    if s_cols != d_cols:
        problems.append(f"{name}: columns differ spark={s_cols} duck={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(f"{name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
        return problems

    def key(vals):
        return tuple(repr(_norm(v)) for v in vals)

    s_sorted = sorted([tuple(r[c] for c in s_cols) for r in s_rows], key=key)
    idx = {c: d_cols_raw.index(c) for c in d_cols}
    d_sorted = sorted([tuple(r[idx[c]] for c in d_cols) for r in d_rows], key=key)

    for i, (sr, dr) in enumerate(zip(s_sorted, d_sorted)):
        for c, sv, dv in zip(d_cols, sr, dr):
            ns, nd = _norm(sv), _norm(dv)
            # Type-strict: an int on one side vs a float on the other is a
            # mismatch — the driver's value hash is computed on raw typed
            # values, so BIGINT vs DOUBLE hash-differs even when equal.
            if isinstance(ns, tuple) and isinstance(nd, tuple) and ns[0] != nd[0]:
                problems.append(f"{name}: row {i} col {c}: type spark={sv!r} duck={dv!r}")
                if len(problems) > 5:
                    return problems
            elif isinstance(ns, tuple) and isinstance(nd, tuple) and ns[0] == "f" and nd[0] == "f":
                if not math.isclose(ns[1], nd[1], rel_tol=FLOAT_REL, abs_tol=FLOAT_EPS):
                    problems.append(f"{name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
                    if len(problems) > 5:
                        return problems
            elif ns != nd:
                problems.append(f"{name}: row {i} col {c}: spark={sv!r} duck={dv!r}")
                if len(problems) > 5:
                    return problems
    return problems
