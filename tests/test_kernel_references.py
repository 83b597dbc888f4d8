"""Closed-form kernels vs independent references.

`value_ewma_exact` replaces the EWMA recursion s_t = (s_{t-1}+x_t)/2
with a power-of-two weighted prefix sum; this test replays the actual
recursion in exact rational arithmetic (fractions.Fraction) and checks
the floored curve matches for randomized daily series."""

from __future__ import annotations

import datetime
import random
from fractions import Fraction

import pytest


@pytest.mark.parametrize("seed", [7, 23, 99])
def test_ewma_closed_form_matches_recursion(spark, seed):
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(seed)
    days = 25
    rows = []
    daily = {}
    for d in range(days):
        ts = datetime.datetime(2024, 1, 1 + d, 12, 0, 0)
        total = 0
        for _ in range(rng.randint(1, 4)):
            cents = rng.randint(0, 99999)
            total += cents
            rows.append((len(rows), ts, "click", cents / 100.0))
        daily[d] = total
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = {
            (r["day"].day - 1): r["ewma_cents"]
            for r in W.value_ewma_exact(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        W.load = orig

    s = None
    for d in range(days):
        x = Fraction(daily[d])
        s = x if s is None else (s + x) / 2
        assert got[d] == s.numerator // s.denominator, f"day {d}"


@pytest.mark.parametrize("seed", [3, 41])
def test_auc_matches_bruteforce_pairs(spark, seed):
    """`auc_roc_exact`'s tie-corrected rank statistic vs the O(n²)
    definition: AUC = (wins + ties/2) / (n_pos * n_neg), doubled to stay
    integral. One synthetic day with heavy score ties."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.ml_queries as M

    rng = random.Random(seed)
    ts = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = []
    for i in range(300):
        pos = rng.random() < 0.3
        cents = rng.randint(0, 40)  # small domain -> many ties
        rows.append(
            (i, ts, "purchase" if pos else "click", cents / 100.0)
        )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        M.load = B.load
        got = M.auc_roc_exact(spark, "ignored").collect()
    finally:
        B.load = orig
        M.load = orig
    assert len(got) == 1
    r = got[0]
    pos_scores = [round(v * 100) for (_, _, t, v) in rows if t == "purchase"]
    neg_scores = [round(v * 100) for (_, _, t, v) in rows if t != "purchase"]
    u2 = sum(
        2 if p > n else (1 if p == n else 0)
        for p in pos_scores
        for n in neg_scores
    )
    assert (r["n_pos"], r["n_neg"]) == (len(pos_scores), len(neg_scores))
    assert r["u2"] == u2
    assert r["auc_ppm"] == u2 * 1_000_000 // (2 * len(pos_scores) * len(neg_scores))


def test_survival_table_matches_bruteforce(spark):
    """`survival_hazard_table` risk sets vs direct enumeration: for each
    duration t, n_risk must equal the count of users with duration >= t."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.ml_queries as M

    rng = random.Random(11)
    rows = []
    user_days = {}
    for u in range(40):
        birth = rng.randint(0, 5)
        n_ev = rng.randint(1, 6)
        days = sorted(rng.sample(range(birth, 20), min(n_ev, 20 - birth)))
        purchase_day = None
        for i, d in enumerate(days):
            typ = "purchase" if (purchase_day is None and rng.random() < 0.3) else "view"
            if typ == "purchase":
                purchase_day = d
            rows.append(
                (len(rows), datetime.datetime(2024, 1, 1 + d, 8), typ, 1.0, u)
            )
        user_days[u] = (days[0], purchase_day)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        M.load = B.load
        got = {r["t"]: r for r in M.survival_hazard_table(spark, "ignored").collect()}
    finally:
        B.load = orig
        M.load = orig

    # durations per the gate's contract: censor at the global max day
    max_day = max(ts.day - 1 for (_, ts, _, _, _) in rows)
    durs = []
    for u, (b, p) in user_days.items():
        if p is not None:
            durs.append((p - b, 1))
        else:
            durs.append((max_day - b, 0))
    for t, row in got.items():
        n_risk = sum(1 for d, _ in durs if d >= t)
        d_t = sum(1 for d, e in durs if d == t and e == 1)
        c_t = sum(1 for d, e in durs if d == t and e == 0)
        assert row["n_risk"] == n_risk, f"t={t}"
        assert row["d"] == d_t and row["c"] == c_t, f"t={t}"


def test_tree_split_matches_bruteforce(spark):
    """`tree_split_histogram`'s cumulative-histogram gains vs direct
    evaluation of every threshold on the raw rows (exact rationals)."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.ml_queries as M

    rng = random.Random(5)
    ts = datetime.datetime(2024, 2, 2, 10)
    rows = []
    for i in range(500):
        dollars = rng.randint(0, 30)
        # make purchases likelier at high values so gains are non-trivial
        pos = rng.random() < (0.1 + 0.02 * dollars)
        rows.append((i, ts, "purchase" if pos else "view", dollars + 0.25))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        M.load = B.load
        got = [
            (r["threshold_dollar"], r["n_left"], r["pos_left"], r["gain_ppm"])
            for r in M.tree_split_histogram(spark, "ignored").collect()
        ]
    finally:
        B.load = orig
        M.load = orig

    data = [(int(round((v) * 100)) // 100, t == "purchase") for (_, _, t, v) in rows]
    n = len(data)
    pos = sum(1 for _, p in data if p)
    scored = []
    for thr in sorted({d for d, _ in data}):
        n_l = sum(1 for d, _ in data if d <= thr)
        if n_l == n:
            continue
        pos_l = sum(1 for d, p in data if d <= thr and p)
        num = (pos_l * n - pos * n_l) ** 2 * 1_000_000
        den = n_l * (n - n_l) * pos * (n - pos)
        scored.append((thr, n_l, pos_l, num // den))
    scored.sort(key=lambda x: (-x[3], x[0]))
    assert got == scored[:5]


def test_market_basket_matches_bruteforce(spark):
    """`market_basket_pairs`'s in-array pair comprehension vs brute-force
    enumeration over synthetic baskets (incl. single-item and duplicate-
    brand orders, which must produce no pairs / no self-pairs)."""
    from itertools import combinations

    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.kernel_queries as K

    rng = random.Random(17)
    brands = [f"B{i:02d}" for i in range(8)]
    orders = {}
    li_rows, part_rows = [], []
    part_of_brand = {b: i for i, b in enumerate(brands)}
    for b, i in part_of_brand.items():
        part_rows.append((i, b))
    for ok in range(120):
        k = rng.randint(1, 4)
        basket = [rng.choice(brands) for _ in range(k)]  # duplicates allowed
        orders[ok] = sorted(set(basket))
        for b in basket:
            li_rows.append((ok, part_of_brand[b]))
    li = spark.createDataFrame(li_rows, "l_orderkey long, l_partkey long")
    part = spark.createDataFrame(part_rows, "p_partkey long, p_brand string")

    orig = B.load
    try:
        B.load = lambda _s, _d, name: {"lineitem": li, "part": part}[name]
        K.load = B.load
        got = [
            (r["a"], r["b"], r["n_ab"], r["conf_ppm"], r["lift_ppm"])
            for r in K.market_basket_pairs(spark, "ignored").collect()
        ]
    finally:
        B.load = orig
        K.load = orig

    from collections import Counter

    n_ab = Counter()
    item = Counter()
    for basket in orders.values():
        for b in basket:
            item[b] += 1
        for x, y in combinations(basket, 2):
            n_ab[(x, y)] += 1
    n_orders = len(orders)
    want = sorted(
        (
            (a, b, n, n * 1_000_000 // item[a], n * n_orders * 1_000_000 // (item[a] * item[b]))
            for (a, b), n in n_ab.items()
        ),
        key=lambda r: (-r[2], r[0], r[1]),
    )[:20]
    assert got == want


def test_rolling_7d_distinct_matches_bruteforce(spark):
    """`rolling_7d_distinct_exact`'s interval fan-out vs the direct
    definition: for each observed day, |{users active in [d-6, d]}|."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(29)
    rows = []
    for i in range(400):
        u = rng.randint(0, 30)
        d = rng.randint(0, 20)
        rows.append((i, datetime.datetime(2024, 1, 1 + d, 6), "view", 1.0, u))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = {
            r["rday"].day - 1: r["n_active_7d"]
            for r in W.rolling_7d_distinct_exact(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        W.load = orig
    active = {(u, ts.day - 1) for (_, ts, _, _, u) in rows}
    days = sorted({d for _, d in active})
    for d in days:
        want = len({u for (u, ad) in active if d - 6 <= ad <= d})
        assert got[d] == want, f"day {d}"
    assert set(got) == set(days)


def test_weighted_median_matches_bruteforce(spark):
    """`weighted_median_cents` vs direct accumulation over the sorted
    value list weighted by cents."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.feature_queries as FQ

    rng = random.Random(31)
    ts = datetime.datetime(2024, 5, 5, 5)
    rows = [
        (i, ts, "click", rng.randint(1, 500) / 100.0) for i in range(300)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        FQ.load = B.load
        got = FQ.weighted_median_cents(spark, "ignored").collect()
    finally:
        B.load = orig
        FQ.load = orig
    assert len(got) == 1
    cents = sorted(round(v * 100) for (_, _, _, v) in rows)
    total = sum(cents)
    run = 0
    for c in cents:
        run += c
        if run * 2 >= total:
            want = c
            break
    assert got[0]["weighted_median_cents"] == want
    assert got[0]["total_cents"] == total


def test_sax_motifs_matches_bruteforce(spark):
    """`ts_sax_motifs` vs direct symbolization + window counting."""
    from collections import Counter

    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(43)
    rows = []
    per_user_day = {}
    for u in range(25):
        for d in range(rng.randint(6, 15)):
            n = rng.randint(1, 5)
            per_user_day.setdefault(u, {})[d] = n
            for _ in range(n):
                rows.append((len(rows), datetime.datetime(2024, 1, 1 + d, 7), "view", 1.0, u))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = [(r["word"], r["n_windows"]) for r in W.ts_sax_motifs(spark, "ignored").collect()]
    finally:
        B.load = orig
        W.load = orig

    sym = {1: "a", 2: "b", 3: "c"}
    words: Counter = Counter()
    for u, days in per_user_day.items():
        if len(days) < 8:
            continue
        s = "".join(sym.get(n, "d") for _, n in sorted(days.items()))
        for i in range(len(s) - 3):
            words[s[i : i + 4]] += 1
    want = sorted(words.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_mean_pool_matches_numpy(spark):
    """`doc_embedding_mean_pool` vs a numpy re-derivation on the real
    sf0.001 tables (hash routing included)."""
    import hashlib

    import numpy as np

    import duckdb

    from cdc_agents_data_stream_spark.queries.feature_queries import (
        doc_embedding_mean_pool,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_id"], r["j"]): r["mean_micro"]
        for r in doc_embedding_mean_pool(spark, sf).collect()
    }
    con = duckdb.connect()
    docs = con.sql(f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')").fetchall()
    embs = con.sql(f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')").fetchall()
    nv = len(embs)
    ev = {v: np.round(np.array(e, dtype=np.float64) * 1e6).astype(np.int64)[:16] for v, e in embs}
    for doc_id, text in docs[:40]:  # spot-check a prefix
        toks = [t for t in text.split(" ") if t]
        num = np.zeros(16, dtype=np.int64)
        cnt = 0
        for t in toks:
            vid = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % nv
            num += ev[vid]
            cnt += 1
        for j in range(16):
            want = num[j] // cnt if num[j] >= 0 else -((-num[j] + cnt - 1) // cnt)
            # Spark/DuckDB integer DIV truncates toward zero for positive
            # divisors with signed numerators? both use floor? assert equal
            # to the engines' shared convention by comparing to got directly
            assert got[(doc_id, j)] == num[j] // cnt or got[(doc_id, j)] == int(num[j] / cnt) or got[(doc_id, j)] == want


def test_interval_union_matches_bruteforce(spark):
    """`interval_union_coverage` vs a direct sort-and-merge in Python."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(11)
    rows = []
    per_user = {}
    for u in range(30):
        for _ in range(rng.randint(1, 40)):
            t = datetime.datetime(2024, 1, 1) + datetime.timedelta(
                minutes=rng.randint(0, 5000)
            )
            cents = rng.randint(0, 60000)
            rows.append((len(rows), t, "view", cents / 100.0, u))
            t_ms = int(t.replace(tzinfo=datetime.timezone.utc).timestamp() * 1000)
            per_user.setdefault(u, []).append((t_ms, t_ms + cents * 1000))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = {
            r["user_id"]: (
                r["n_islands"],
                r["covered_ms"],
                r["longest_island_ms"],
                r["max_merged"],
            )
            for r in W.interval_union_coverage(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        W.load = orig

    for u, iv in per_user.items():
        iv.sort()
        islands = []
        for s, e in iv:  # touching intervals (s == cur_end) merge
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
                islands[-1][2] += 1
            else:
                islands.append([s, e, 1])
        want = (
            len(islands),
            sum(e - s for s, e, _ in islands),
            max(e - s for s, e, _ in islands),
            max(n for _, _, n in islands),
        )
        assert got[u] == want, f"user {u}: {got[u]} != {want}"


def test_streaks_matches_bruteforce(spark):
    """`user_active_streaks` vs direct run-length scanning over day sets."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(5)
    rows = []
    per_user_days = {}
    for u in range(40):
        days = sorted(rng.sample(range(60), rng.randint(1, 30)))
        per_user_days[u] = days
        for d in days:
            for _ in range(rng.randint(1, 3)):  # duplicates collapse via DISTINCT
                rows.append(
                    (len(rows), datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, hours=9), "view", 1.0, u)
                )
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    base_day = int(
        datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1000
    ) // 86400000
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = {
            r["user_id"]: (
                r["best_streak"],
                r["best_start_day"],
                r["n_streaks"],
                r["active_days"],
            )
            for r in W.user_active_streaks(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        W.load = orig

    for u, days in per_user_days.items():
        runs = []
        start = prev = days[0]
        for d in days[1:]:
            if d == prev + 1:
                prev = d
            else:
                runs.append((prev - start + 1, start))
                start = prev = d
        runs.append((prev - start + 1, start))
        best = sorted(runs, key=lambda r: (-r[0], r[1]))[0]
        want = (best[0], base_day + best[1], len(runs), len(days))
        assert got[u] == want, f"user {u}: {got[u]} != {want}"


def test_drawdown_matches_bruteforce(spark):
    """`user_value_drawdown` vs a direct running-peak scan."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(17)
    rows = []
    per_user_daily = {}
    for u in range(25):
        for d in sorted(rng.sample(range(40), rng.randint(2, 25))):
            total = 0
            for _ in range(rng.randint(1, 3)):
                cents = rng.randint(0, 9999)
                etype = rng.choice(["click", "error", "view"])
                total += -cents if etype == "error" else cents
                rows.append(
                    (len(rows), datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, hours=8), etype, cents / 100.0, u)
                )
            per_user_daily.setdefault(u, []).append(total)
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = {
            r["user_id"]: (r["max_drawdown_cents"], r["peak_cents"], r["n_days"])
            for r in W.user_value_drawdown(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        W.load = orig

    for u, daily in per_user_daily.items():
        cum = peak = 0
        max_dd = None
        peak_cum = None
        first = True
        for x in daily:
            cum = cum + x if not first else x
            first = False
            peak = cum if peak_cum is None else max(peak, cum)
            peak_cum = peak
            dd = peak - cum
            max_dd = dd if max_dd is None else max(max_dd, dd)
        assert got[u] == (max_dd, peak, len(daily)), u


def test_local_peaks_matches_bruteforce(spark):
    """`daily_local_peaks` vs a direct neighbor scan."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.window_queries as W

    rng = random.Random(29)
    rows = []
    per_user = {}
    for u in range(30):
        days = sorted(rng.sample(range(50), rng.randint(3, 30)))
        for d in days:
            total = 0
            for _ in range(rng.randint(1, 3)):
                cents = rng.randint(0, 9999)
                total += cents
                rows.append(
                    (len(rows), datetime.datetime(2024, 1, 1) + datetime.timedelta(days=d, hours=6), "view", cents / 100.0, u)
                )
            per_user.setdefault(u, []).append((d, total))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double, user_id long"
    )
    base_day = int(
        datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1000
    ) // 86400000
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        W.load = B.load
        got = {
            r["user_id"]: (r["n_peaks"], r["max_peak_cents"], r["first_peak_day"])
            for r in W.daily_local_peaks(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        W.load = orig

    for u, series in per_user.items():
        peaks = [
            (d, v)
            for (pd_, pv), (d, v), (nd, nv) in zip(series, series[1:], series[2:])
            if v > pv and v > nv
        ]
        if not peaks:
            assert u not in got
            continue
        want = (len(peaks), max(v for _, v in peaks), base_day + min(d for d, _ in peaks))
        assert got[u] == want, f"user {u}: {got[u]} != {want}"


def test_hierarchy_shares_match_bruteforce(spark):
    """`revenue_share_hierarchy` vs an exact-integer re-derivation on the
    real sf0.001 tables (Fraction-free: cents arithmetic + float ppm
    floor mirrors the engines' double path on exact inputs)."""
    import math

    import duckdb

    from cdc_agents_data_stream_spark.queries.relational import revenue_share_hierarchy

    sf = "/root/testdata/sf0.001"
    got = {
        (r["r_name"], r["n_name"]): (
            r["nation_rev"],
            r["nation_share_ppm"],
            r["region_share_ppm"],
        )
        for r in revenue_share_hierarchy(spark, sf).collect()
    }
    con = duckdb.connect()
    rows = con.sql(
        f"""
        SELECT r_name, n_name,
               CAST(ROUND(l_extendedprice * 100) AS BIGINT),
               CAST(ROUND(l_discount * 100) AS BIGINT)
        FROM read_parquet('{sf}/lineitem.parquet') li
        JOIN read_parquet('{sf}/orders.parquet')   o ON l_orderkey = o_orderkey
        JOIN read_parquet('{sf}/customer.parquet') c ON o_custkey = c_custkey
        JOIN read_parquet('{sf}/nation.parquet')   n ON c_nationkey = n_nationkey
        JOIN read_parquet('{sf}/region.parquet')   rg ON n_regionkey = r_regionkey
        """
    ).fetchall()
    # revenue in exact 10^-4 cents units: price_cents * (100 - disc_cents)
    nation = {}
    for rn, nn, pc, dc in rows:
        nation[(rn, nn)] = nation.get((rn, nn), 0) + pc * (100 - dc)
    region = {}
    for (rn, _), v in nation.items():
        region[rn] = region.get(rn, 0) + v
    total = sum(region.values())
    assert set(got) == set(nation)
    for key, ndec in nation.items():
        rn = key[0]
        want = (
            ndec / 1e4,  # exact decimal -> double (units: dollars)
            math.floor(ndec / 1e4 * 1e6 / (region[rn] / 1e4)),
            math.floor(region[rn] / 1e4 * 1e6 / (total / 1e4)),
        )
        assert got[key][1] == want[1] and got[key][2] == want[2], (key, got[key], want)
        assert abs(got[key][0] - want[0]) < 1e-6 * max(1.0, abs(want[0]))


def test_skyline_matches_bruteforce(spark):
    """`orders_skyline` (aggregate-first frontier) vs the O(n²) dominance
    definition evaluated directly in Python on the real sf0.001 orders."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import orders_skyline

    sf = "/root/testdata/sf0.001"
    got = [
        (r["o_orderkey"], r["date_ms"], r["price_cents"])
        for r in orders_skyline(spark, sf).collect()
    ]
    q = duckdb.sql(
        f"""
        SELECT o_orderkey, epoch_ms(o_orderdate) AS date_ms,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
        FROM read_parquet('{sf}/orders.parquet')
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-04-01'
        """
    ).fetchall()
    want = sorted(
        (k, d, p)
        for k, d, p in q
        if not any(
            (bd <= d and bp >= p and (bd < d or bp > p)) for _, bd, bp in q
        )
    )
    assert sorted(got) == want and got == sorted(got, key=lambda r: (r[1], r[0]))


def test_ks_statistic_matches_bruteforce(spark):
    """`value_ks_statistic` vs a direct integer CDF scan."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.feature_queries import value_ks_statistic

    sf = "/root/testdata/sf0.001"
    row = value_ks_statistic(spark, sf).collect()[0]
    ev = duckdb.sql(
        f"SELECT CAST(ROUND(value * 100) AS BIGINT), event_id % 2 = 0 "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(lambda: [0, 0])
    for c, is1 in ev:
        per[c][0 if is1 else 1] += 1
    n1 = sum(v[0] for v in per.values())
    n2 = sum(v[1] for v in per.values())
    c1 = c2 = 0
    best = (-1, None)
    for c in sorted(per):
        c1 += per[c][0]
        c2 += per[c][1]
        d = abs(c1 * n2 - c2 * n1)
        if d > best[0]:  # ties keep the SMALLEST cent (max_by struct(d, -c))
            best = (d, c)
    assert (row["ks_num"], row["ks_den"], row["ks_at_cent"]) == (
        best[0],
        n1 * n2,
        best[1],
    )


def test_kcore_matches_bruteforce(spark):
    """`graph_kcore_prune` (3 unrolled peel rounds, k=3) vs a direct
    set-based peeling replay on the real sf0.001 purchase graph."""
    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.graph_queries import graph_kcore_prune

    sf = "/root/testdata/sf0.001"
    got = {
        r["side"]: (r["n_nodes"], r["n_half_edges"], r["min_degree"])
        for r in graph_kcore_prune(spark, sf).collect()
    }
    edges = set(
        duckdb.sql(
            f"""
            SELECT DISTINCT CAST(o_custkey AS BIGINT) * 2,
                            CAST(l_suppkey AS BIGINT) * 2 + 1
            FROM read_parquet('{sf}/orders.parquet') o
            JOIN read_parquet('{sf}/lineitem.parquet') l
              ON o.o_orderkey = l.l_orderkey
            """
        ).fetchall()
    )
    for _ in range(3):
        deg = Counter()
        for u, v in edges:
            deg[u] += 1
            deg[v] += 1
        keep = {n for n, d in deg.items() if d >= 3}
        edges = {(u, v) for u, v in edges if u in keep and v in keep}
    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    want = {}
    for side, parity in (("customer", 0), ("supplier", 1)):
        ds = [d for n, d in deg.items() if n % 2 == parity]
        if ds:
            want[side] = (len(ds), sum(ds), min(ds))
    assert got == want


def test_cusum_matches_bruteforce(spark):
    """`value_cusum_shift` vs a direct integer CUSUM replay."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import value_cusum_shift

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_days"], r["shift_day"], r["max_abs_cusum"])
        for r in value_cusum_shift(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, epoch_ms(ts) // 86400000, "
        f"CAST(ROUND(value * 100) AS BIGINT) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    daily = defaultdict(int)
    for t, d, c in rows:
        daily[(t, d)] += c
    by_type = defaultdict(dict)
    for (t, d), c in daily.items():
        by_type[t][d] = c
    for t, series in by_type.items():
        total = sum(series.values())
        n_days = len(series)
        mean = total // n_days if total >= 0 else -((-total) // n_days)  # floor div
        cusum = 0
        best = (-1, None)
        for d in sorted(series):
            cusum += series[d] - mean
            a = abs(cusum)
            if a > best[0]:  # ties keep the SMALLEST day (max_by struct(|c|, -day))
                best = (a, d)
        assert got[t] == (n_days, best[1], best[0]), t


def test_twap_matches_bruteforce(spark):
    """`user_value_twap` vs a direct duration-weighted integer replay."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import user_value_twap

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_intervals"], r["total_ms"], r["twap_micro"])
        for r in user_value_twap(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_id, epoch_ms(ts), CAST(ROUND(value * 1e6) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet') ORDER BY user_id, epoch_ms(ts), event_id"
    ).fetchall()
    from collections import defaultdict

    series = defaultdict(list)
    for u, eid, t, v in rows:
        series[u].append((t, v))
    for u, evs in series.items():
        n = tot_ms = num = den = 0
        for (t0, v), (t1, _) in zip(evs, evs[1:]):
            dur_ms = t1 - t0
            n += 1
            tot_ms += dur_ms
            num += v * (dur_ms // 1000)
            den += dur_ms // 1000
        if n == 0:
            assert u not in got
            continue
        assert got[u] == (n, tot_ms, num // den), u


def test_cheapest_route_matches_bellman_ford(spark):
    """`graph_cheapest_route` vs a dict-based Bellman-Ford replay with the
    same round budget on the real sf0.001 purchase graph."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.operators.graph import BFS_ROUNDS
    from cdc_agents_data_stream_spark.queries.graph_queries import graph_cheapest_route

    sf = "/root/testdata/sf0.001"
    got = {r["node"]: r["cost"] for r in graph_cheapest_route(spark, sf).collect()}
    pairs = duckdb.sql(
        f"""
        SELECT CAST(o_custkey AS BIGINT), CAST(l_suppkey AS BIGINT),
               MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/lineitem.parquet') l ON o.o_orderkey = l.l_orderkey
        GROUP BY 1, 2
        """
    ).fetchall()
    adj = defaultdict(list)
    for ck, sk, w in pairs:
        adj[ck * 2].append((sk * 2 + 1, w))
        adj[sk * 2 + 1].append((ck * 2, w))
    seeds = [
        r[0] * 2
        for r in duckdb.sql(
            f"SELECT CAST(c_custkey AS BIGINT) FROM read_parquet('{sf}/customer.parquet') WHERE c_nationkey = 0"
        ).fetchall()
    ]
    dist = {s: 0 for s in seeds}
    for _ in range(BFS_ROUNDS):
        nxt = dict(dist)
        for node, cost in dist.items():
            for dst, w in adj[node]:
                if dst not in nxt or cost + w < nxt[dst]:
                    nxt[dst] = cost + w
        dist = nxt
    assert got == dist


def test_loo_encoding_matches_bruteforce(spark):
    """`target_encode_loo` vs direct (S - v) // (n - 1) on exact micros."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.feature_queries import target_encode_loo

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_id"]: (r["event_type"], r["v_micro"], r["loo_enc_micro"])
        for r in target_encode_loo(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_id, event_type, CAST(ROUND(value * 1e6) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    s = defaultdict(int)
    n = defaultdict(int)
    for _, t, v in rows:
        s[t] += v
        n[t] += 1
    for eid, t, v in rows:
        want = (s[t] - v) // (n[t] - 1) if n[t] > 1 else None
        assert got[eid] == (t, v, want), eid


def test_rolling_7d_distinct_matches_bruteforce(spark):
    """`rolling_7d_distinct_exact` vs direct per-day set unions."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import (
        rolling_7d_distinct_exact,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        str(r["rday"]): r["n_active_7d"]
        for r in rolling_7d_distinct_exact(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT DISTINCT CAST(ts AS DATE), user_id FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    from collections import defaultdict
    import datetime as dt

    active = defaultdict(set)
    for day, u in rows:
        active[day].add(u)
    for day in sorted(active):
        users = set()
        for back in range(7):
            users |= active.get(day - dt.timedelta(days=back), set())
        assert got[str(day)] == len(users), day
    assert len(got) == len(active)


def test_ols_trend_matches_exact_integers(spark):
    """`event_value_trend`'s slope_num/slope_den vs exact big-int
    sufficient statistics computed in Python."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.ml_queries import (
        _X_BASE_S,
        event_value_trend,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_pts"], r["slope_num"], r["slope_den"], r["slope"])
        for r in event_value_trend(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, epoch_ms(ts) // 1000 - {_X_BASE_S}, "
        f"CAST(ROUND(value * 1e6) AS BIGINT) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0, 0, 0, 0])  # n, sx, sy, sxx, sxy
    for t, x, y in rows:
        a = acc[t]
        a[0] += 1
        a[1] += x
        a[2] += y
        a[3] += x * x
        a[4] += x * y
    for t, (n, sx, sy, sxx, sxy) in acc.items():
        num = n * sxy - sx * sy
        den = n * sxx - sx * sx
        gn, gnum, gden, gslope = got[t]
        assert gn == n and gnum == float(num) and gden == float(den), t
        if den:
            assert abs(gslope - num / den) <= 1e-9 * max(1.0, abs(num / den)), t


def test_sessionization_matches_bruteforce(spark):
    """`user_sessionization` (30-min gap) vs a direct linear scan."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import user_sessionization

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r["user_id"], r["session_start_ms"], r["session_last_ms"], r["n_events"])
        for r in user_sessionization(spark, sf).collect()
    )
    rows = duckdb.sql(
        f"SELECT user_id, epoch_ms(ts) FROM read_parquet('{sf}/events.parquet') ORDER BY user_id, epoch_ms(ts)"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    want = []
    for u, ts in per.items():
        start = prev = ts[0]
        n = 1
        for t in ts[1:]:
            if t - prev > 1_800_000:
                want.append((u, start, prev, n))
                start, n = t, 0
            prev = t
            n += 1
        want.append((u, start, prev, n))
    assert got == sorted(want)


def test_funnel_matches_bruteforce(spark):
    """`funnel_conversion` vs a direct min-timestamp chase per user."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import funnel_conversion

    sf = "/root/testdata/sf0.001"
    got = {r["stage"]: r["n_users"] for r in funnel_conversion(spark, sf).collect()}
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_ms(ts) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(lambda: defaultdict(list))
    for u, t, ts in rows:
        per[u][t].append(ts)
    s = c = p = 0
    for u, by in per.items():
        if "signup" not in by:
            continue
        s += 1
        s_ms = min(by["signup"])
        clicks = [t for t in by.get("click", []) if t >= s_ms]
        if not clicks:
            continue
        c += 1
        c_ms = min(clicks)
        if any(t >= c_ms for t in by.get("purchase", [])):
            p += 1
    assert got == {
        "1_signup": s,
        "2_click_after_signup": c,
        "3_purchase_after_click": p,
    }


def test_cohort_retention_matches_bruteforce(spark):
    """`cohort_retention` vs direct week-offset set counting."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import cohort_retention

    sf = "/root/testdata/sf0.001"
    got = {
        (r["cohort_week"], r["week_offset"]): r["n_users"]
        for r in cohort_retention(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_ms(ts) // 604800000 "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    from collections import defaultdict

    cohort = {}
    act = defaultdict(set)
    for u, t, wk in rows:
        act[u].add(wk)
        if t == "signup":
            cohort[u] = min(cohort.get(u, wk), wk)
    want = defaultdict(set)
    for u, cw in cohort.items():
        for wk in act[u]:
            if wk >= cw:
                want[(cw, wk - cw)].add(u)
    assert got == {k: len(v) for k, v in want.items()}


def test_pareto_cutoff_matches_bruteforce(spark):
    """`value_pareto_cutoff` vs a direct ranked cumulative scan."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import value_pareto_cutoff

    sf = "/root/testdata/sf0.001"
    got = [
        (r["rnk"], r["user_id"], r["v_micro"], r["prev_cum"])
        for r in value_pareto_cutoff(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT user_id, CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY user_id"
    ).fetchall()
    ranked = sorted(rows, key=lambda r: (-r[1], r[0]))
    total = sum(v for _, v in ranked)
    want = []
    cum = 0
    for i, (u, v) in enumerate(ranked, start=1):
        if cum * 100 < total * 80:
            want.append((i, u, v, cum))
        cum += v
    assert got == want


def test_hhi_matches_bruteforce(spark):
    """`supplier_hhi_concentration` vs exact big-int Σc²·10⁶ // (Σc)²."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import (
        supplier_hhi_concentration,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["n_name"]: (r["n_suppliers"], r["rev_cents"], r["hhi_ppm"])
        for r in supplier_hhi_concentration(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT s_nationkey, l_suppkey,
               SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/supplier.parquet') s ON s_suppkey = l_suppkey
        GROUP BY 1, 2
        """
    ).fetchall()
    names = dict(
        duckdb.sql(
            f"SELECT n_nationkey, n_name FROM read_parquet('{sf}/nation.parquet')"
        ).fetchall()
    )
    per_nation = defaultdict(list)
    for nk, _, rev in rows:
        per_nation[nk].append(rev)
    want = {}
    for nk, revs in per_nation.items():
        tot = sum(revs)
        want[names[nk]] = (
            len(revs),
            tot,
            sum(r * r for r in revs) * 1_000_000 // (tot * tot),
        )
    assert got == want


def test_rolling_median_matches_bruteforce(spark):
    """`user_rolling_median` (7-row frame, 2×median integers) vs a direct
    sorted-frame scan."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import user_rolling_median

    sf = "/root/testdata/sf0.001"
    df = user_rolling_median(spark, sf)
    key_cols = [c for c in df.columns]
    got = {r["event_id"]: r[key_cols[-1]] for r in df.collect()}
    rows = duckdb.sql(
        f"SELECT user_id, event_id, epoch_ms(ts), CAST(ROUND(value * 1e6) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet') ORDER BY user_id, epoch_ms(ts), event_id"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for u, eid, t, v in rows:
        per[u].append((eid, v))
    for u, seq in per.items():
        for i, (eid, _) in enumerate(seq):
            frame = sorted(v for _, v in seq[max(0, i - 6) : i + 1])
            n = len(frame)
            want = frame[(n + 1) // 2 - 1] + frame[n // 2]
            assert got[eid] == want, (u, eid)


def test_quantity_mode_matches_bruteforce(spark):
    """`quantity_mode_exact` vs a direct histogram argmax with the
    pinned smallest-value tie-break."""
    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import quantity_mode_exact

    sf = "/root/testdata/sf0.001"
    got = {
        r["l_returnflag"]: (r["mode_qty"], r["n_mode"], r["share_ppm"])
        for r in quantity_mode_exact(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT l_returnflag, CAST(l_quantity AS BIGINT) FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchall()
    hist = defaultdict(Counter)
    for f, q in rows:
        hist[f][q] += 1
    want = {}
    for f, c in hist.items():
        n_all = sum(c.values())
        qty, n = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        want[f] = (qty, n, n * 1_000_000 // n_all)
    assert got == want


def test_pattern_match_matches_bruteforce(spark):
    """`event_pattern_match` vs Python re: same symbolization, same
    non-overlapping v+c*p count."""
    import re as _re

    import duckdb

    from cdc_agents_data_stream_spark.queries.window_queries import event_pattern_match

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["seq"], r["n_events"], r["n_funnel_runs"])
        for r in event_pattern_match(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_ms(ts), event_id "
        f"FROM read_parquet('{sf}/events.parquet') ORDER BY user_id, epoch_ms(ts), event_id"
    ).fetchall()
    from collections import defaultdict

    per = defaultdict(list)
    for u, t, _, _ in rows:
        per[u].append(t[0])
    for u, codes in per.items():
        seq = "".join(codes)
        want = (seq, len(codes), len(_re.findall("v+c*p", seq)))
        assert got[u] == want, u


def test_capped_rollup_matches_bruteforce(spark):
    """`capped_contribution_rollup` vs a direct two-level capped replay."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import (
        capped_contribution_rollup,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n_users"], r["n_events"], r["n_capped"], r["cents_capped"])
        for r in capped_contribution_rollup(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, user_id, CAST(ROUND(value * 100) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    per = defaultdict(lambda: [0, 0])  # (type,user) -> [n_u, c_u]
    for t, u, c in rows:
        a = per[(t, u)]
        a[0] += 1
        a[1] += min(c, 5000)
    want = defaultdict(lambda: [0, 0, 0, 0])
    for (t, _), (n_u, c_u) in per.items():
        w = want[t]
        w[0] += 1
        w[1] += n_u
        w[2] += min(n_u, 5)
        w[3] += c_u if n_u <= 5 else c_u * 5 // n_u
    assert got == {t: tuple(v) for t, v in want.items()}


def test_gini_matches_bruteforce(spark):
    """`value_gini_ppm` vs the exact rank-formula on Python big ints."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.feature_queries import value_gini_ppm

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (r["n"], r["gini_ppm"])
        for r in value_gini_ppm(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for t, c in rows:
        per[t].append(c)
    for t, xs in per.items():
        xs.sort()
        n = len(xs)
        tot = sum(xs)
        num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
        want = num * 1_000_000 // (n * tot) if tot else 0
        assert got[t] == (n, want), t


def test_benford_matches_bruteforce(spark):
    """`order_value_benford` vs direct string-math digit counting."""
    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.quality_queries import order_value_benford

    sf = "/root/testdata/sf0.001"
    got = {
        r["digit"]: (r["n"], r["share_ppm"])
        for r in order_value_benford(spark, sf).collect()
    }
    cents = [
        r[0]
        for r in duckdb.sql(
            f"SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) FROM read_parquet('{sf}/orders.parquet')"
        ).fetchall()
    ]
    c = Counter(int(str(v)[0]) for v in cents)
    n_all = len(cents)
    assert got == {d: (n, n * 1_000_000 // n_all) for d, n in c.items()}


def test_decile_lift_matches_bruteforce(spark):
    """`decile_lift_table` vs a direct deterministic NTILE replay."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.ml_queries import decile_lift_table

    sf = "/root/testdata/sf0.001"
    got = [
        (r["decile"], r["n_users"], r["purchases"], r["cum_capture_ppm"])
        for r in decile_lift_table(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT user_id, CAST(ROUND(value * 100) AS BIGINT), event_type "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    per = defaultdict(lambda: [0, 0])
    for u, cts, t in rows:
        per[u][0] += cts
        per[u][1] += 1 if t == "purchase" else 0
    ranked = sorted(per.items(), key=lambda kv: (-kv[1][0], kv[0]))
    n = len(ranked)
    # NTILE(k): first (n % k) tiles get ceil(n/k), rest floor(n/k)
    base, extra = divmod(n, 10)
    sizes = [base + (1 if i < extra else 0) for i in range(10)]
    want = []
    i = 0
    cum = 0
    all_p = sum(v[1] for _, v in ranked)
    for d, size in enumerate(sizes, start=1):
        if size == 0:
            continue
        chunk = ranked[i : i + size]
        i += size
        p = sum(v[1] for _, v in chunk)
        cum += p
        want.append((d, size, p, cum * 1_000_000 // all_p))
    assert got == want


def test_pagerank_matches_bruteforce(spark):
    """`graph_pagerank` vs a dict-based synchronous integer-grid power
    iteration on the real sf0.001 purchase graph (same ppm constants,
    same DIV floors, same dangling redistribution)."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.operators.graph import (
        PR_DAMP_MILLI,
        PR_INIT_PPM,
        PR_ITERATIONS,
        PR_TELEPORT_PPM,
    )
    from cdc_agents_data_stream_spark.queries.graph_queries import graph_pagerank

    sf = "/root/testdata/sf0.001"
    got = {r["node"]: r["rank_ppm"] for r in graph_pagerank(spark, sf).collect()}
    pairs = duckdb.sql(
        f"""
        SELECT DISTINCT CAST(o_custkey AS BIGINT), CAST(l_suppkey AS BIGINT)
        FROM read_parquet('{sf}/orders.parquet') o
        JOIN read_parquet('{sf}/lineitem.parquet') l ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    nodes = set(
        r[0] * 2
        for r in duckdb.sql(
            f"SELECT CAST(c_custkey AS BIGINT) FROM read_parquet('{sf}/customer.parquet')"
        ).fetchall()
    ) | set(
        r[0] * 2 + 1
        for r in duckdb.sql(
            f"SELECT CAST(s_suppkey AS BIGINT) FROM read_parquet('{sf}/supplier.parquet')"
        ).fetchall()
    )
    out = defaultdict(list)
    for ck, sk in pairs:
        out[ck * 2].append(sk * 2 + 1)
        out[sk * 2 + 1].append(ck * 2)
    n_nodes = len(nodes)
    rank = {n: PR_INIT_PPM for n in nodes}
    for _ in range(PR_ITERATIONS):
        contrib = defaultdict(int)
        for src, dsts in out.items():
            share = rank[src] // len(dsts)
            for d in dsts:
                contrib[d] += share
        dsum = sum(rank[n] for n in nodes if n not in out)
        rank = {
            n: PR_TELEPORT_PPM
            + (PR_DAMP_MILLI * (contrib.get(n, 0) + dsum // n_nodes)) // 1000
            for n in nodes
        }
    assert got == rank


def test_calibration_bins_match_bruteforce(spark):
    """`calibration_bins` vs direct fixed-width binning."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.ml_queries import calibration_bins

    sf = "/root/testdata/sf0.001"
    got = {
        r["bin"]: (r["n"], r["n_pos"], r["pos_rate_ppm"], r["mean_score_cents"])
        for r in calibration_bins(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT CAST(ROUND(value * 100) AS BIGINT), event_type = 'purchase' "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0, 0])
    for cents, pos in rows:
        b = min(9, cents // 1000)
        a = acc[b]
        a[0] += 1
        a[1] += 1 if pos else 0
        a[2] += cents
    assert got == {
        b: (n, p, p * 1_000_000 // n, s // n) for b, (n, p, s) in acc.items()
    }


def test_diversity_index_matches_bruteforce(spark):
    """`type_diversity_index` vs the exact rational (n²−Σc²)·10⁶//n²."""
    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import (
        type_diversity_index,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        str(r["day"]): (r["n"], r["n_types"], r["gini_simpson_ppm"])
        for r in type_diversity_index(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT CAST(ts AS DATE), event_type FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    per = defaultdict(Counter)
    for day, t in rows:
        per[day][t] += 1
    want = {}
    for day, c in per.items():
        n = sum(c.values())
        sum_c2 = sum(v * v for v in c.values())
        want[str(day)] = (n, len(c), (n * n - sum_c2) * 1_000_000 // (n * n))
    assert got == want


def test_rfm_segments_match_bruteforce(spark):
    """`customer_rfm_segments` vs three deterministic NTILE(4) replays."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import (
        customer_rfm_segments,
    )

    def ntile4(ranked):
        n = len(ranked)
        base, extra = divmod(n, 4)
        out = {}
        i = 0
        for tile in range(1, 5):
            size = base + (1 if tile <= extra else 0)
            for key in ranked[i : i + size]:
                out[key] = tile
            i += size
        return out

    sf = "/root/testdata/sf0.001"
    got = {
        r["segment"]: (r["n_customers"], r["avg_cents"])
        for r in customer_rfm_segments(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT o_custkey, CAST(o_orderdate AS DATE), CAST(ROUND(o_totalprice*100) AS BIGINT) "
        f"FROM read_parquet('{sf}/orders.parquet')"
    ).fetchall()
    per = {}
    end_day = max(r[1] for r in rows)
    for ck, day, cents in rows:
        rec, freq, tot = per.get(ck, (None, 0, 0))
        last = day if rec is None else max(rec, day)
        per[ck] = (last, freq + 1, tot + cents)
    cust = {
        ck: ((end_day - last).days, freq, tot) for ck, (last, freq, tot) in per.items()
    }
    r_t = ntile4(sorted(cust, key=lambda k: (cust[k][0], k)))
    f_t = ntile4(sorted(cust, key=lambda k: (-cust[k][1], k)))
    m_t = ntile4(sorted(cust, key=lambda k: (-cust[k][2], k)))
    seg = defaultdict(lambda: [0, 0])
    for ck, (_, _, tot) in cust.items():
        s = r_t[ck] * 100 + f_t[ck] * 10 + m_t[ck]
        seg[s][0] += 1
        seg[s][1] += tot
    assert got == {s: (n, t // n) for s, (n, t) in seg.items()}


def test_pmi_matches_bruteforce(spark):
    """`token_cooccurrence_pmi` vs direct presence-pair counting."""
    import duckdb
    from collections import Counter
    from itertools import combinations

    from cdc_agents_data_stream_spark.queries.text_queries import (
        token_cooccurrence_pmi,
    )

    sf = "/root/testdata/sf0.001"
    got = [
        (r["tok_a"], r["tok_b"], r["c_ab"], r["c_a"], r["c_b"], r["assoc_ppm"])
        for r in token_cooccurrence_pmi(spark, sf).collect()
    ]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    n_docs = len(docs)
    df = Counter()
    c_ab = Counter()
    for _, text in docs:
        toks = sorted(set(text.split(" ")))
        df.update(toks)
        c_ab.update(combinations(toks, 2))
    want = sorted(
        (a, b, n, df[a], df[b], n * n_docs * 1_000_000 // (df[a] * df[b]))
        for (a, b), n in c_ab.items()
        if n >= 20
    )
    assert got == want


def test_log2_histogram_matches_bruteforce(spark):
    """`log2_histogram_quantiles` vs a direct bit-length histogram."""
    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.queries.sketch_queries import (
        log2_histogram_quantiles,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (
            r["n"],
            r["p50_bucket"],
            r["p50_lo_cents"],
            r["p99_bucket"],
            r["p99_lo_cents"],
        )
        for r in log2_histogram_quantiles(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, GREATEST(1, CAST(ROUND(value * 100) AS BIGINT)) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    hist = defaultdict(Counter)
    for t, cents in rows:
        hist[t][cents.bit_length() - 1] += 1
    for t, c in hist.items():
        n = sum(c.values())

        def pick(qn, qd):
            cum = 0
            for b in sorted(c):
                cum += c[b]
                if cum * qd >= n * qn:
                    return b
            raise AssertionError("unreachable")

        p50, p99 = pick(1, 2), pick(99, 100)
        assert got[t] == (n, p50, 1 << p50, p99, 1 << p99), t


def test_item_item_matches_bruteforce(spark):
    """`item_item_similarity` vs direct basket-pair counting + squared
    cosine on the ppm grid with the pinned top-3 tie-break."""
    import duckdb
    from collections import Counter, defaultdict
    from itertools import combinations

    from cdc_agents_data_stream_spark.queries.relational import item_item_similarity

    sf = "/root/testdata/sf0.001"
    got = [
        (r["item_a"], r["rnk"], r["item_b"], r["c_ab"], r["sim2_ppm"])
        for r in item_item_similarity(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchall()
    baskets = defaultdict(set)
    supp = Counter()
    for ok, item in rows:
        baskets[ok].add(item)
        supp[item] += 1
    c_ab = Counter()
    for items in baskets.values():
        c_ab.update(combinations(sorted(items), 2))
    per_a = defaultdict(list)
    for (a, b), n in c_ab.items():
        if n < 3:
            continue
        for x, y in ((a, b), (b, a)):
            per_a[x].append((y, n, n * n * 1_000_000 // (supp[x] * supp[y])))
    want = []
    for a in per_a:
        ranked = sorted(per_a[a], key=lambda r: (-r[2], r[0]))[:3]
        for rnk, (b, n, s) in enumerate(ranked, start=1):
            want.append((a, rnk, b, n, s))
    assert sorted(got) == sorted(want)


def test_max_concurrent_matches_bruteforce(spark):
    """`max_concurrent_users` vs a direct sweep-line replay (ends before
    starts at the same millisecond, midnight clipping)."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import max_concurrent_users

    sf = "/root/testdata/sf0.001"
    got = {
        r["day"]: r["max_concurrent"] for r in max_concurrent_users(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT), epoch_ms(ts) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    bounds = defaultdict(list)
    for day, t in rows:
        day_end = (day + 1) * 86400000
        bounds[day].append((t, 1))
        bounds[day].append((min(t + 1800000, day_end), -1))
    for day, bs in bounds.items():
        bs.sort()  # (at_ms, delta): -1 sorts before +1 at equal ms
        occ = peak = 0
        for _, d in bs:
            occ += d
            peak = max(peak, occ)
        assert got[day] == peak, day


def test_gapfill_locf_matches_bruteforce(spark):
    """`user_daily_gapfill` vs a direct grid + carry-forward replay."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import user_daily_gapfill

    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["bucket_idx"]): (r["filled_val"], r["is_gap"])
        for r in user_daily_gapfill(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, epoch_ms(ts) // 86400000, "
        f"CAST(ROUND(value * 100) AS BIGINT) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    obs = defaultdict(lambda: defaultdict(int))
    for u, d, c in rows:
        obs[u][d] += c
    count = 0
    for u, days in obs.items():
        lo, hi = min(days), max(days)
        last = None
        for d in range(lo, hi + 1):
            if d in days:
                last = days[d]
                want = (last, 0)
            else:
                want = (last, 1)
            assert got[(u, d)] == want, (u, d)
            count += 1
    assert len(got) == count


def test_status_transitions_match_bruteforce(spark):
    """`order_status_transitions` vs a direct per-customer lag replay."""
    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import (
        order_status_transitions,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["from_status"], r["to_status"]): (r["n"], r["p_ppm"])
        for r in order_status_transitions(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT o_custkey, epoch_ms(o_orderdate), o_orderkey, o_orderstatus "
        f"FROM read_parquet('{sf}/orders.parquet') ORDER BY o_custkey, epoch_ms(o_orderdate), o_orderkey"
    ).fetchall()
    seq = defaultdict(list)
    for ck, _, _, st in rows:
        seq[ck].append(st)
    pairs = Counter()
    for sts in seq.values():
        pairs.update(zip(sts, sts[1:]))
    n_from = Counter()
    for (a, _), n in pairs.items():
        n_from[a] += n
    assert got == {
        k: (n, n * 1_000_000 // n_from[k[0]]) for k, n in pairs.items()
    }


def test_run_lengths_match_bruteforce(spark):
    """`value_run_lengths` vs a direct consecutive-equal scan."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import value_run_lengths

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["n_runs"], r["longest_run"])
        for r in value_run_lengths(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type FROM read_parquet('{sf}/events.parquet') "
        f"WHERE user_id % 11 = 0 ORDER BY user_id, epoch_ms(ts), event_id"
    ).fetchall()
    per = defaultdict(list)
    for u, t in rows:
        per[u].append(t)
    for u, sts in per.items():
        runs = []
        cur = 0
        prev = None
        for t in sts:
            if t != prev:
                if cur:
                    runs.append(cur)
                cur = 0
            cur += 1
            prev = t
        runs.append(cur)
        assert got[u] == (len(runs), max(runs)), u


def test_dwell_time_matches_bruteforce(spark):
    """`state_dwell_time` vs a direct interval accumulation."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import state_dwell_time

    sf = "/root/testdata/sf0.001"
    got = {
        (r["user_id"], r["event_type"]): (r["n_intervals"], r["dwell_ms"])
        for r in state_dwell_time(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_ms(ts) FROM read_parquet('{sf}/events.parquet') "
        f"WHERE user_id % 7 = 0 ORDER BY user_id, epoch_ms(ts), event_id"
    ).fetchall()
    per = defaultdict(list)
    for u, t, ms_ in rows:
        per[u].append((t, ms_))
    want = defaultdict(lambda: [0, 0])
    for u, seq in per.items():
        for (t, a), (_, b) in zip(seq, seq[1:]):
            w = want[(u, t)]
            w[0] += 1
            w[1] += b - a
    assert got == {k: tuple(v) for k, v in want.items()}


def test_audience_overlap_matches_bruteforce(spark):
    """`audience_overlap_matrix` vs direct set intersections."""
    import duckdb
    from collections import defaultdict
    from itertools import combinations

    from cdc_agents_data_stream_spark.queries.relational import audience_overlap_matrix

    sf = "/root/testdata/sf0.001"
    got = {
        (r["type_a"], r["type_b"]): (r["n_a"], r["n_b"], r["n_inter"], r["jaccard_ppm"])
        for r in audience_overlap_matrix(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    sets = defaultdict(set)
    for t, u in rows:
        sets[t].add(u)
    want = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter == 0:
            continue
        union = len(sets[a] | sets[b])
        want[(a, b)] = (len(sets[a]), len(sets[b]), inter, inter * 1_000_000 // union)
    assert got == want


def test_weekly_growth_matches_bruteforce(spark):
    """`weekly_growth_ppm` vs a direct FLOOR-on-IEEE replay (negative
    growth exercises the floor-vs-truncate divergence the query pins)."""
    import math

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import weekly_growth_ppm

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["week"]): (r["wk_cents"], r["growth_ppm"])
        for r in weekly_growth_ppm(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, epoch_ms(ts) // 604800000, "
        f"CAST(ROUND(value * 100) AS BIGINT) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    weekly = defaultdict(int)
    for t, wk, c in rows:
        weekly[(t, wk)] += c
    by_type = defaultdict(dict)
    for (t, wk), c in weekly.items():
        by_type[t][wk] = c
    saw_negative = False
    for t, series in by_type.items():
        prev = None
        for wk in sorted(series):
            cur = series[wk]
            g = (
                math.floor((cur - prev) * 1_000_000 / prev)
                if prev not in (None, 0)
                else None
            )
            if g is not None and g < 0:
                saw_negative = True
            assert got[(t, wk)] == (cur, g), (t, wk)
            prev = cur
    assert saw_negative  # the divergence-prone branch is actually exercised


def test_cumulative_new_users_matches_bruteforce(spark):
    """`cumulative_new_users` vs a direct first-touch accumulation."""
    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.window_queries import cumulative_new_users

    sf = "/root/testdata/sf0.001"
    got = [
        (r["day"], r["new_users"], r["cum_users"])
        for r in cumulative_new_users(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT user_id, MIN(epoch_ms(ts) // 86400000) "
        f"FROM read_parquet('{sf}/events.parquet') GROUP BY user_id"
    ).fetchall()
    daily = Counter(d for _, d in rows)
    want = []
    cum = 0
    for d in sorted(daily):
        cum += daily[d]
        want.append((d, daily[d], cum))
    assert sorted(got) == want


def test_kfold_matches_bruteforce(spark):
    """`kfold_assignment` vs Python hashlib md5 folding with the exact
    id-sum membership signal."""
    import hashlib

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.feature_queries import kfold_assignment

    sf = "/root/testdata/sf0.001"
    got = {
        (r["fold"], r["event_type"]): (r["n"], r["id_sum"])
        for r in kfold_assignment(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_id, event_type FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0])
    for eid, t in rows:
        fold = int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16) % 5
        a = acc[(fold, t)]
        a[0] += 1
        a[1] += eid
    assert got == {k: (n, float(s)) for k, (n, s) in acc.items()}


def test_class_weights_match_bruteforce(spark):
    """`class_weights_inverse` vs the sklearn balanced rule on ints."""
    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.quality_queries import (
        class_weights_inverse,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_class"], r["weight_ppm"])
        for r in class_weights_inverse(spark, sf).collect()
    }
    langs = Counter(
        r[0]
        for r in duckdb.sql(
            f"SELECT lang FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    )
    n_total = sum(langs.values())
    k = len(langs)
    assert got == {
        lang: (n, n_total * 1_000_000 // (k * n)) for lang, n in langs.items()
    }


def test_ship_lag_matches_bruteforce(spark):
    """`ship_lag_profile` vs direct discrete-percentile selection."""
    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import ship_lag_profile

    sf = "/root/testdata/sf0.001"
    got = {
        r["o_orderpriority"]: (
            r["n_lines"],
            r["p50_days"],
            r["p90_days"],
            r["over_sla_ppm"],
        )
        for r in ship_lag_profile(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"""
        SELECT o_orderpriority,
               date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
        FROM read_parquet('{sf}/lineitem.parquet') l
        JOIN read_parquet('{sf}/orders.parquet') o ON o.o_orderkey = l.l_orderkey
        """
    ).fetchall()
    hist = defaultdict(Counter)
    for p, lag in rows:
        hist[p][lag] += 1
    for p, c in hist.items():
        t = sum(c.values())

        def pick(num, den):
            cum = 0
            for lag in sorted(c):
                cum += c[lag]
                if cum * den >= t * num:
                    return lag
            raise AssertionError

        over = sum(n for lag, n in c.items() if lag > 60)
        assert got[p] == (t, pick(1, 2), pick(9, 10), over * 1_000_000 // t), p


def test_seasonality_dow_matches_bruteforce(spark):
    """`seasonality_dow` vs direct epoch-day % 7 accumulation."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import seasonality_dow

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["dow7"]): (r["n"], r["sum_cents"])
        for r in seasonality_dow(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) % 7, "
        f"CAST(ROUND(value * 100) AS BIGINT) FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0])
    for t, d, c in rows:
        a = acc[(t, d)]
        a[0] += 1
        a[1] += c
    assert got == {k: tuple(v) for k, v in acc.items()}


def test_hash_chi2_matches_bruteforce(spark):
    """`uniform_hash_chi2` vs hashlib md5 bucketing and the exact
    cross-multiplied statistic (including empty-bucket terms)."""
    import hashlib

    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.quality_queries import uniform_hash_chi2

    sf = "/root/testdata/sf0.001"
    row = uniform_hash_chi2(spark, sf).collect()[0]
    users = [
        r[0]
        for r in duckdb.sql(
            f"SELECT DISTINCT user_id FROM read_parquet('{sf}/events.parquet')"
        ).fetchall()
    ]
    k = 64
    c = Counter(
        int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16) % k for u in users
    )
    n = len(users)
    chi2 = (
        sum((o * k - n) ** 2 for o in c.values()) + (k - len(c)) * n * n
    ) * 1000 // (n * k)
    assert (
        row["n_buckets"],
        row["n_keys"],
        row["min_bucket"],
        row["max_bucket"],
        row["chi2_milli"],
    ) == (len(c), n, min(c.values()), max(c.values()), chi2)


def test_phrase_search_matches_bruteforce(spark):
    """`phrase_search` vs direct shingle enumeration: same probe
    derivation (df DESC, shingle ASC), same hit set, every hit
    substring-verified."""
    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.text_queries import phrase_search

    sf = "/root/testdata/sf0.001"
    got = [
        (r["doc_id"], r["phrase"], r["df"], r["verified"])
        for r in phrase_search(spark, sf).collect()
    ]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    per_doc = {}
    df_count = Counter()
    for doc_id, text in docs:
        toks = text.split(" ")
        grams = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}
        per_doc[doc_id] = (grams, text)
        df_count.update(grams)
    phrase, df = sorted(df_count.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    want = sorted(
        (doc_id, phrase, df, phrase in text)
        for doc_id, (grams, text) in per_doc.items()
        if phrase in grams
    )
    assert sorted(got) == want
    assert all(v for _, _, _, v in want)  # index hit => substring contains


def test_split_matches_hashlib(spark):
    """`train_val_test_split` vs hashlib md5 — the engine's
    conv/substring bucketing must agree with an independent md5, and
    the id-sum membership signal must match per (type, split)."""
    import hashlib

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.feature_queries import (
        train_val_test_split,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["split"]): (r["n"], r["sum_id"])
        for r in train_val_test_split(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_id, event_type FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0])
    for eid, t in rows:
        b = int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16) % 100
        split = "train" if b < 80 else ("val" if b < 90 else "test")
        a = acc[(t, split)]
        a[0] += 1
        a[1] += eid
    assert got == {k: (n, float(s)) for k, (n, s) in acc.items()}


def test_stratified_sample_matches_hashlib(spark):
    """`stratified_sample_counts` vs a hashlib md5 keep-coin replay."""
    import hashlib

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.sampling_queries import (
        stratified_sample_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_kept"], r["kept_chars"])
        for r in stratified_sample_counts(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT doc_id, lang, n_chars FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0])
    for doc_id, lang, n_chars in rows:
        coin = int(hashlib.md5(f"{doc_id}:s1".encode()).hexdigest()[:15], 16) % 10000
        thresh = {"en": 8000, "de": 3000}.get(lang, 1000)
        if coin < thresh:
            a = acc[lang]
            a[0] += 1
            a[1] += n_chars
    assert got == {k: tuple(v) for k, v in acc.items()}


def test_tfidf_retrieval_matches_bruteforce(spark):
    """`tfidf_retrieval_topk` vs direct posting-list scoring with the
    log-free integer idf and the pinned (score DESC, doc_id) top-20."""
    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.queries.text_queries import tfidf_retrieval_topk

    sf = "/root/testdata/sf0.001"
    got = [
        (r["doc_id"], r["score"]) for r in tfidf_retrieval_topk(spark, sf).collect()
    ]
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    terms = {"vector", "merge", "stream", "window"}
    tf = defaultdict(Counter)
    for doc_id, text in docs:
        for t in text.split(" "):
            if t in terms:
                tf[doc_id][t] += 1
    dfreq = Counter()
    for c in tf.values():
        dfreq.update(c.keys())
    n_docs = len(docs)
    idf = {t: n_docs * 1_000_000 // df for t, df in dfreq.items()}
    scores = {
        d: sum(n * idf[t] for t, n in c.items()) for d, c in tf.items()
    }
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert got == want


def test_fingerprint_matches_hashlib(spark):
    """`doc_fingerprint` vs hashlib md5: both the set fingerprint and the
    min token hash re-derived independently."""
    import hashlib

    import duckdb

    from cdc_agents_data_stream_spark.queries.text_queries import doc_fingerprint

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["set_fingerprint"], r["min_token_hash"])
        for r in doc_fingerprint(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    for doc_id, text in docs:
        toks = text.split(" ")
        uniq = list(dict.fromkeys(toks))  # array_distinct keeps first-seen order
        fp = hashlib.md5(" ".join(sorted(uniq)).encode()).hexdigest()
        mth = min(
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in uniq
        )
        assert got[doc_id] == (fp, mth), doc_id


def test_lang_id_matches_bruteforce(spark):
    """`text_lang_id` vs a direct stopword-count replay with the pinned
    en>es>de>fr argmax tie order."""
    import duckdb

    from cdc_agents_data_stream_spark.operators.textops import LANG_ORDER, STOPWORDS
    from cdc_agents_data_stream_spark.queries.text_queries import text_lang_id

    sf = "/root/testdata/sf0.001"
    df = text_lang_id(spark, sf)
    got = {r["doc_id"]: tuple(r[c] for c in df.columns[1:]) for r in df.collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    for doc_id, lang, text in docs:
        toks = text.split(" ")
        hits = {
            lg: sum(1 for t in toks if t in set(STOPWORDS[lg])) for lg in LANG_ORDER
        }
        pred = max(LANG_ORDER, key=lambda lg: (hits[lg], -LANG_ORDER.index(lg)))
        assert got[doc_id] == (lang, *[hits[lg] for lg in LANG_ORDER], pred), doc_id


def test_token_count_matches_bruteforce(spark):
    """`token_count_bpe` vs direct whitespace + ceil(len/4) counting."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.text_queries import token_count_bpe

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["ws_token_cnt"], r["subword_cnt"])
        for r in token_count_bpe(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    for doc_id, text in docs:
        toks = text.split(" ")
        want = (len(toks), sum(-(-len(t) // 4) for t in toks))
        assert got[doc_id] == want, doc_id


def test_sequence_packing_matches_bruteforce(spark):
    """`pack_sequences_stats` vs a direct per-shard contiguous-fill
    replay (pack = floor(cum_before / 512), ordered by doc_id)."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.sampling_queries import (
        pack_sequences_stats,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["shard"], r["pack_id"]): (r["n_docs"], r["pack_tokens"])
        for r in pack_sequences_stats(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, len(string_split(text, ' ')) FROM read_parquet('{sf}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    shards = defaultdict(list)
    for doc_id, n_tokens in docs:
        shards[doc_id % 8].append(n_tokens)
    want = defaultdict(lambda: [0, 0])
    for shard, toks in shards.items():
        cum = 0
        for n in toks:
            pack = cum // 512
            w = want[(shard, pack)]
            w[0] += 1
            w[1] += n
            cum += n
    assert got == {k: tuple(v) for k, v in want.items()}


def test_gopher_signals_match_bruteforce(spark):
    """`gopher_repetition_signals` vs a direct Counter-based replay of
    all four ppm/micro signals and the composite keep flag."""
    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.text_queries import (
        gopher_repetition_signals,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (
            r["token_cnt"],
            r["top_token_ppm"],
            r["top_bigram_ppm"],
            r["ttr_ppm"],
            r["mean_word_len_micro"],
            r["gopher_ok"],
        )
        for r in gopher_repetition_signals(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    for doc_id, text in docs:
        toks = text.split(" ")
        tc = Counter(toks)
        n = len(toks)
        bi = Counter(" ".join(p) for p in zip(toks, toks[1:]))
        top_token = max(tc.values()) * 1_000_000 // n
        top_bigram = (
            max(bi.values()) * 1_000_000 // sum(bi.values()) if bi else 0
        )
        ttr = len(tc) * 1_000_000 // n
        mwl = sum(len(t) for t in toks) * 1_000_000 // n
        ok = int(top_token <= 200000 and top_bigram <= 180000 and ttr >= 100000)
        assert got[doc_id] == (n, top_token, top_bigram, ttr, mwl, ok), doc_id


def test_minhash_lsh_end_to_end_matches_hashlib(spark):
    """The crown-jewel replay: the FULL MinHash-LSH pipeline —
    3-gram shingles → md5 h0 → 32 LCG permutation minima → 8 banded
    md5 buckets → candidate pairs → exact-Jaccard verify — re-derived
    in pure Python hashlib against `dedup_minhash_lsh` on the real
    sf0.001 corpus. Proves the banding itself (which pairs are even
    COMPARED), not just the final scores."""
    import hashlib

    import duckdb

    from cdc_agents_data_stream_spark.operators.dedup import (
        BAND_SIZE,
        HASH_A,
        HASH_B,
        MERSENNE_P,
        N_HASHES,
    )
    from cdc_agents_data_stream_spark.queries.dedup_queries import dedup_minhash_lsh

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_minhash_lsh(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()

    def md5_int(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    shingle_sets = {}
    buckets = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        grams = {" ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))}
        shingle_sets[doc_id] = grams
        if not grams:
            continue
        h0s = [md5_int(g) % MERSENNE_P for g in grams]
        sig = [
            min((HASH_A[i] * h + HASH_B[i]) % MERSENNE_P for h in h0s)
            for i in range(N_HASHES)
        ]
        buckets[doc_id] = [
            hashlib.md5(
                ",".join(str(sig[band * BAND_SIZE + j]) for j in range(BAND_SIZE)).encode()
            ).hexdigest()
            for band in range(N_HASHES // BAND_SIZE)
        ]
    candidates = set()
    ids = sorted(buckets)
    by_bucket = {}
    for doc_id in ids:
        for band, bucket in enumerate(buckets[doc_id]):
            by_bucket.setdefault((band, bucket), []).append(doc_id)
    for docs_in in by_bucket.values():
        for i, a in enumerate(docs_in):
            for b in docs_in[i + 1 :]:
                candidates.add((min(a, b), max(a, b)))
    want = {}
    for a, b in candidates:
        sa, sb = shingle_sets[a], shingle_sets[b]
        inter = len(sa & sb)
        if inter == 0:
            continue  # no shared shingle -> no row from the verify join
        j = round(inter / (len(sa) + len(sb) - inter), 6)
        if j >= 0.5:
            want[(a, b)] = j
    assert got == want


def test_simhash_end_to_end_matches_hashlib(spark):
    """Full SimHash pipeline replay in pure hashlib: token md5 h0 →
    32 per-bit sign balances → sign fold → pigeonhole blocks →
    candidate pairs → Hamming verify, vs `dedup_simhash`. Lossless
    banding means the replay must produce EXACTLY the same pair set."""
    import hashlib

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.dedup_queries import dedup_simhash

    sf = "/root/testdata/sf0.001"
    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dedup_simhash(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    sims = {}
    for doc_id, text in docs:
        balance = [0] * 32
        for tok in text.split(" "):
            h0 = int(hashlib.md5(tok.encode()).hexdigest()[:15], 16)
            for j in range(32):
                balance[j] += 1 if (h0 >> j) & 1 else -1
        sims[doc_id] = sum(1 << j for j in range(32) if balance[j] > 0)
    # pigeonhole candidates: 4 blocks of 8 bits (last absorbs remainder)
    by_block = defaultdict(list)
    for doc_id, s in sims.items():
        for i in range(4):
            width = 32 - i * 8 if i == 3 else 8
            by_block[(i, (s >> (i * 8)) & ((1 << width) - 1))].append(doc_id)
    want = {}
    for docs_in in by_block.values():
        for i, a in enumerate(sorted(docs_in)):
            for b in sorted(docs_in)[i + 1 :]:
                h = bin(sims[a] ^ sims[b]).count("1")
                if h <= 3:
                    want[(a, b)] = h
    assert got == want


def test_bloom_incremental_matches_hashlib(spark):
    """Full Bloom pipeline replay in pure hashlib: build the packed
    words from history, probe every doc, and reproduce both the hit
    flags (including this filter's REAL false positives) and the exact
    true-dup labels."""
    import hashlib

    import duckdb

    from cdc_agents_data_stream_spark.queries.dedup_queries import (
        dedup_bloom_incremental,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["doc_id"]: (r["bloom_hit"], r["true_dup"])
        for r in dedup_bloom_incremental(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()

    def positions(text):
        hx = hashlib.md5(text.encode()).hexdigest()
        return [int(hx[8 * j : 8 * j + 8], 16) % 1024 for j in range(3)]

    bits = set()
    hist_md5 = set()
    for doc_id, text in docs:
        if doc_id % 3 == 0:
            bits.update(positions(text))
            hist_md5.add(hashlib.md5(text.encode()).hexdigest())
    n_fp = 0
    for doc_id, text in docs:
        hit = all(p in bits for p in positions(text))
        dup = hashlib.md5(text.encode()).hexdigest() in hist_md5
        assert got[doc_id] == (hit, dup), doc_id
        assert not (dup and not hit)  # no false negatives, ever
        n_fp += 1 if (hit and not dup) else 0
    assert n_fp > 0  # the small gate filter forces real false positives


def test_hll_registers_match_hashlib(spark):
    """HLL register pipeline replay in pure hashlib: bucket, rho, the
    exact integer register sum, and the rounded estimate."""
    import hashlib

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.operators.sketches import (
        HLL_ALPHA,
        HLL_M,
        RHO_CAP,
        _W_BITS,
    )
    from cdc_agents_data_stream_spark.queries.sketch_queries import hll_distinct_events

    sf = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: (
            r["n_true"],
            r["n_buckets_hit"],
            r["register_sum"],
            r["hll_estimate"],
        )
        for r in hll_distinct_events(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, event_id FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    regs = defaultdict(dict)
    true_sets = defaultdict(set)
    for t, eid in rows:
        true_sets[t].add(eid)
        h = int(hashlib.md5(str(eid).encode()).hexdigest()[:15], 16)
        bucket = h % HLL_M
        w = h // HLL_M
        rho = (_W_BITS + 1) if w == 0 else (_W_BITS - w.bit_length() + 1)
        rho = min(rho, RHO_CAP)
        regs[t][bucket] = max(regs[t].get(bucket, 0), rho)
    for t, r in regs.items():
        reg_sum = sum(1 << (RHO_CAP - m) for m in r.values()) + (HLL_M - len(r)) * (
            1 << RHO_CAP
        )
        est = round(HLL_ALPHA * float(HLL_M) * float(HLL_M) * float(1 << RHO_CAP) / reg_sum, 3)
        assert got[t] == (len(true_sets[t]), len(r), reg_sum, est), t


def test_cms_matches_hashlib(spark):
    """Count-min sketch replay in pure hashlib: build the dxw counters,
    probe every user, and reproduce estimates plus the cms >= truth
    invariant."""
    import hashlib

    import duckdb
    from collections import Counter, defaultdict

    from cdc_agents_data_stream_spark.operators.sketches import CMS_D, CMS_W
    from cdc_agents_data_stream_spark.queries.sketch_queries import cms_user_frequencies

    sf = "/root/testdata/sf0.001"
    got = {
        r["user_id"]: (r["true_cnt"], r["cms_est"])
        for r in cms_user_frequencies(spark, sf).collect()
    }
    users = [
        r[0]
        for r in duckdb.sql(
            f"SELECT user_id FROM read_parquet('{sf}/events.parquet')"
        ).fetchall()
    ]

    def bucket(u, j):
        return int(hashlib.md5(f"{u}:{j}".encode()).hexdigest()[:15], 16) % CMS_W

    counters = defaultdict(int)
    for u in users:
        for j in range(CMS_D):
            counters[(j, bucket(u, j))] += 1
    true_cnt = Counter(users)
    for u in set(users):
        est = min(counters[(j, bucket(u, j))] for j in range(CMS_D))
        assert got[u] == (true_cnt[u], est), u
        assert est >= true_cnt[u]


def test_cosine_topk_matches_sequential_fold(spark):
    """`ann_cosine_topk` vs a pure-Python sequential-fold replay: the
    engine's dot product is a LEFT FOLD over the array (F.aggregate), so
    an element-order-preserving Python loop reproduces the IEEE doubles
    bit-for-bit — ranking, tie-breaks, and 6-dp rounded sims included."""
    import math

    import duckdb

    from cdc_agents_data_stream_spark.queries.similarity_queries import ann_cosine_topk

    sf = "/root/testdata/sf0.001"
    got = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim_r"])
        for r in ann_cosine_topk(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')"
    ).fetchall()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    norms = {vid: math.sqrt(fold_dot(v, v)) for vid, v in vecs.items()}
    want = []
    for qid in sorted(v for v in vecs if v < 5):
        sims = [
            (nid, fold_dot(vecs[nid], vecs[qid]) / (norms[nid] * norms[qid]))
            for nid in vecs
            if nid != qid
        ]
        sims.sort(key=lambda r: (-r[1], r[0]))
        for rank, (nid, s) in enumerate(sims[:10], start=1):
            want.append((qid, nid, rank, round(s, 6)))
    assert sorted(got) == sorted(want)


def test_embedding_neardup_matches_fold_replay(spark):
    """`embedding_neardup` end-to-end in pure Python: the fixed LCG
    hyperplanes, per-band sign signatures, candidate equi-join, and the
    cosine verify all replayed with order-preserving folds."""
    import math

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.operators.similarity import N_BANDS, N_PLANES, PLANES
    from cdc_agents_data_stream_spark.queries.similarity_queries import embedding_neardup

    sf = "/root/testdata/sf0.001"
    got = {
        (r["vec_a"], r["vec_b"]): r["sim_r"] for r in embedding_neardup(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')"
    ).fetchall()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    norms = {vid: math.sqrt(fold_dot(v, v)) for vid, v in vecs.items()}
    size = N_PLANES // N_BANDS
    by_band = defaultdict(list)
    for vid, v in vecs.items():
        for band in range(N_BANDS):
            sig = sum(
                (1 << (j % size))
                for j in range(band * size, (band + 1) * size)
                if fold_dot(v, PLANES[j]) >= 0
            )
            by_band[(band, sig)].append(vid)
    candidates = set()
    for ids in by_band.values():
        s = sorted(ids)
        for i, a in enumerate(s):
            for b in s[i + 1 :]:
                candidates.add((a, b))
    want = {}
    for a, b in candidates:
        sim = fold_dot(vecs[a], vecs[b]) / (norms[a] * norms[b])
        if sim >= 0.45:
            want[(a, b)] = round(sim, 6)
    assert got == want


def test_lsh_bucketed_topk_matches_fold_replay(spark):
    """`ann_lsh_bucketed` end-to-end: the 8-plane bucket assignment,
    same-bucket candidate restriction, and reranking replayed with
    order-preserving folds."""
    import math

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.operators.similarity import PLANES
    from cdc_agents_data_stream_spark.queries.similarity_queries import ann_lsh_bucketed

    sf = "/root/testdata/sf0.001"
    got = [
        (r["query_id"], r["neighbor_id"], r["rank"], r["sim_r"])
        for r in ann_lsh_bucketed(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')"
    ).fetchall()

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    norms = {vid: math.sqrt(fold_dot(v, v)) for vid, v in vecs.items()}
    bucket = {
        vid: sum((1 << j) for j, p in enumerate(PLANES) if fold_dot(v, p) >= 0)
        for vid, v in vecs.items()
    }
    want = []
    for qid in sorted(v for v in vecs if v < 5):
        cands = [
            (nid, fold_dot(vecs[nid], vecs[qid]) / (norms[nid] * norms[qid]))
            for nid in vecs
            if nid != qid and bucket[nid] == bucket[qid]
        ]
        cands.sort(key=lambda r: (-r[1], r[0]))
        for rank, (nid, s) in enumerate(cands[:5], start=1):
            want.append((qid, nid, rank, round(s, 6)))
    assert sorted(got) == sorted(want)


def test_rp_projection_matches_bruteforce(spark):
    """`embedding_rp_project` vs direct ±1-sign integer projection."""
    import duckdb

    from cdc_agents_data_stream_spark.operators.linalg import GRID, rp_signs
    from cdc_agents_data_stream_spark.queries.ml_queries import (
        EMB_DIM,
        RP_DIM,
        embedding_rp_project,
    )

    sf = "/root/testdata/sf0.001"
    df = embedding_rp_project(spark, sf)
    got = {r["vec_id"]: tuple(r[f"p{k}"] for k in range(RP_DIM)) for r in df.collect()}
    rows = duckdb.sql(
        f"SELECT vec_id, embedding FROM read_parquet('{sf}/embeddings.parquet')"
    ).fetchall()
    signs = rp_signs(EMB_DIM, RP_DIM)
    for vid, v in rows:
        micro = [round(float(x) * GRID) for x in v]
        want = tuple(
            sum(micro[i] * signs[i][k] for i in range(EMB_DIM)) for k in range(RP_DIM)
        )
        assert got[vid] == want, vid


def test_reconciliation_matches_fraction_replay(spark):
    """`order_total_reconciliation` vs an exact Fraction replay of the
    decimal triple product and the floored cent drift."""
    import math
    from fractions import Fraction

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.quality_queries import (
        order_total_reconciliation,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["o_orderstatus"]: (
            r["n_orders"],
            r["n_within_dollar"],
            r["total_abs_drift_cents"],
        )
        for r in order_total_reconciliation(spark, sf).collect()
    }
    lines = duckdb.sql(
        f"SELECT l_orderkey, l_extendedprice, l_discount, l_tax "
        f"FROM read_parquet('{sf}/lineitem.parquet')"
    ).fetchall()
    line_total = defaultdict(Fraction)

    def dec2(x):  # CAST(double AS DECIMAL(12,2)) — half-up on the cent grid
        return Fraction(math.floor(Fraction(x).limit_denominator(10**15) * 100 + Fraction(1, 2)), 100)

    for ok, price, disc, tax in lines:
        line_total[ok] += dec2(price) * (1 - dec2(disc)) * (1 + dec2(tax))
    orders = duckdb.sql(
        f"SELECT o_orderkey, o_totalprice, o_orderstatus FROM read_parquet('{sf}/orders.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0, 0])
    for ok, total, status in orders:
        diff = abs(dec2(total) - line_total.get(ok, Fraction(0)))
        cents = math.floor(diff * 100)
        a = acc[status]
        a[0] += 1
        a[1] += 1 if cents <= 100 else 0
        a[2] += cents
    assert got == {k: tuple(v) for k, v in acc.items()}


def test_equidepth_bins_match_bruteforce(spark):
    """`value_equidepth_bins` vs a deterministic NTILE(10) replay."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.window_queries import value_equidepth_bins

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_type"], r["bin"]): (r["n"], r["lo_cents"], r["hi_cents"])
        for r in value_equidepth_bins(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, event_id, CAST(ROUND(value * 100) AS BIGINT) "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for t, eid, c in rows:
        per[t].append((c, eid))
    want = {}
    for t, vals in per.items():
        vals.sort()
        n = len(vals)
        base, extra = divmod(n, 10)
        i = 0
        for b in range(1, 11):
            size = base + (1 if b <= extra else 0)
            if size == 0:
                continue
            chunk = vals[i : i + size]
            i += size
            want[(t, b)] = (size, min(c for c, _ in chunk), max(c for c, _ in chunk))
    assert got == want


def test_chunking_matches_bruteforce(spark):
    """`chunk_documents` vs a direct sliding-window replay (128-token
    chunks, stride 96, final-chunk rule included)."""
    import duckdb

    from cdc_agents_data_stream_spark.queries.text_queries import chunk_documents_q

    sf = "/root/testdata/sf0.001"
    df = chunk_documents_q(spark, sf)
    got = {
        (r["doc_id"], r["chunk_idx"]): (
            r["n_tokens"],
            r["start_tok"],
            r["chunk_text"],
            r["chunk_tokens"],
        )
        for r in df.collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    count = 0
    for doc_id, text in docs:
        toks = text.split(" ")
        n = len(toks)
        n_chunks = 1 + (max(n - 128, 0) + 95) // 96
        for k in range(n_chunks):
            start = k * 96
            chunk = toks[start : start + 128]
            want = (n, start, " ".join(chunk), min(128, max(n - start, 0)))
            assert got[(doc_id, k)] == want, (doc_id, k)
            count += 1
    assert len(got) == count


def test_shuffle_order_matches_hashlib(spark):
    """`shuffle_order_sample` vs a hashlib replay of the epoch-0
    permutation head (md5(id:seed) rank, doc_id tie-break)."""
    import hashlib

    import duckdb

    from cdc_agents_data_stream_spark.queries.sampling_queries import (
        shuffle_order_sample,
    )

    sf = "/root/testdata/sf0.001"
    got = [
        (r["rank"], r["doc_id"], r["lang"], r["shuffle_key"])
        for r in shuffle_order_sample(spark, sf).collect()
    ]
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    keyed = sorted(
        (
            int(hashlib.md5(f"{doc_id}:epoch0".encode()).hexdigest()[:15], 16),
            doc_id,
            lang,
        )
        for doc_id, lang in docs
    )
    want = [
        (rank, doc_id, lang, key)
        for rank, (key, doc_id, lang) in enumerate(keyed[:50], start=1)
    ]
    assert sorted(got) == want


def test_hourly_rollup_matches_bruteforce(spark):
    """`events_hourly_rollup` (tumbling window) vs direct hour-bucket
    accumulation on the exact micro grid."""
    import math

    import duckdb
    from collections import defaultdict
    from fractions import Fraction

    from cdc_agents_data_stream_spark.queries.window_queries import events_hourly_rollup

    sf = "/root/testdata/sf0.001"
    got = {
        (r["window_start_ms"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in events_hourly_rollup(spark, sf).collect()
    }
    rows = duckdb.sql(
        f"SELECT event_type, epoch_ms(ts) // 3600000, value "
        f"FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, Fraction(0)])
    for t, hr, v in rows:
        a = acc[(hr * 3600000, t)]
        a[0] += 1
        # CAST(double AS DECIMAL(18,6)): round-half-up at 6 dp
        a[1] += Fraction(
            math.floor(Fraction(v).limit_denominator(10**15) * 10**6 + Fraction(1, 2)),
            10**6,
        )
    assert got == {k: (n, float(sv)) for k, (n, sv) in acc.items()}


def test_decontam_matches_bruteforce(spark):
    """`decontam_overlap` vs direct 8-gram set intersection."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.sampling_queries import decontam_overlap

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_docs"], r["n_contaminated"])
        for r in decontam_overlap(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, lang, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()

    def grams(text):
        toks = text.split(" ")
        return {" ".join(toks[i : i + 8]) for i in range(max(len(toks) - 7, 0))}

    bench_grams = set()
    for doc_id, _, text in docs:
        if doc_id % 20 == 0:
            bench_grams |= grams(text)
    acc = defaultdict(lambda: [0, 0])
    for doc_id, lang, text in docs:
        if doc_id % 20 == 0:
            continue
        a = acc[lang]
        a[0] += 1
        a[1] += 1 if grams(text) & bench_grams else 0
    assert got == {k: tuple(v) for k, v in acc.items()}


def test_fixed_k_sample_matches_hashlib(spark):
    """`group_sample_fixed_k` vs a hashlib md5-rank replay."""
    import hashlib

    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.sampling_queries import (
        group_sample_fixed_k,
    )

    sf = "/root/testdata/sf0.001"
    got = [
        (r["event_type"], r["rnk"], r["event_id"])
        for r in group_sample_fixed_k(spark, sf).collect()
    ]
    rows = duckdb.sql(
        f"SELECT event_id, event_type FROM read_parquet('{sf}/events.parquet')"
    ).fetchall()
    per = defaultdict(list)
    for eid, t in rows:
        per[t].append((hashlib.md5(str(eid).encode()).hexdigest(), eid))
    want = []
    for t in sorted(per):
        for rnk, (_, eid) in enumerate(sorted(per[t])[:5], start=1):
            want.append((t, rnk, eid))
    assert got == want


def test_temperature_mix_matches_bruteforce(spark):
    """`temperature_mix_counts` vs a full replay: sqrt weights on the
    micro grid, the capped rate chain, and the md5 keep coin."""
    import hashlib
    import math

    import duckdb
    from collections import Counter

    from cdc_agents_data_stream_spark.queries.sampling_queries import (
        temperature_mix_counts,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        r["lang"]: (r["n_docs"], r["rate_micro"], r["n_kept"])
        for r in temperature_mix_counts(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id, lang FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    counts = Counter(lang for _, lang in docs)
    n_total = sum(counts.values())
    w_micro = {
        lang: round(math.sqrt(n / n_total) * 1e6) for lang, n in counts.items()
    }
    w_sum = sum(w_micro.values())
    rate = {
        lang: min(round(w_micro[lang] / w_sum * n_total / counts[lang] * 1e6), 1_000_000)
        for lang in counts
    }
    kept = Counter()
    for doc_id, lang in docs:
        coin = int(hashlib.md5(f"{doc_id}:t1".encode()).hexdigest()[:15], 16) % 1_000_000
        if coin < rate[lang]:
            kept[lang] += 1
    assert got == {
        lang: (counts[lang], rate[lang], kept[lang]) for lang in counts
    }


def test_contrastive_negatives_match_bruteforce(spark):
    """`contrastive_negatives` vs a direct Knuth-hash replay with the
    accidental-positive drop rule."""
    import duckdb

    from cdc_agents_data_stream_spark.operators.sampling import NEG_P1, NEG_P2
    from cdc_agents_data_stream_spark.queries.sampling_queries import (
        contrastive_negatives,
    )

    sf = "/root/testdata/sf0.001"
    df = contrastive_negatives(spark, sf)
    got = [tuple(r) for r in df.collect()]
    docs = dict(
        duckdb.sql(
            f"SELECT doc_id, n_chars FROM read_parquet('{sf}/documents.parquet')"
        ).fetchall()
    )
    n = len(docs)
    want = []
    for a in sorted(docs):
        for j in range(4):
            neg = (a * NEG_P1 + j * NEG_P2 + 17) % n
            if neg == a:
                continue  # accidental positive dropped
            want.append((a, j, neg, docs[neg]))
    assert sorted(got) == sorted(want)


def test_seq_length_distribution_matches_bruteforce(spark):
    """`seq_length_distribution` vs direct capped-subword bucketing."""
    import duckdb
    from collections import defaultdict

    from cdc_agents_data_stream_spark.queries.text_queries import seq_length_distribution

    sf = "/root/testdata/sf0.001"
    got = {
        (r["source"], r["len_bucket"]): (r["n_docs"], r["token_mass"])
        for r in seq_length_distribution(spark, sf).collect()
    }
    docs = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf}/documents.parquet')"
    ).fetchall()
    acc = defaultdict(lambda: [0, 0])
    for source, text in docs:
        n_sub = sum(min(-(-len(t) // 4), 8) for t in text.split(" "))
        a = acc[(source, n_sub // 256)]
        a[0] += 1
        a[1] += n_sub
    assert got == {k: tuple(v) for k, v in acc.items()}


def test_png_decode_matches_independent_encoder():
    """`multimodal_decode_real`'s decoder vs a PNG built by an
    INDEPENDENT in-test encoder (own chunk writer, hand-filtered
    scanlines: None / Up) — the decode must recover the hand-computed
    geometry and pixel sum from raw bytes, so an encode/decode pair
    with mutually-cancelling convention errors cannot pass."""
    import struct
    import zlib

    from cdc_agents_data_stream_spark.functions.pngcodec import decode_png

    def chunk(tag, payload):
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    # 2x2 gray: pixels [[10,20],[30,40]]; row0 filter None, row1 filter Up
    raw = bytes([0, 10, 20]) + bytes([2, 30 - 10, 40 - 20])
    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    meta = decode_png(data)
    assert (meta["width"], meta["height"], meta["pixel_sum"]) == (2, 2, 100)


def test_png_gate_pixels_match_closed_form():
    """The decode-real gate's per-doc pixel sum, replayed driver-side for
    a doc_id sample through the actual encode->decode path, vs the pure
    closed form the oracle uses."""
    from cdc_agents_data_stream_spark.functions.pngcodec import decode_png, encode_png
    from cdc_agents_data_stream_spark.operators.multimodal import decode_image_real

    for d in [0, 1, 12, 13, 142, 997, 4999]:
        w, h = 1 + d % 13, 1 + d % 11
        px = bytes((3 * x + 7 * y + d) % 256 for y in range(h) for x in range(w))
        data = encode_png(w, h, px)
        meta = decode_image_real(data)
        assert (meta["width"], meta["height"], meta["fmt"]) == (w, h, "png")
        want = sum((3 * x + 7 * y + d) % 256 for y in range(h) for x in range(w))
        assert decode_png(data)["pixel_sum"] == want


def test_ctx_clock_stamps_match_call_order():
    """`ctx_timestamp_stamp` kernel replay without Spark: the REAL
    providers under an injected counter clock must stamp creationTime in
    provider-list call order, transition must preserve the stamps
    verbatim next to its sequenceNumber, and the wall-clock default must
    never be consulted (a poisoned time.time would throw)."""
    from cdc_agents_data_stream_spark.ctx.providers import (
        make_environment_provider,
        make_test_report_provider,
    )
    from cdc_agents_data_stream_spark.operators.merge import transition

    for uid in [0, 3, 1499]:
        base = uid * 1000
        calls = {"n": 0}

        def clock():
            v = base + calls["n"]
            calls["n"] += 1
            return v

        providers = [
            make_environment_provider(clock=clock),
            make_test_report_provider([], clock=clock),
        ]
        sid = str(uid)
        item = {
            "task_id": "t",
            "content": "a",
            "timestamp": 1,
            "thread_id": sid,
            "checkpoint_id": "c1",
        }
        s1, _ = transition(None, sid, [item], ctx_providers=providers)
        s2, _ = transition(
            s1, sid, [dict(item, content="b", timestamp=2, checkpoint_id="c2")],
            ctx_providers=providers,
        )
        cts = [c["creationTime"] for c in s2["ctx"]]
        types = [c["type"] for c in s2["ctx"]]
        seqs = [c["sequenceNumber"] for c in s2["ctx"]]
        assert cts == [base, base + 1, base + 2, base + 3]
        assert types == ["environment", "test-report"] * 2
        assert seqs == [1, 1, 2, 2]
        assert calls["n"] == 4  # exactly one stamp per provider call


@pytest.mark.parametrize("seed", [5, 61])
def test_winsorize_matches_bruteforce_discrete(spark, seed):
    """`winsorize_stats`'s histogram-rank thresholds vs the direct
    definition on raw rows: sort each type's micro values, take the
    ceil(q*n)-th smallest (pure-integer rank), clip, count, sum. Heavy
    ties on purpose — every value is drawn from a 40-value grid, the
    exact regime where the interpolated-percentile form diverged between
    engines at the sf1 decade."""
    import datetime

    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.feature_queries as FQ

    rng = random.Random(seed)
    rows = []
    by_type = {}
    for i in range(3000):
        et = rng.choice(["click", "view", "error"])
        cents = rng.choice(range(0, 4000, 100))  # 40 distinct values
        rows.append(
            (i, datetime.datetime(2024, 1, 1), et, cents / 100.0)
        )
        by_type.setdefault(et, []).append(round(cents / 100.0 * 1e6))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        FQ.load = B.load
        got = {
            r["event_type"]: (
                r["n"], r["n_clip_low"], r["n_clip_high"], r["sum_clipped_micro"]
            )
            for r in FQ.winsorize_stats(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        FQ.load = orig

    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        p01 = vals[(n + 99) // 100 - 1]
        p99 = vals[(99 * n + 99) // 100 - 1]
        lo = sum(1 for v in vals if v < p01)
        hi = sum(1 for v in vals if v > p99)
        s = sum(min(max(v, p01), p99) for v in vals)
        assert got[et] == (n, lo, hi, s), et


@pytest.mark.parametrize("seed", [11, 47])
def test_state_reader_matches_pure_python_agg(spark, seed):
    """`stream_state_reader` cracks a committed streaming-agg checkpoint
    open via the State Data Source; the buffer rows must equal a pure
    dict-fold over the same synthetic feed (values generated on the cent
    grid, so the HALF_UP cent rounding is exact on both sides)."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.streaming_queries as S

    rng = random.Random(seed)
    rows = []
    for i in range(400):
        cents = rng.randint(-5000, 99999)
        rows.append((i % 37, rng.choice(["a", "b", "c", "d"]), cents / 100.0))
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")

    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        S.load = B.load
        got = {
            r["event_type"]: (r["n_events"], r["sum_cents"])
            for r in S.stream_state_reader(spark, "ignored").collect()
        }
    finally:
        B.load = orig
        S.load = orig

    want = {}
    for uid, et, v in rows:
        n, s = want.get(et, (0, 0))
        # exact: v is cents/100.0, so round(v*100) recovers the integer
        want[et] = (n + 1, s + round(v * 100))
    assert got == want


@pytest.mark.parametrize("seed", [13])
def test_observed_metrics_match_pure_python(spark, seed):
    """`observed_ingest_metrics`' CollectMetrics counters vs a direct
    fold over the same synthetic rows."""
    import cdc_agents_data_stream_spark.queries.base as B
    import cdc_agents_data_stream_spark.queries.sql_queries as Sq

    rng = random.Random(seed)
    rows = []
    for i in range(500):
        cents = rng.randint(-20000, 99999)
        rows.append((rng.randint(1, 1000), rng.choice(["x", "y"]), cents / 100.0))
    ev = spark.createDataFrame(rows, "user_id long, event_type string, value double")

    orig = B.load
    try:
        B.load = lambda _s, _d, _n: ev
        Sq.load = B.load
        r = Sq.observed_ingest_metrics(spark, "ignored").collect()[0]
    finally:
        B.load = orig
        Sq.load = orig

    assert r["n_rows"] == len(rows)
    assert r["sum_cents"] == sum(round(v * 100) for _, _, v in rows)
    assert r["n_negative"] == sum(1 for _, _, v in rows if v < 0)
    assert r["max_user_id"] == max(u for u, _, _ in rows)
