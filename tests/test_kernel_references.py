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
