"""As-of join unit semantics: inclusivity, tie-break, left-vs-inner, and
one-shuffle plan shape."""

from __future__ import annotations

from cdc_agents_data_stream_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 100, "o1"), ("u1", 200, "o2"), ("u1", 50, "o0"), ("u2", 100, "o3")],
        "k string, lts long, order_id string",
    )
    right = spark.createDataFrame(
        [("u1", 100, 1, "a"), ("u1", 100, 2, "b"), ("u1", 150, 3, "c"), ("u3", 10, 4, "d")],
        "k string, rts long, eid int, payload string",
    )
    return left, right


def test_asof_inclusive_latest_and_tiebreak(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["eid", "payload"], right_tiebreak="eid",
    )
    rows = {r["order_id"]: r for r in out.collect()}
    # exact match is inclusive; tie at ts=100 resolves to max eid
    assert rows["o1"]["eid"] == 2 and rows["o1"]["payload"] == "b"
    # later left row picks the newer right row
    assert rows["o2"]["eid"] == 3
    # left rows before any right row drop under inner semantics
    assert "o0" not in rows and "o3" not in rows


def test_asof_left_join_keeps_unmatched(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["eid", "payload"], right_tiebreak="eid", how="left",
    )
    rows = {r["order_id"]: r for r in out.collect()}
    assert set(rows) == {"o0", "o1", "o2", "o3"}
    assert rows["o0"]["eid"] is None
    assert rows["o3"]["eid"] is None


def test_asof_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["eid"], right_tiebreak="eid",
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the union+window encoding must not produce a join (no range explosion)
    assert "Join" not in plan
    assert plan.count("Exchange") == 1


def test_asof_forward_picks_next_at_or_after(spark):
    from cdc_agents_data_stream_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 250, "b"), (2, 50, "c")], "k long, lts long, tag string"
    )
    right = spark.createDataFrame(
        [(1, 100, 10), (1, 200, 20), (1, 300, 30), (2, 40, 40)],
        "k long, rts long, payload long",
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["payload", "rts"], how="left", direction="forward",
    )
    got = {(r["k"], r["lts"]): (r["payload"], r["rts"]) for r in out.collect()}
    assert got[(1, 100)] == (10, 100)   # inclusive: equal ts matches
    assert got[(1, 250)] == (30, 300)   # next at-or-after
    assert got[(2, 50)] == (None, None) # nothing after -> left keeps nulls


def test_asof_forward_equal_ts_tiebreak_greatest(spark):
    from cdc_agents_data_stream_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, lts long")
    right = spark.createDataFrame(
        [(1, 100, 7), (1, 100, 9)], "k long, rts long, tb long"
    )
    out = asof_join(
        left, right, on="k", left_ts="lts", right_ts="rts",
        right_payload=["tb"], right_tiebreak="tb", direction="forward",
    )
    assert out.collect()[0]["tb"] == 9
