"""The as-of kernel (operators/asof.py) against pandas ``merge_asof`` —
the de-facto reference for as-of semantics — over seeded random inputs:
backward and forward directions, left/inner modes, and the tolerance
post-filter. Equal-timestamp right rows: ``merge_asof`` keeps the LAST
positional row, the kernel keeps the greatest tiebreak — sorting the
pandas side by (ts, tiebreak) makes the two conventions coincide, which
is itself the documented contract."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from cdc_agents_data_stream_spark.operators.asof import asof_join


def _frames(seed: int):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 40),
            "lts": rng.integers(0, 30, 40).astype("int64"),
            "lid": np.arange(40, dtype="int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 30),
            "rts": rng.integers(0, 30, 30).astype("int64"),
            "payload": rng.integers(100, 200, 30).astype("int64"),
            "rid": np.arange(30, dtype="int64"),
        }
    )
    return left, right


def _spark_asof(spark, left, right, direction, how):
    l_df = spark.createDataFrame(left)
    r_df = spark.createDataFrame(right.rename(columns={"rts": "ts"}))
    out = asof_join(
        l_df,
        r_df.select("k", "ts", "payload", "rid"),
        on="k",
        left_ts="lts",
        right_ts="ts",
        right_payload=["payload", "rid"],
        right_tiebreak="rid",
        how=how,
        direction=direction,
    )
    return (
        out.select("k", "lts", "lid", "payload", "rid")
        .toPandas()
        .sort_values(["lid"])
        .reset_index(drop=True)
    )


def _pandas_asof(left, right, direction, how):
    # Tie alignment: among equal right timestamps merge_asof keeps the
    # LAST positional row going backward but the FIRST going forward, so
    # the rid sort flips per direction to coincide with the kernel's
    # greatest-tiebreak rule in both.
    r = right.sort_values(
        ["rts", "rid"], ascending=[True, direction == "backward"], kind="stable"
    )
    l_sorted = left.sort_values(["lts", "lid"], kind="stable")
    m = pd.merge_asof(
        l_sorted,
        r.rename(columns={"rts": "ts"}),
        left_on="lts",
        right_on="ts",
        by="k",
        direction=direction,
    )
    m = m[["k", "lts", "lid", "payload", "rid"]]
    if how == "inner":
        m = m[m["payload"].notna()]
    return m.sort_values(["lid"]).reset_index(drop=True)


@pytest.mark.parametrize("seed", [7, 19, 23])
@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_asof_matches_pandas_merge_asof(spark, seed, direction, how):
    left, right = _frames(seed)
    got = _spark_asof(spark, left, right, direction, how)
    want = _pandas_asof(left, right, direction, how)
    pd.testing.assert_frame_equal(
        got.astype({"payload": "float64", "rid": "float64"}),
        want.astype({"payload": "float64", "rid": "float64"}),
        check_dtype=False,
    )


@pytest.mark.parametrize("seed", [11])
def test_asof_tolerance_matches_pandas(spark, seed):
    """Tolerance: the kernel nulls matches staler than the horizon (the
    orders_asof_tolerance post-filter); pandas expresses the same via
    merge_asof(tolerance=...)."""
    left, right = _frames(seed)
    tol = 5
    got = _spark_asof(spark, left, right, "backward", "left")
    # apply the kernel's documented tolerance rule on the matched ts
    r_ts = right.set_index("rid")["rts"]
    got["match_ts"] = got["rid"].map(r_ts)
    stale = got["match_ts"].notna() & (got["match_ts"] < got["lts"] - tol)
    got.loc[stale, ["payload", "rid"]] = np.nan
    got = got.drop(columns=["match_ts"])

    r = right.sort_values(["rts", "rid"], kind="stable")
    want = pd.merge_asof(
        left.sort_values(["lts", "lid"], kind="stable"),
        r.rename(columns={"rts": "ts"}),
        left_on="lts",
        right_on="ts",
        by="k",
        direction="backward",
        tolerance=tol,
    )[["k", "lts", "lid", "payload", "rid"]].sort_values(["lid"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"payload": "float64", "rid": "float64"}),
        want.astype({"payload": "float64", "rid": "float64"}),
        check_dtype=False,
    )
