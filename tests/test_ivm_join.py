"""Delta-join view maintenance: the maintained view must equal the
one-shot join, with every delta term exercised."""

from __future__ import annotations

from cdc_agents_data_stream_spark.streaming.ivm import incremental_join


def test_incremental_join_equals_full_join(spark):
    a = spark.createDataFrame(
        [(k, f"a{k}") for k in range(12)], "k long, pa string"
    )
    b = spark.createDataFrame(
        [(k, j, f"b{k}-{j}") for k in range(12) for j in range(2)],
        "k long, j long, pb string",
    )
    # independent splits: a by k%3, b by (k//3)%3 -> cross-batch matches
    batches_a = [a.filter(a.k % 3 == i) for i in range(3)]
    batches_b = [b.filter((b.k / 3).cast("long") % 3 == i) for i in range(3)]
    view = incremental_join(batches_a, batches_b, on="k")
    full = a.join(b, "k")
    assert sorted(map(tuple, view.collect())) == sorted(map(tuple, full.collect()))


def test_incremental_join_cross_batch_terms_nonempty(spark):
    # key 4: a-batch 1 (4%3), b-batch 1 ((4//3)%3) -> same; key 5: a-batch 2,
    # b-batch 1 -> b arrives BEFORE a -> exercises acc_b term; key 3:
    # a-batch 0, b-batch 1 -> a before b -> exercises acc_a term.
    a = spark.createDataFrame([(3, "x"), (5, "y")], "k long, pa string")
    b = spark.createDataFrame([(3, "u"), (5, "v")], "k long, pb string")
    batches_a = [a.filter(a.k % 3 == i) for i in range(3)]
    batches_b = [b.filter((b.k / 3).cast("long") % 3 == i) for i in range(3)]
    view = incremental_join(batches_a, batches_b, on="k")
    got = sorted(map(tuple, view.collect()))
    assert got == [(3, "x", "u"), (5, "y", "v")]


def test_incremental_join_single_batch(spark):
    a = spark.createDataFrame([(1, "x")], "k long, pa string")
    b = spark.createDataFrame([(1, "u"), (2, "w")], "k long, pb string")
    view = incremental_join([a], [b], on="k")
    assert [tuple(r) for r in view.collect()] == [(1, "x", "u")]


import random

import pytest


@pytest.mark.parametrize("seed", [3, 19])
def test_incremental_join_randomized_batches(spark, seed):
    rng = random.Random(seed)
    a_rows = [(rng.randrange(20), i) for i in range(60)]
    b_rows = [(rng.randrange(20), 100 + i) for i in range(80)]
    a = spark.createDataFrame(a_rows, "k long, pa long")
    b = spark.createDataFrame(b_rows, "k long, pb long")
    # random batch assignment on each side, independent of the key
    na, nb = rng.randint(2, 4), rng.randint(2, 4)
    n = max(na, nb)
    batches_a = [a.filter((a.pa % n) == i) for i in range(n)]
    batches_b = [b.filter((b.pb % n) == i) for i in range(n)]
    view = incremental_join(batches_a, batches_b, on="k")
    full = a.join(b, "k")
    assert sorted(map(tuple, view.collect())) == sorted(map(tuple, full.collect()))
