"""Skew mitigation: salted join.

AQE's skew-join handling splits oversized *shuffle* partitions at runtime,
but it cannot help when the plan is streaming (AQE off), when the skew is
in a broadcast-ineligible dimension, or when a single key's rows must
co-group (stateful ops). The classic remedy is salting: spread the hot
key's rows across ``n_salts`` sub-keys and replicate the small side once
per salt, turning one hot partition into ``n_salts`` even ones.

Cost model: big side gains one narrow projection (deterministic row-hash
salt); small side is replicated ``n_salts``× (fine — it is small by
assumption); the join result is byte-identical to the unsalted join (the
oracle-checked query asserts exactly that).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    sub-keys. Semantically identical to ``big.join(small, on, how)``.

    The salt is a deterministic hash of the big row's full content, so the
    same input always produces the same physical distribution (replayable
    plans, stable tests) without skew-correlated bias."""
    keys = [on] if isinstance(on, str) else list(on)
    big_s = big.withColumn("_salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    small_s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<bigint>"))
    )
    return big_s.join(small_s, keys + ["_salt"], how).drop("_salt")
