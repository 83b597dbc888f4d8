"""Incremental view maintenance: a continuous hourly aggregate.

The hypertable "continuous aggregate" pattern (TimescaleDB / Materialize
style) on Spark: each micro-batch computes its partial per-(window, type)
counts/sums — a partial aggregation over ONLY the batch — and merges them
ADDITIVELY into a keyed store, so the materialized rollup is always
queryable without rescanning history. Contrast with the append-mode
watermarked rollup (`stream_hourly_rollup`): IVM never drops late data and
never withholds open windows — a late row simply increments its window's
row, whenever it arrives.

Exactly-once: foreachBatch can replay a batch after a failure, and an
additive merge would double-count it. The rollup store therefore carries a
meta row (key ``__meta__``) holding the last applied batch id, committed
ATOMICALLY with the merged aggregates in the same store version — replayed
batches see their id already applied and become no-ops.

Scale shape: the per-batch partial agg shuffles only batch rows; the store
read is bucket-pruned to the keys the batch touches (hour windows × types —
a small set per batch by construction); the upsert rewrites only touched
buckets. State size is bounded by the number of live (window, type) keys,
not by row volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..state.store import ParquetStateStore

ROLLUP_SCHEMA = (
    "rollup_key string, win_start_ms long, event_type string, "
    "n_events long, sum_cents long"
)
_META_KEY = "__meta__"


class ContinuousRollup:
    """Incrementally-maintained hourly (window, event_type) rollup."""

    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 16):
        self.spark = spark
        self.store = ParquetStateStore(
            spark, path, n_buckets=n_buckets, schema=ROLLUP_SCHEMA
        )

    def _last_batch_id(self) -> int:
        keys = self.spark.createDataFrame([(_META_KEY,)], "rollup_key string")
        # bounded: single meta-key row (rollup_key == _META_KEY)
        rows = (
            self.store.read(keys=keys, key="rollup_key")
            .filter(F.col("rollup_key") == _META_KEY)
            .select("n_events")
            .collect()
        )
        return int(rows[0][0]) if rows else -1

    def merge_batch(self, batch: DataFrame, batch_id: int) -> bool:
        """Merge one micro-batch's partial aggregates; returns False when
        the batch id was already applied (replay no-op)."""
        if batch_id <= self._last_batch_id():
            return False
        part = (
            batch.groupBy(
                F.unix_millis(F.date_trunc("hour", F.col("ts"))).alias(
                    "win_start_ms"
                ),
                "event_type",
            )
            .agg(
                F.count("*").cast("long").alias("d_n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("d_cents"),
            )
            .withColumn(
                "rollup_key",
                F.concat_ws(":", F.col("win_start_ms"), F.col("event_type")),
            )
        )
        cur = self.store.read(
            keys=part.select("rollup_key"), key="rollup_key"
        ).filter(F.col("rollup_key") != _META_KEY)
        merged = (
            part.join(
                cur.select("rollup_key", "n_events", "sum_cents"),
                "rollup_key",
                "left",
            )
            .select(
                "rollup_key",
                "win_start_ms",
                "event_type",
                (F.coalesce("n_events", F.lit(0)) + F.col("d_n")).alias("n_events"),
                (F.coalesce("sum_cents", F.lit(0)) + F.col("d_cents")).alias(
                    "sum_cents"
                ),
            )
        )
        meta = self.spark.createDataFrame(
            [(_META_KEY, None, None, batch_id, None)], ROLLUP_SCHEMA
        )
        # one upsert = one store version: aggregates and the batch-id marker
        # commit atomically, so a replay after any crash point is a no-op
        self.store.upsert(merged.unionByName(meta), key="rollup_key")
        return True

    def read(self) -> DataFrame:
        return (
            self.store.read()
            .filter(F.col("rollup_key") != _META_KEY)
            .select("win_start_ms", "event_type", "n_events", "sum_cents")
        )


def incremental_join(
    batches_a: list[DataFrame],
    batches_b: list[DataFrame],
    on: str | list[str],
) -> DataFrame:
    """Delta-join view maintenance — the differential-dataflow identity
    that keeps a materialized JOIN current under inserts without ever
    re-joining history:

        ΔJ_t = ΔA_t ⋈ B_{t-1}  ∪  A_{t-1} ⋈ ΔB_t  ∪  ΔA_t ⋈ ΔB_t
        J_t  = J_{t-1} ∪ ΔJ_t

    Each step joins ONLY delta-sized operands against the accumulated
    other side (in production: bucket-pruned reads of the materialized
    side, exactly the ParquetStateStore shape), so per-batch cost scales
    with the batch and the join's selectivity, never with |A|·|B| or a
    history re-scan. Accumulated sides and the growing view are
    localCheckpoint-ed per step: the returned view is a union of
    materialized deltas, not a tower of re-executable joins.

    Insert-only (the CDC c-op); updates/deletes compose with the
    last-writer-wins envelope machinery upstream of the join."""
    keys = [on] if isinstance(on, str) else list(on)
    spark = batches_a[0].sparkSession
    acc_a = acc_b = view = None
    for da, db in zip(batches_a, batches_b):
        da = da.localCheckpoint()
        db = db.localCheckpoint()
        deltas = [da.join(db, keys)]
        if acc_b is not None:
            deltas.append(da.join(acc_b, keys))
        if acc_a is not None:
            deltas.append(acc_a.join(db, keys))
        dj = deltas[0]
        for d in deltas[1:]:
            dj = dj.unionByName(d)
        dj = dj.localCheckpoint()
        view = dj if view is None else view.unionByName(dj).localCheckpoint(eager=False)
        acc_a = da if acc_a is None else acc_a.unionByName(da).localCheckpoint(eager=False)
        acc_b = db if acc_b is None else acc_b.unionByName(db).localCheckpoint(eager=False)
    if view is None:
        raise ValueError("incremental_join needs at least one batch")
    return view
