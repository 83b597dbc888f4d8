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
