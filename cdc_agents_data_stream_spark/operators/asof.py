"""As-of (point-in-time) join.

The reference approximates "as of" with latest-row-<=-now per key
(dao/CheckpointDao.java:41-43, the staleness predicate X3); this operator
generalizes it to a full point-in-time join between two event streams —
the canonical training-data use ("state of X when Y happened").

Spark has no ASOF JOIN operator; the naive encoding
``l JOIN r ON key AND r.ts <= l.ts`` + argmax explodes quadratically per
key. This implementation uses the union + running-last trick:

1. tag right rows 0 and left rows 1, union them on a common schema;
2. one hash shuffle on the key, sort each partition group by
   ``(ts, tag, tiebreak)`` — right rows sort before left rows at equal ts
   so exact matches are visible (inclusive semantics, like DuckDB's
   ASOF JOIN and pandas ``merge_asof``);
3. a running ``last(right_payload, ignorenulls=True)`` window carries the
   most recent right row forward onto every left row;
4. keep the left rows.

Cost: ONE shuffle + one sort — the same as a regular sort-merge join, with
no range expansion. Skewed keys behave like any skewed window (salt the
key or split hot keys by time range when a single key's history outgrows a
partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    right_tiebreak: str | None = None,
    how: str = "inner",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` on the same key (inclusive). ``how='left'``
    keeps left rows with no prior right row (payload nulls).

    ``right_tiebreak``: column ordering right rows that share a timestamp;
    the greatest wins (deterministic across engines).

    ``direction='forward'`` flips the semantics to the NEXT right row with
    ``right_ts >= left_ts`` (pandas ``merge_asof`` direction-forward): the
    merge scan simply runs time-descending, so the cost is the identical
    one shuffle + one sort.
    """
    keys = [on] if isinstance(on, str) else list(on)
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    rcols = list(right_payload)

    l_tagged = left.select(
        *keys,
        F.col(left_ts).alias("_asof_ts"),
        F.lit(1).alias("_asof_src"),
        F.lit(None).cast("long").alias("_asof_tb"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in rcols],
    )
    tb = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    r_tagged = right.select(
        *keys,
        F.col(right_ts).alias("_asof_ts"),
        F.lit(0).alias("_asof_src"),
        tb.alias("_asof_tb"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in rcols],
    )
    unioned = l_tagged.unionByName(r_tagged)

    ts_order = (
        F.col("_asof_ts").desc() if direction == "forward" else F.col("_asof_ts").asc()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_asof_src").asc(), F.col("_asof_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *keys,
        "_asof_ts",
        "_asof_src",
        *[F.col(c) for c in lcols],
        *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"_r_{c}") for c in rcols],
    )
    out = carried.filter(F.col("_asof_src") == 1).select(
        *keys,
        F.col("_asof_ts").alias(left_ts),
        *[F.col(c) for c in lcols],
        *[F.col(f"_r_{c}").alias(c) for c in rcols],
    )
    if how == "inner":
        out = out.filter(F.col(rcols[0]).isNotNull())
    return out


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: str | list[str],
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Range (interval) join: each point row matched to every interval row
    with the same key and ``start_ts <= point_ts < end_ts`` (timestamps as
    epoch-millis columns).

    The naive encoding — an equi-join on the key with the range predicate
    as a join condition — degenerates: Catalyst keeps the hash join on the
    key but a hot key devolves to per-key quadratic probing, and with NO
    equi-key at all it picks BroadcastNestedLoopJoin. This implementation
    buckets time at a fixed granularity: intervals explode into the
    buckets they overlap (bounded fan-out = len/bucket + 1), points map to
    exactly one bucket, and the join runs as a plain (key, bucket)
    equi-join Catalyst hash-partitions — the standard range-bucketing
    rewrite (cf. Spark's own range-join hints in Databricks runtime, and
    interval joins in Flink). Refinement re-checks the exact range, so
    results are identical to the naive form; pick ``bucket_ms`` near the
    typical interval length so fan-out stays O(1).
    """
    keys = [on] if isinstance(on, str) else list(on)
    b = F.lit(bucket_ms).cast("long")
    ivals = intervals.withColumn(
        "_rj_bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_ts) / b).cast("long"),
                # end is exclusive: the last overlapped bucket is the one
                # containing end-1
                F.floor((F.col(end_ts) - 1) / b).cast("long"),
            )
        ),
    )
    pts = points.withColumn("_rj_bucket", F.floor(F.col(point_ts) / b).cast("long"))
    return (
        pts.join(ivals, keys + ["_rj_bucket"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("_rj_bucket")
    )
