"""Event-time tumbling windows + watermark wrapper.

The reference has no windowed aggregation (SURVEY §2.9: "no
tumbling/sliding/session windows, no watermark mechanism") — its only
event-time construct is the manual staleness predicate X3. A lake-scale
engine needs the real thing: bucketed event-time rollups in batch, and the
same plan under a watermark in streaming so state is bounded and late data
is dropped by the engine rather than by hand-written timestamp guards.

``F.window`` buckets align to the epoch origin, matching DuckDB/Postgres
``time_bucket`` for the oracle. Aggregates follow the cross-engine hash
rules (exact decimal sums, bigint counts).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Tumbling event-time rollup: count + exact-decimal sum per
    (window, keys). One shuffle on (window, keys) with map-side partial
    aggregation; at scale, partition the lake table by a date column so
    the window grouping reads pruned partitions."""
    win = F.window(F.col(ts_col), window)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            # cast tolerates TIMESTAMP_NTZ inputs (session TZ is UTC, so the
            # re-tag is an identity)
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("window_start_ms"),
            *keys,
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    keys: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Gap-based sessionization: consecutive events of a key belong to one
    session while the inter-event gap is <= ``gap`` (inclusive — verified
    against Spark's merge semantics; an event exactly ``gap`` after the
    previous one still merges). Emits per-session start/last timestamps
    and the event count.

    ``F.session_window`` is Spark's native implementation — in streaming
    it composes with ``withWatermark`` for bounded state; the oracle
    reproduces it with the gaps-and-islands pattern (lag + running sum).
    """
    win = F.session_window(F.col(ts_col), gap)
    return (
        df.groupBy(win.alias("w"), *keys)
        .agg(F.count("*").cast("bigint").alias("n_events"), F.max(ts_col).alias("_last"))
        .select(
            *keys,
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("session_start_ms"),
            F.unix_millis(F.col("_last").cast("timestamp")).alias("session_last_ms"),
            "n_events",
        )
    )


def watermarked_tumbling_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    delay: str = "30 minutes",
    keys: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """The same rollup under a watermark: Spark finalizes a window once
    event time passes ``window end + delay``, emits it (append mode), and
    drops later-arriving rows for it — the engine-level version of the
    reference's manual X3 staleness drop, with bounded state."""
    return tumbling_agg(
        stream.withWatermark(ts_col, delay), ts_col, window, keys, value_col
    )


def time_gapfill(
    df: DataFrame,
    key_col: str,
    ts_ms_col: str,
    value_col: str,
    step_ms: int = 86_400_000,
) -> DataFrame:
    """Gap-filled time series with last-observation-carried-forward — the
    hypertable ``time_bucket_gapfill`` + ``locf`` shape: per key, every
    ``step_ms`` bucket between that key's first and last observation
    exists in the output; buckets without data carry the previous
    bucket's aggregate and are flagged ``is_gap``.

    Shape: one partial-aggregated rollup to (key, bucket), a tiny per-key
    min/max, grid generation by ``sequence`` explode (fan-out = series
    length, the SEMANTIC output size), then a single window pass for the
    carry-forward — two key-partitioned shuffles total, reusable between
    the rollup and the window."""
    from pyspark.sql.window import Window

    bucket = F.floor(F.col(ts_ms_col) / step_ms).cast("long")
    obs = (
        df.select(F.col(key_col), bucket.alias("bucket_idx"), F.col(value_col))
        .groupBy(key_col, "bucket_idx")
        .agg(F.sum(value_col).cast("long").alias("bucket_val"))
    )
    grid = (
        obs.groupBy(key_col)
        .agg(F.min("bucket_idx").alias("_lo"), F.max("bucket_idx").alias("_hi"))
        .select(
            F.col(key_col),
            F.explode(F.sequence(F.col("_lo"), F.col("_hi"))).alias("bucket_idx"),
        )
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(obs, [key_col, "bucket_idx"], "left")
        .select(
            F.col(key_col),
            "bucket_idx",
            F.last("bucket_val", ignorenulls=True).over(w).alias("filled_val"),
            F.col("bucket_val").isNull().alias("is_gap"),
        )
    )
