"""Tumbling-window rollup declared query with a DuckDB ``time_bucket``
oracle (both engines align buckets to the epoch origin)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.windows import tumbling_agg
from .base import Q, load, ms


def events_hourly_rollup(spark, sf_dir):
    return tumbling_agg(load(spark, sf_dir, "events"), "ts", "1 hour", ("event_type",), "value")


EVENTS_HOURLY_ROLLUP_SQL = """
SELECT epoch_ms(time_bucket(INTERVAL '1 hour', ts)) AS window_start_ms,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
GROUP BY 1, 2
"""


def user_sessionization(spark, sf_dir):
    from ..operators.windows import session_agg

    return session_agg(load(spark, sf_dir, "events"), "ts", "30 minutes", ("user_id",))


USER_SESSIONIZATION_SQL = """
WITH e AS (SELECT user_id, epoch_ms(ts) AS ts_ms FROM events),
marked AS (
  SELECT user_id, ts_ms,
         CASE WHEN LAG(ts_ms) OVER w IS NULL
                OR ts_ms - LAG(ts_ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
),
sessioned AS (
  SELECT user_id, ts_ms,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts_ms
                             ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id, MIN(ts_ms) AS session_start_ms, MAX(ts_ms) AS session_last_ms,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessioned GROUP BY user_id, sid
"""


QUERIES = {
    "events_hourly_rollup": Q(events_hourly_rollup, EVENTS_HOURLY_ROLLUP_SQL, "tumbling window"),
    "user_sessionization": Q(user_sessionization, USER_SESSIONIZATION_SQL, "session window"),
}


def skew_salted_join(spark, sf_dir):
    """events.event_type has ~5 values over the whole table — maximal key
    skew. The salted join spreads each hot key over 8 sub-keys; the result
    (and hence the oracle hash) is identical to the plain join."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from ..operators.skew import salted_join

    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    dim = (
        ev.select("event_type")
        .distinct()
        .withColumn(
            "type_code",
            F.row_number().over(Window.orderBy("event_type")).cast("bigint"),
        )
    )
    return salted_join(ev, dim, on="event_type", n_salts=8)


SKEW_SALTED_JOIN_SQL = """
WITH dim AS (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (ORDER BY event_type) AS BIGINT) AS type_code
  FROM (SELECT DISTINCT event_type FROM events)
)
SELECT e.event_id, e.event_type, d.type_code
FROM events e JOIN dim d ON e.event_type = d.event_type
"""

QUERIES["skew_salted_join"] = Q(skew_salted_join, SKEW_SALTED_JOIN_SQL, "salted skew join")


def user_daily_gapfill(spark, sf_dir):
    """Gap-filled per-user daily spend (operators/windows.py::
    time_gapfill): every day between a user's first and last event exists,
    gap days carry the previous day's total (LOCF) and are flagged."""
    from ..operators.windows import time_gapfill

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        ms("ts").alias("t_ms"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return time_gapfill(ev, "user_id", "t_ms", "cents").select(
        "user_id",
        "bucket_idx",
        "filled_val",
        F.col("is_gap").cast("int").alias("is_gap"),
    )


USER_DAILY_GAPFILL_SQL = """
WITH obs AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS bucket_idx,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS bucket_val
  FROM events GROUP BY user_id, epoch_ms(ts) // 86400000
),
grid AS (
  SELECT user_id, unnest(range(lo, hi + 1)) AS bucket_idx
  FROM (SELECT user_id, MIN(bucket_idx) AS lo, MAX(bucket_idx) AS hi
        FROM obs GROUP BY user_id)
),
j AS (
  SELECT g.user_id, g.bucket_idx, o.bucket_val
  FROM grid g LEFT JOIN obs o USING (user_id, bucket_idx)
)
SELECT user_id, CAST(bucket_idx AS BIGINT) AS bucket_idx,
       CAST(last_value(bucket_val IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY bucket_idx
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS filled_val,
       CAST(bucket_val IS NULL AS INT) AS is_gap
FROM j
"""

QUERIES["user_daily_gapfill"] = Q(
    user_daily_gapfill, USER_DAILY_GAPFILL_SQL, "time_bucket gapfill + LOCF"
)
