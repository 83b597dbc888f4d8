"""Tumbling-window rollup declared query with a DuckDB ``time_bucket``
oracle (both engines align buckets to the epoch origin)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

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


def funnel_conversion(spark, sf_dir):
    """Ordered conversion funnel: signup → first click at-or-after the
    signup → first purchase at-or-after that click, one row per stage
    with the surviving user count. Three aggregations all keyed on
    ``user_id`` — the exchanges reuse one partitioning — and each stage's
    min-timestamp artifact is user-count-sized."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", ms("ts").alias("ts_ms")
    )
    su = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("s_ms"))
    )
    cl = (
        ev.filter(F.col("event_type") == "click")
        .join(su, "user_id")
        .filter(F.col("ts_ms") >= F.col("s_ms"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("c_ms"))
    )
    pu = (
        ev.filter(F.col("event_type") == "purchase")
        .join(cl, "user_id")
        .filter(F.col("ts_ms") >= F.col("c_ms"))
        .groupBy("user_id")
        .agg(F.min("ts_ms").alias("p_ms"))
    )
    stages = [
        su.agg(F.lit("1_signup").alias("stage"), F.count("*").cast("long").alias("n_users")),
        cl.agg(F.lit("2_click_after_signup").alias("stage"), F.count("*").cast("long").alias("n_users")),
        pu.agg(F.lit("3_purchase_after_click").alias("stage"), F.count("*").cast("long").alias("n_users")),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionAll(s)
    return out.orderBy("stage")


FUNNEL_CONVERSION_SQL = """
WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
su AS (SELECT user_id, MIN(ts_ms) AS s_ms FROM e
       WHERE event_type = 'signup' GROUP BY user_id),
cl AS (SELECT e.user_id, MIN(e.ts_ms) AS c_ms
       FROM e JOIN su USING (user_id)
       WHERE e.event_type = 'click' AND e.ts_ms >= su.s_ms
       GROUP BY e.user_id),
pu AS (SELECT e.user_id, MIN(e.ts_ms) AS p_ms
       FROM e JOIN cl USING (user_id)
       WHERE e.event_type = 'purchase' AND e.ts_ms >= cl.c_ms
       GROUP BY e.user_id)
SELECT * FROM (
  SELECT '1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM su
  UNION ALL
  SELECT '2_click_after_signup', CAST(COUNT(*) AS BIGINT) FROM cl
  UNION ALL
  SELECT '3_purchase_after_click', CAST(COUNT(*) AS BIGINT) FROM pu
)
ORDER BY stage
"""

QUERIES["funnel_conversion"] = Q(
    funnel_conversion, FUNNEL_CONVERSION_SQL, "ordered signup→click→purchase funnel"
)


def user_active_streaks(spark, sf_dir):
    """Gaps-and-islands: longest run of consecutive active days per user.

    The classic idiom — ``day_idx - row_number()`` is constant within a
    consecutive run, so one user-keyed window plus one group-by collapses
    runs without any self-join or iteration. Integer day buckets
    (epoch_ms DIV 1d) keep both engines on the same grid.

    Scale note: everything is keyed on user_id — the distinct, the
    window, and both aggregations reuse a single hash partitioning; no
    run can span partitions.
    """
    day = F.expr("t_ms DIV 86400000")
    days = (
        load(spark, sf_dir, "events")
        .select("user_id", ms("ts").alias("t_ms"))
        .select("user_id", day.cast("long").alias("day_idx"))
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    runs = (
        days.withColumn("grp", F.col("day_idx") - F.row_number().over(w))
        .groupBy("user_id", "grp")
        .agg(
            F.count("*").cast("bigint").alias("streak_len"),
            F.min("day_idx").alias("start_day"),
        )
    )
    best = Window.partitionBy("user_id").orderBy(
        F.col("streak_len").desc(), F.col("start_day").asc()
    )
    return (
        runs.withColumn("rn", F.row_number().over(best))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("streak_len"))).alias("best_streak"),
            F.max(F.when(F.col("rn") == 1, F.col("start_day"))).alias("best_start_day"),
            F.count("*").cast("bigint").alias("n_streaks"),
            F.sum("streak_len").cast("bigint").alias("active_days"),
        )
    )


USER_ACTIVE_STREAKS_SQL = """
WITH days AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day_idx
  FROM events
), runs AS (
  SELECT user_id,
         day_idx - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day_idx) AS grp,
         day_idx
  FROM days
), agg AS (
  SELECT user_id, grp,
         CAST(COUNT(*) AS BIGINT) AS streak_len,
         MIN(day_idx) AS start_day
  FROM runs GROUP BY user_id, grp
), ranked AS (
  SELECT user_id, streak_len, start_day,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY streak_len DESC, start_day ASC) AS rn
  FROM agg
)
SELECT user_id,
       MAX(CASE WHEN rn = 1 THEN streak_len END) AS best_streak,
       CAST(MAX(CASE WHEN rn = 1 THEN start_day END) AS BIGINT) AS best_start_day,
       CAST(COUNT(*) AS BIGINT) AS n_streaks,
       CAST(SUM(streak_len) AS BIGINT) AS active_days
FROM ranked GROUP BY user_id
"""


QUERIES["user_active_streaks"] = Q(
    user_active_streaks, USER_ACTIVE_STREAKS_SQL, "gaps-and-islands longest streak"
)


def interval_union_coverage(spark, sf_dir):
    """Interval coalescing: merge each user's overlapping activity
    intervals and measure the union.

    Each event occupies ``[t_ms, t_ms + cents·1000)`` (value-scaled
    duration on the exact cents grid). The classic running-max idiom: an
    interval starts a new island iff its start exceeds the max end of
    all earlier intervals; a cumulative sum of those flags numbers the
    islands — no self-join, no recursion. Covered time is then a plain
    per-island ``max(end) − min(start)``.

    Scale note: one user-keyed sort-window pass plus two aggregations on
    the same user_id partitioning; intervals never leave their
    partition.
    """
    iv = load(spark, sf_dir, "events").select(
        "user_id",
        ms("ts").alias("start_ms"),
        (ms("ts") + F.round(F.col("value") * 100).cast("long") * 1000).alias("end_ms"),
    )
    w = Window.partitionBy("user_id").orderBy("start_ms", "end_ms")
    prev_max = F.max("end_ms").over(w.rowsBetween(Window.unboundedPreceding, -1))
    islands = (
        iv.withColumn(
            "new_island",
            F.when(prev_max.isNull() | (F.col("start_ms") > prev_max), 1).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "island")
        .agg(
            (F.max("end_ms") - F.min("start_ms")).alias("span_ms"),
            F.count("*").cast("bigint").alias("n_merged"),
        )
    )
    return islands.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_islands"),
        F.sum("span_ms").cast("bigint").alias("covered_ms"),
        F.max("span_ms").cast("bigint").alias("longest_island_ms"),
        F.max("n_merged").alias("max_merged"),
    )


INTERVAL_UNION_COVERAGE_SQL = """
WITH iv AS (
  SELECT user_id, epoch_ms(ts) AS start_ms,
         epoch_ms(ts) + CAST(ROUND(value * 100) AS BIGINT) * 1000 AS end_ms
  FROM events
), flagged AS (
  SELECT user_id, start_ms, end_ms,
         CASE WHEN MAX(end_ms) OVER (PARTITION BY user_id ORDER BY start_ms, end_ms
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                OR start_ms > MAX(end_ms) OVER (PARTITION BY user_id ORDER BY start_ms, end_ms
                                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS new_island
  FROM iv
), numbered AS (
  SELECT user_id, start_ms, end_ms,
         SUM(new_island) OVER (PARTITION BY user_id ORDER BY start_ms, end_ms
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
), islands AS (
  SELECT user_id, island,
         MAX(end_ms) - MIN(start_ms) AS span_ms,
         CAST(COUNT(*) AS BIGINT) AS n_merged
  FROM numbered GROUP BY user_id, island
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(span_ms) AS BIGINT) AS covered_ms,
       CAST(MAX(span_ms) AS BIGINT) AS longest_island_ms,
       MAX(n_merged) AS max_merged
FROM islands GROUP BY user_id
"""


QUERIES["interval_union_coverage"] = Q(
    interval_union_coverage, INTERVAL_UNION_COVERAGE_SQL, "interval coalescing / union length"
)


def cohort_retention(spark, sf_dir):
    """Weekly retention cohorts: users grouped by epoch-aligned signup
    week, counted per later activity-week offset — the classic retention
    triangle. Integer week arithmetic (epoch_ms // 1w) keeps both engines
    on the same grid; two user-keyed aggregations plus one count-distinct
    rollup per (cohort, offset)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        # true integer DIV — float divide-then-cast can straddle a week
        # boundary after double rounding
        F.expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 604800000").alias("week"),
    )
    cohort = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("week").alias("cohort_week"))
    )
    act = ev.select("user_id", "week").distinct()
    return (
        act.join(cohort, "user_id")
        .filter(F.col("week") >= F.col("cohort_week"))
        .groupBy("cohort_week", (F.col("week") - F.col("cohort_week")).alias("week_offset"))
        .agg(F.countDistinct("user_id").cast("long").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


COHORT_RETENTION_SQL = """
WITH e AS (SELECT user_id, event_type,
                  epoch_ms(ts) // 604800000 AS week FROM events),
cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM e
           WHERE event_type = 'signup' GROUP BY user_id),
act AS (SELECT DISTINCT user_id, week FROM e)
SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
       CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_users
FROM act a JOIN cohort c USING (user_id)
WHERE a.week >= c.cohort_week
GROUP BY c.cohort_week, week_offset
ORDER BY c.cohort_week, week_offset
"""

QUERIES["cohort_retention"] = Q(
    cohort_retention, COHORT_RETENTION_SQL, "weekly signup-cohort retention triangle"
)


def user_rolling_7d(spark, sf_dir):
    """Event-time RANGE-frame rolling aggregate: for every event, the
    user's trailing-7-day event count and micro-unit value sum
    ([ts−7d, ts], peers included — RANGE, not ROWS). One user-keyed
    shuffle + sort; the frame is evaluated streamingly within each
    partition, so a year of history per user costs one pass."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        F.round(F.col("value") * 1e6).cast("long").alias("v_micro"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-604800000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        F.count("*").over(w).cast("long").alias("n_7d"),
        F.sum("v_micro").over(w).cast("long").alias("sum_micro_7d"),
    ).orderBy("event_id")


USER_ROLLING_7D_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events
)
SELECT event_id, user_id, ts_ms,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_7d,
       CAST(SUM(v_micro) OVER w AS BIGINT) AS sum_micro_7d
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms
             RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
ORDER BY event_id
"""

QUERIES["user_rolling_7d"] = Q(
    user_rolling_7d, USER_ROLLING_7D_SQL, "trailing-7-day RANGE-frame rolling aggregate"
)


def event_pattern_match(spark, sf_dir):
    """MATCH_RECOGNIZE-style sequence pattern detection: each user's
    event history becomes one ordered symbol string (event types map to
    their distinct first letters: c/e/p/s/v), and a regex counts the
    non-overlapping view+→click*→purchase runs — the row-pattern-match
    shape (Flink/Oracle MATCH_RECOGNIZE) expressed as grouped ordered
    collect + codegen regexp. One user-keyed shuffle; the per-user
    symbol string is bounded by the user's own history, and the regex
    runs JVM-side. Tie-break on (ts_ms, event_id) makes the string —
    and therefore every downstream count — deterministic cross-engine."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        ms("ts").alias("ts_ms"),
        F.substring("event_type", 1, 1).alias("code"),
    )
    seq = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("ts_ms", "event_id", "code"))),
                    lambda s: s["code"],
                ),
                "",
            ).alias("seq"),
            F.count("*").cast("long").alias("n_events"),
        )
    )
    return seq.select(
        "user_id",
        "seq",
        "n_events",
        F.coalesce(F.regexp_count("seq", F.lit("v+c*p")), F.lit(0))
        .cast("long")
        .alias("n_funnel_runs"),
    ).orderBy("user_id")


EVENT_PATTERN_MATCH_SQL = """
WITH s AS (
  SELECT user_id,
         string_agg(substr(event_type, 1, 1), '' ORDER BY epoch_ms(ts), event_id) AS seq,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id
)
SELECT user_id, seq, n_events,
       CAST(len(regexp_extract_all(seq, 'v+c*p')) AS BIGINT) AS n_funnel_runs
FROM s ORDER BY user_id
"""

QUERIES["event_pattern_match"] = Q(
    event_pattern_match,
    EVENT_PATTERN_MATCH_SQL,
    "row-pattern (MATCH_RECOGNIZE-style) funnel-run counting over ordered per-user event strings",
)


def events_sliding_rollup(spark, sf_dir):
    """Sliding (hopping) window rollup — 1-hour windows every 15 minutes,
    so each event contributes to exactly 4 overlapping windows. Spark
    assigns all four in one codegen projection (`F.window` with a slide
    emits the window array inline — no self-join); the shuffle is the
    same single partial-agg groupBy as the tumbling case, just with 4×
    the (window, type) key volume. The oracle reconstructs the window
    set by exploding the 4 slide offsets per event."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").cast("long").alias("n_events"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        )
        .select(
            F.unix_millis(F.col("w.start").cast("timestamp")).alias("win_start_ms"),
            "event_type",
            "n_events",
            "sum_cents",
        )
        .orderBy("win_start_ms", "event_type")
    )


EVENTS_SLIDING_ROLLUP_SQL = """
WITH w AS (
  SELECT epoch_ms(time_bucket(INTERVAL '15 minutes', ts)) - k.k * 900000 AS win_start_ms,
         event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events, UNNEST([0, 1, 2, 3]) AS k(k)
)
SELECT win_start_ms, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM w
GROUP BY win_start_ms, event_type
ORDER BY win_start_ms, event_type
"""

QUERIES["events_sliding_rollup"] = Q(
    events_sliding_rollup,
    EVENTS_SLIDING_ROLLUP_SQL,
    "1-hour windows sliding every 15 minutes (4 windows per event, no self-join)",
)


def event_value_histogram(spark, sf_dir):
    """Equi-width histogram of `value` per event type (20 buckets of 5):
    the profiling primitive behind distribution drift checks. Bucketing
    is one codegen floor-divide (both engines floor the same IEEE
    double), counting one partial-agg groupBy — shuffle rows bounded by
    types × buckets regardless of input size."""
    ev = load(spark, sf_dir, "events")
    bucket = F.least(
        F.greatest(F.floor(F.col("value") / 5).cast("long"), F.lit(0)), F.lit(19)
    )
    return (
        ev.groupBy("event_type", bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("event_type", "bucket")
    )


EVENT_VALUE_HISTOGRAM_SQL = """
SELECT event_type,
       CAST(LEAST(GREATEST(FLOOR(value / 5), 0), 19) AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY 1, 2
ORDER BY event_type, bucket
"""

QUERIES["event_value_histogram"] = Q(
    event_value_histogram,
    EVENT_VALUE_HISTOGRAM_SQL,
    "bounded equi-width value histogram per event type",
)


def user_value_twap(spark, sf_dir):
    """Time-weighted average value per user (the TWAP/VWAP shape): each
    event's value is weighted by how long it remained current (gap to the
    user's next event; the last event carries zero weight — a closed-
    interval convention both engines share). Exact integer arithmetic:
    micro-unit values × SECOND-granularity durations summed in DECIMAL,
    cast to exact BIGINTs, one BIGINT integer division at the end —
    decimal DIV itself is NOT portable (Spark's decimal division rounds
    at an intermediate scale; measured a 1-ulp mismatch vs DuckDB's exact
    //). Seconds keep the weighted sum comfortably inside int64. One
    user-keyed sort for the lead()."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        ms("ts").alias("ts_ms"),
        F.round(F.col("value") * 1e6).cast("long").alias("v_micro"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    dur = (F.lead("ts_ms").over(w) - F.col("ts_ms")).alias("dur_ms")
    weighted = (
        ev.select("user_id", "v_micro", dur)
        .filter(F.col("dur_ms").isNotNull())
        .withColumn("dur_s", F.expr("dur_ms DIV 1000"))
    )
    return (
        weighted.groupBy("user_id")
        .agg(
            F.count("*").cast("long").alias("n_intervals"),
            F.sum(F.col("dur_ms").cast("decimal(38,0)")).cast("long").alias("total_ms"),
            F.expr(
                "CAST(SUM(CAST(v_micro AS DECIMAL(38,0)) * dur_s) AS BIGINT)"
                " DIV CAST(SUM(CAST(dur_s AS DECIMAL(38,0))) AS BIGINT)"
            ).cast("long").alias("twap_micro"),
        )
        .orderBy("user_id")
    )


USER_VALUE_TWAP_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events
),
d0 AS (
  SELECT user_id, v_micro,
         LEAD(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) - ts_ms AS dur_ms
  FROM e
),
d AS (SELECT user_id, v_micro, dur_ms, dur_ms // 1000 AS dur_s FROM d0 WHERE dur_ms IS NOT NULL)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(dur_ms) AS BIGINT) AS total_ms,
       CAST(CAST(SUM(CAST(v_micro AS DECIMAL(38,0)) * dur_s) AS BIGINT)
            // CAST(SUM(CAST(dur_s AS DECIMAL(38,0))) AS BIGINT) AS BIGINT) AS twap_micro
FROM d
GROUP BY user_id ORDER BY user_id
"""

QUERIES["user_value_twap"] = Q(
    user_value_twap,
    USER_VALUE_TWAP_SQL,
    "time-weighted average value per user on the exact integer grid",
)


def value_pareto_cutoff(spark, sf_dir):
    """Pareto concentration: the smallest set of users covering 80% of
    total event value — running cumulative share over users ranked by
    value (integer micro units; the 80% test multiplies out so no
    division appears at all). The running sum is one ranked window; the
    cutoff keeps every user whose PRECEDING cumulative mass is still
    below 80% of the total, so exactly the first crosser is included."""
    from pyspark.sql import Window

    per_user = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.sum(F.round(F.col("value") * 1e6).cast("long"))
            .cast("long")
            .alias("v_micro")
        )
    )
    w = Window.orderBy(F.col("v_micro").desc(), F.col("user_id").asc())
    ranked = per_user.select(
        "user_id",
        "v_micro",
        F.row_number().over(w).cast("long").alias("rnk"),
        (F.sum("v_micro").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ) - F.col("v_micro")).cast("long").alias("prev_cum"),
    )
    total = per_user.agg(F.sum("v_micro").cast("long").alias("total"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .filter(F.col("prev_cum") * 100 < F.col("total") * 80)
        .select("rnk", "user_id", "v_micro", "prev_cum")
        .orderBy("rnk")
    )


VALUE_PARETO_CUTOFF_SQL = """
WITH per_user AS (
  SELECT user_id, CAST(SUM(CAST(ROUND(value * 1e6) AS BIGINT)) AS BIGINT) AS v_micro
  FROM events GROUP BY user_id
),
t AS (SELECT CAST(SUM(v_micro) AS BIGINT) AS total FROM per_user),
ranked AS (
  SELECT user_id, v_micro,
         CAST(ROW_NUMBER() OVER w AS BIGINT) AS rnk,
         CAST(SUM(v_micro) OVER (w ROWS UNBOUNDED PRECEDING) - v_micro AS BIGINT) AS prev_cum
  FROM per_user
  WINDOW w AS (ORDER BY v_micro DESC, user_id ASC)
)
SELECT rnk, user_id, v_micro, prev_cum
FROM ranked, t
WHERE prev_cum * 100 < total * 80
ORDER BY rnk
"""

QUERIES["value_pareto_cutoff"] = Q(
    value_pareto_cutoff,
    VALUE_PARETO_CUTOFF_SQL,
    "smallest user set covering 80% of total value (integer cumulative share)",
)


def max_concurrent_users(spark, sf_dir):
    """Sweep-line interval concurrency: each event opens a 30-minute
    presence interval (clipped at midnight so every interval lives in one
    day-partition); +1/−1 boundary events sorted within the day give a
    running occupancy sum whose max is the day's peak concurrency — the
    classic interval-overlap algorithm, keyed by day so the running sum
    never needs a global single-partition sort. Ends sort before starts
    at the same millisecond (half-open intervals: a user leaving as
    another arrives never double-counts)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day"),
        ms("ts").alias("ts_ms"),
    )
    day_end = (F.col("day") + 1) * 86400000
    starts = ev.select("day", F.col("ts_ms").alias("at_ms"), F.lit(1).alias("delta"))
    ends = ev.select(
        "day",
        F.least(F.col("ts_ms") + 1800000, day_end).alias("at_ms"),
        F.lit(-1).alias("delta"),
    )
    bounds = starts.unionByName(ends)
    w = (
        Window.partitionBy("day")
        .orderBy("at_ms", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    occupancy = bounds.withColumn("occ", F.sum("delta").over(w))
    return (
        occupancy.groupBy("day")
        .agg(F.max("occ").cast("long").alias("max_concurrent"))
        .orderBy("day")
    )


MAX_CONCURRENT_USERS_SQL = """
WITH e AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         epoch_ms(ts) AS ts_ms
  FROM events
),
bounds AS (
  SELECT day, ts_ms AS at_ms, 1 AS delta FROM e
  UNION ALL
  SELECT day, LEAST(ts_ms + 1800000, (day + 1) * 86400000) AS at_ms, -1 AS delta FROM e
),
occ AS (
  SELECT day,
         SUM(delta) OVER (PARTITION BY day ORDER BY at_ms, delta
                          ROWS UNBOUNDED PRECEDING) AS occ
  FROM bounds
)
SELECT day, CAST(MAX(occ) AS BIGINT) AS max_concurrent
FROM occ GROUP BY day ORDER BY day
"""

QUERIES["max_concurrent_users"] = Q(
    max_concurrent_users,
    MAX_CONCURRENT_USERS_SQL,
    "sweep-line peak concurrency per day (+1/-1 boundaries, keyed running sum)",
)


def value_equidepth_bins(spark, sf_dir):
    """Equi-DEPTH histogram per event type (deciles by population —
    complement of the equi-width `event_value_histogram`): ntile(10) over
    (value, event_id) — the id tie-break makes bin membership a total
    order both engines share — then per-bin count and cent-grid min/max,
    the boundary artifact feeding range-partition planning and drift
    monitors."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    return (
        ev.withColumn("bin", F.ntile(10).over(w).cast("long"))
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
        )
        .orderBy("event_type", "bin")
    )


VALUE_EQUIDEPTH_BINS_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
b AS (
  SELECT event_type, cents,
         CAST(NTILE(10) OVER (PARTITION BY event_type ORDER BY cents, event_id)
              AS BIGINT) AS bin
  FROM e
)
SELECT event_type, bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents
FROM b GROUP BY event_type, bin ORDER BY event_type, bin
"""

QUERIES["value_equidepth_bins"] = Q(
    value_equidepth_bins,
    VALUE_EQUIDEPTH_BINS_SQL,
    "equi-depth decile histogram per type (ntile with total-order tie-break)",
)


def user_interval_stats(spark, sf_dir):
    """Per-user inter-event gap statistics with an EXACT variance: the
    second moment is n·Σx² − (Σx)² over SECOND-granularity gaps so every
    intermediate fits BIGINT (order-free, no Welford, no float — and no
    DECIMAL division either: Spark's decimal DIV rounds at an
    intermediate scale, a measured 1-ulp cross-engine mismatch, so the
    division runs on BIGINTs). Mean stays on the millisecond grid.
    Users with <3 events (fewer than 2 gaps) emit null variance rather
    than a divide-by-zero."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", ms("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    gaps = (
        ev.withColumn("gap_ms", F.col("ts_ms") - F.lag("ts_ms").over(w))
        .filter(F.col("gap_ms").isNotNull())
    )
    gaps = gaps.withColumn("gap_s", F.expr("gap_ms DIV 1000"))
    agg = gaps.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_gaps"),
        F.sum(F.col("gap_ms").cast("decimal(38,0)")).cast("long").alias("sum_ms"),
        F.sum("gap_s").cast("long").alias("sum_s"),
        F.sum(F.expr("gap_s * gap_s")).cast("long").alias("sumsq_s"),
    )
    return agg.select(
        "user_id",
        "n_gaps",
        F.expr("sum_ms DIV n_gaps").cast("long").alias("mean_gap_ms"),
        F.when(
            F.col("n_gaps") >= 2,
            F.expr("(n_gaps * sumsq_s - sum_s * sum_s) DIV (n_gaps * (n_gaps - 1))"),
        ).cast("long").alias("var_s2"),
    ).orderBy("user_id")


USER_INTERVAL_STATS_SQL = """
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms FROM events
),
g0 AS (
  SELECT user_id,
         ts_ms - LAG(ts_ms) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id) AS gap_ms
  FROM e
),
g AS (SELECT user_id, gap_ms, gap_ms // 1000 AS gap_s FROM g0 WHERE gap_ms IS NOT NULL),
a AS (
  SELECT user_id,
         CAST(COUNT(*) AS BIGINT) AS n_gaps,
         CAST(SUM(CAST(gap_ms AS DECIMAL(38,0))) AS BIGINT) AS sum_ms,
         CAST(SUM(gap_s) AS BIGINT) AS sum_s,
         CAST(SUM(gap_s * gap_s) AS BIGINT) AS sumsq_s
  FROM g GROUP BY user_id
)
SELECT user_id, n_gaps,
       CAST(sum_ms // n_gaps AS BIGINT) AS mean_gap_ms,
       CASE WHEN n_gaps >= 2 THEN
         CAST((n_gaps * sumsq_s - sum_s * sum_s) // (n_gaps * (n_gaps - 1)) AS BIGINT)
       END AS var_s2
FROM a ORDER BY user_id
"""

QUERIES["user_interval_stats"] = Q(
    user_interval_stats,
    USER_INTERVAL_STATS_SQL,
    "per-user gap mean/variance via exact decimal second moments",
)


def seasonality_dow(spark, sf_dir):
    """Day-of-week seasonality profile per event type: epoch-day mod 7
    as the weekday key — ARITHMETIC, not a calendar function, because
    dayofweek conventions differ by dialect (Spark 1=Sunday, DuckDB
    dow 0=Sunday, ISO 1=Monday) and epoch-day % 7 is convention-free
    (day 0 = Thursday 1970-01-01; the label mapping is the consumer's
    choice). Counts and exact cent sums per (type, dow)."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")), F.lit(7)
        ).cast("long").alias("dow7"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    return (
        ev.groupBy("event_type", "dow7")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("cents").cast("long").alias("sum_cents"),
        )
        .orderBy("event_type", "dow7")
    )


SEASONALITY_DOW_SQL = """
SELECT event_type,
       CAST((CAST(ts AS DATE) - DATE '1970-01-01') % 7 AS BIGINT) AS dow7,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM events
GROUP BY 1, 2
ORDER BY event_type, dow7
"""

QUERIES["seasonality_dow"] = Q(
    seasonality_dow,
    SEASONALITY_DOW_SQL,
    "day-of-week seasonality via convention-free epoch-day arithmetic",
)


def order_status_transitions(spark, sf_dir):
    """First-order Markov transition counts over each customer's order
    status sequence (date-then-key ordered): the behavioral-model
    estimation shape — lag window per customer, pair counting, row
    probability on the ppm grid. Transitions are only counted within a
    customer's own history."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        ms("o_orderdate").alias("ts_ms"),
        "o_orderstatus",
    )
    w = Window.partitionBy("o_custkey").orderBy("ts_ms", "o_orderkey")
    pairs = (
        o.withColumn("prev_status", F.lag("o_orderstatus").over(w))
        .filter(F.col("prev_status").isNotNull())
        .groupBy(
            F.col("prev_status").alias("from_status"),
            F.col("o_orderstatus").alias("to_status"),
        )
        .agg(F.count("*").cast("long").alias("n"))
    )
    totals = pairs.groupBy("from_status").agg(F.sum("n").cast("long").alias("n_from"))
    return (
        pairs.join(totals, "from_status")
        .select(
            "from_status",
            "to_status",
            "n",
            F.expr("(n * 1000000) DIV n_from").cast("long").alias("p_ppm"),
        )
        .orderBy("from_status", "to_status")
    )


ORDER_STATUS_TRANSITIONS_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey, epoch_ms(o_orderdate) AS ts_ms, o_orderstatus
  FROM orders
),
p AS (
  SELECT LAG(o_orderstatus) OVER w AS from_status, o_orderstatus AS to_status
  FROM o WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_ms, o_orderkey)
),
c AS (
  SELECT from_status, to_status, CAST(COUNT(*) AS BIGINT) AS n
  FROM p WHERE from_status IS NOT NULL GROUP BY 1, 2
),
t AS (SELECT from_status, CAST(SUM(n) AS BIGINT) AS n_from FROM c GROUP BY 1)
SELECT c.from_status, c.to_status, c.n,
       CAST((c.n * 1000000) // t.n_from AS BIGINT) AS p_ppm
FROM c JOIN t USING (from_status)
ORDER BY c.from_status, c.to_status
"""

QUERIES["order_status_transitions"] = Q(
    order_status_transitions,
    ORDER_STATUS_TRANSITIONS_SQL,
    "per-customer order-status Markov transition counts with ppm rows",
)


def value_percent_rank_ppm(spark, sf_dir):
    """percent_rank on the integer grid: ((rank−1)·10⁶) DIV (n−1) per
    event type over the cent-rounded value — the float percent_rank is a
    ratio of exact integers, so computing it AS integers removes the
    engine-rounding question entirely. Emitted for the per-type top-5
    and bottom-5 cents rows to keep the gate bounded."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    w = Window.partitionBy("event_type").orderBy("cents", "event_id")
    n = Window.partitionBy("event_type")
    ranked = ev.select(
        "event_type",
        "event_id",
        "cents",
        F.row_number().over(w).cast("long").alias("rnk"),
        F.count("*").over(n).cast("long").alias("n_type"),
    )
    return (
        ranked.filter(
            (F.col("rnk") <= 5) | (F.col("rnk") > F.col("n_type") - 5)
        )
        .select(
            "event_type",
            "rnk",
            "event_id",
            "cents",
            F.expr("((rnk - 1) * 1000000) DIV (n_type - 1)")
            .cast("long")
            .alias("pct_rank_ppm"),
        )
        .orderBy("event_type", "rnk")
    )


VALUE_PERCENT_RANK_PPM_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
r AS (
  SELECT event_type, event_id, cents,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY event_type ORDER BY cents, event_id) AS BIGINT) AS rnk,
         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_type
  FROM e
)
SELECT event_type, rnk, event_id, cents,
       CAST(((rnk - 1) * 1000000) // (n_type - 1) AS BIGINT) AS pct_rank_ppm
FROM r
WHERE rnk <= 5 OR rnk > n_type - 5
ORDER BY event_type, rnk
"""

QUERIES["value_percent_rank_ppm"] = Q(
    value_percent_rank_ppm,
    VALUE_PERCENT_RANK_PPM_SQL,
    "integer-grid percent_rank (head/tail rows per type)",
)


def value_mad_robust(spark, sf_dir):
    """Robust dispersion per event type: exact interpolated median and
    the median absolute deviation around it (two percentile passes, the
    second over |x − median|) — the outlier-resistant spread every
    anomaly threshold should use instead of stddev. Rounded to 6 places
    like every interpolated-percentile gate."""
    ev = load(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    return (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.round(F.first("med"), 6).alias("median_value"),
            F.round(F.expr("percentile(abs(value - med), 0.5)"), 6).alias("mad_value"),
            F.count("*").cast("long").alias("n"),
        )
        .orderBy("event_type")
    )


VALUE_MAD_ROBUST_SQL = """
WITH m AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       ROUND(ANY_VALUE(m.med), 6) AS median_value,
       ROUND(quantile_cont(ABS(e.value - m.med), 0.5), 6) AS mad_value,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type
ORDER BY e.event_type
"""

QUERIES["value_mad_robust"] = Q(
    value_mad_robust,
    VALUE_MAD_ROBUST_SQL,
    "median + MAD robust dispersion per type (exact interpolated percentiles)",
)


def user_rolling_median(spark, sf_dir):
    """Rolling EXACT median per user over the last 7 events (ROWS frame).
    Emitted as 2×median on the integer micro grid: the interpolated
    median of an even frame is (a+b)/2, so doubling returns the integer
    a+b — no float representation ever leaks into the hash. Spark reads
    the two middle elements of the sorted frame array; DuckDB doubles its
    interpolated MEDIAN window — identical integers by construction. One
    user-keyed shuffle; the frame sort is per-row over ≤7 elements, O(1)
    memory per partition at any corpus size."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        ms("ts").alias("ts_ms"),
        F.round(F.col("value") * 1e6).cast("long").alias("v_micro"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id").rowsBetween(-6, 0)
    a = F.array_sort(F.collect_list("v_micro").over(w))
    n = F.size(a)
    med2 = F.element_at(a, ((n + 1) / 2).cast("int")) + F.element_at(a, (n / 2).cast("int") + 1)
    return ev.select(
        "event_id",
        "user_id",
        "ts_ms",
        med2.cast("long").alias("median2_micro"),
    ).orderBy("event_id")


USER_ROLLING_MEDIAN_SQL = """
WITH e AS (
  SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events
)
SELECT event_id, user_id, ts_ms,
       CAST(ROUND(2 * MEDIAN(v_micro) OVER (
         PARTITION BY user_id ORDER BY ts_ms, event_id
         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS BIGINT) AS median2_micro
FROM e
ORDER BY event_id
"""

QUERIES["user_rolling_median"] = Q(
    user_rolling_median,
    USER_ROLLING_MEDIAN_SQL,
    "exact rolling median (2×median integer grid) over a 7-row frame",
)


def orders_skyline(spark, sf_dir):
    """Skyline (Pareto frontier) of one quarter's orders: minimize the
    order date, maximize the total price — an order survives iff no
    other order is at-or-before it in time AND at-or-above it in price
    with one strict inequality. The Spark plan aggregates FIRST — one
    partial-agg shuffle to per-date maxima (bounded by the calendar, not
    the corpus), a running strict-predecessor max over that tiny
    aggregate (the only unpartitioned window, ≤90 rows here, ≤ the day
    count at any corpus size), then a broadcast join back to recover the
    surviving orders — while the oracle states the quadratic NOT-EXISTS
    dominance definition directly; the rewrite must reproduce it
    exactly. Prices compare on the cent grid."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01")) & (F.col("o_orderdate") < F.lit("1996-04-01"))
    ).select(
        "o_orderkey",
        ms("o_orderdate").alias("date_ms"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
    )
    daily = o.groupBy("date_ms").agg(F.max("price_cents").alias("dmax"))
    w = Window.orderBy("date_ms").rowsBetween(Window.unboundedPreceding, -1)
    front = (
        daily.withColumn("prev_max", F.max("dmax").over(w))
        .filter(F.col("prev_max").isNull() | (F.col("prev_max") < F.col("dmax")))
        .select(F.col("date_ms").alias("f_date"), "dmax")
    )
    return (
        o.join(
            F.broadcast(front),
            (o.date_ms == F.col("f_date")) & (o.price_cents == F.col("dmax")),
        )
        .select("o_orderkey", "date_ms", "price_cents")
        .orderBy("date_ms", "o_orderkey")
    )


ORDERS_SKYLINE_SQL = """
WITH q AS (
  SELECT o_orderkey, epoch_ms(o_orderdate) AS date_ms,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
)
SELECT o_orderkey, date_ms, price_cents
FROM q a
WHERE NOT EXISTS (
  SELECT 1 FROM q b
  WHERE b.date_ms <= a.date_ms AND b.price_cents >= a.price_cents
    AND (b.date_ms < a.date_ms OR b.price_cents > a.price_cents)
)
ORDER BY date_ms, o_orderkey
"""

QUERIES["orders_skyline"] = Q(
    orders_skyline,
    ORDERS_SKYLINE_SQL,
    "2-D skyline: window-rewrite frontier vs NOT-EXISTS dominance oracle",
)


def value_cusum_shift(spark, sf_dir):
    """CUSUM level-shift detection per event type, all-integer: daily
    cent totals, deviations against the floored per-type daily mean,
    cumulative sum in day order, and the argmax |CUSUM| day — where the
    series most likely changed level. The heavy pass is one partial-agg
    rollup to (type, day); the cumulative window then runs over the
    day-count-bounded aggregate, and the argmax is a grouped max_by.
    Floored integer mean keeps both engines on the identical grid (the
    deviations need not sum to zero — determinism matters, centering
    does not)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        (ms("ts") / F.lit(86_400_000)).cast("long").alias("day"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    daily = ev.groupBy("event_type", "day").agg(F.sum("cents").alias("day_cents"))
    tot = daily.groupBy("event_type").agg(
        F.sum("day_cents").alias("total"), F.count("*").alias("n_days")
    )
    j = daily.join(F.broadcast(tot), "event_type").withColumn(
        "dev", F.col("day_cents") - F.expr("total DIV n_days")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    c = j.withColumn("cusum", F.sum("dev").over(w))
    return c.groupBy("event_type").agg(
        F.first("n_days").cast("long").alias("n_days"),
        F.max_by(F.col("day"), F.struct(F.abs(F.col("cusum")), -F.col("day")))
        .cast("long")
        .alias("shift_day"),
        F.max(F.abs(F.col("cusum"))).cast("long").alias("max_abs_cusum"),
    )


VALUE_CUSUM_SHIFT_SQL = """
WITH e AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
daily AS (
  SELECT event_type, day, SUM(cents) AS day_cents
  FROM e GROUP BY event_type, day
),
tot AS (
  SELECT event_type, SUM(day_cents) AS total, COUNT(*) AS n_days
  FROM daily GROUP BY event_type
),
c AS (
  SELECT d.event_type, d.day, t.n_days,
         SUM(d.day_cents - (t.total // t.n_days)) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cusum
  FROM daily d JOIN tot t USING (event_type)
),
r AS (
  SELECT event_type, n_days, day, ABS(cusum) AS a,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ABS(cusum) DESC, day ASC) AS rn
  FROM c
)
SELECT event_type, CAST(MIN(n_days) AS BIGINT) AS n_days,
       CAST(MIN(CASE WHEN rn = 1 THEN day END) AS BIGINT) AS shift_day,
       CAST(MAX(a) AS BIGINT) AS max_abs_cusum
FROM r GROUP BY event_type
"""

QUERIES["value_cusum_shift"] = Q(
    value_cusum_shift,
    VALUE_CUSUM_SHIFT_SQL,
    "integer CUSUM level-shift detector: argmax |cusum| day per event type",
)


def scd2_intervals(spark, sf_dir):
    """SCD-Type-2 history build: each user event becomes a validity
    interval [ts, next-event ts) via LEAD, the open interval flagged
    current — the lakehouse dimension-history pattern (one user-keyed
    sort, entirely streaming-frame)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0).select(
        "user_id", "event_id", "event_type", ms("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    nxt = F.lead("ts_ms").over(w)
    return ev.select(
        "user_id",
        "event_id",
        "event_type",
        F.col("ts_ms").alias("valid_from_ms"),
        nxt.alias("valid_to_ms"),
        nxt.isNull().cast("int").alias("is_current"),
    )


SCD2_INTERVALS_SQL = """
SELECT user_id, event_id, event_type,
       epoch_ms(ts) AS valid_from_ms,
       LEAD(epoch_ms(ts)) OVER w AS valid_to_ms,
       CAST(CASE WHEN LEAD(epoch_ms(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
FROM events
WHERE user_id % 7 = 0
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)
"""

QUERIES["scd2_intervals"] = Q(
    scd2_intervals,
    SCD2_INTERVALS_SQL,
    "SCD2 validity intervals via LEAD with open-interval current flag",
)


def weekly_growth_ppm(spark, sf_dir):
    """Week-over-week growth per event type on the integer ppm grid:
    weekly cent totals (one partial-agg shuffle), LAG for the prior
    week, delta ppm = FLOOR((cur − prev)·10⁶ / prev) with explicit
    FLOOR on BOTH engines: growth can be negative and the native
    integer divisions disagree there (Spark DIV truncates toward zero,
    DuckDB // floors, DuckDB CAST(double) rounds) — one IEEE division
    over exact integer inputs is bit-identical, FLOOR lands both on
    the same integer. First week per type emits NULL growth."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "event_type",
        F.expr("unix_millis(cast(ts as timestamp)) DIV 604800000").alias("week"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    weekly = ev.groupBy("event_type", "week").agg(F.sum("cents").alias("wk_cents"))
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("wk_cents").over(w)
    return weekly.select(
        "event_type",
        "week",
        F.col("wk_cents").cast("long").alias("wk_cents"),
        F.when(
            prev.isNotNull() & (prev != 0),
            F.floor((F.col("wk_cents") - prev) * 1_000_000 / prev).cast("long"),
        ).alias("growth_ppm"),
    )


WEEKLY_GROWTH_PPM_SQL = """
WITH e AS (
  SELECT event_type, epoch_ms(ts) // 604800000 AS week,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
weekly AS (
  SELECT event_type, week, SUM(cents) AS wk_cents
  FROM e GROUP BY event_type, week
)
SELECT event_type, week, CAST(wk_cents AS BIGINT) AS wk_cents,
       CASE WHEN LAG(wk_cents) OVER w IS NOT NULL AND LAG(wk_cents) OVER w <> 0
            THEN CAST(FLOOR((wk_cents - LAG(wk_cents) OVER w) * 1000000.0 / LAG(wk_cents) OVER w) AS BIGINT)
       END AS growth_ppm
FROM weekly
WINDOW w AS (PARTITION BY event_type ORDER BY week)
"""

QUERIES["weekly_growth_ppm"] = Q(
    weekly_growth_ppm,
    WEEKLY_GROWTH_PPM_SQL,
    "week-over-week growth per type on the exact ppm grid (LAG + integer DIV)",
)


def state_dwell_time(spark, sf_dir):
    """Time-in-state rollup over the SCD2 intervals: total milliseconds
    each user's activity spent 'in' each event type (interval = event →
    next event), open intervals excluded. One user-keyed sort builds
    the intervals (LEAD), one partial agg rolls them up — the
    state-duration report every ops/behavioral pipeline derives from
    its dimension history."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0).select(
        "user_id", "event_id", "event_type", ms("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    iv = ev.withColumn("next_ms", F.lead("ts_ms").over(w)).filter(
        F.col("next_ms").isNotNull()
    )
    return iv.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n_intervals"),
        F.sum(F.col("next_ms") - F.col("ts_ms")).cast("long").alias("dwell_ms"),
    )


STATE_DWELL_TIME_SQL = """
WITH iv AS (
  SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
         LEAD(epoch_ms(ts)) OVER (PARTITION BY user_id
                                  ORDER BY epoch_ms(ts), event_id) AS next_ms
  FROM events WHERE user_id % 7 = 0
)
SELECT user_id, event_type,
       CAST(COUNT(*) AS BIGINT) AS n_intervals,
       CAST(SUM(next_ms - ts_ms) AS BIGINT) AS dwell_ms
FROM iv WHERE next_ms IS NOT NULL
GROUP BY user_id, event_type
"""

QUERIES["state_dwell_time"] = Q(
    state_dwell_time,
    STATE_DWELL_TIME_SQL,
    "time-in-state rollup from SCD2 intervals (LEAD + one partial agg)",
)


def events_pivot_type_counts(spark, sf_dir):
    """DataFrame pivot API (groupBy().pivot(col, values)) with the value
    list given EXPLICITLY — open-ended pivot needs a distinct-scan
    planning pass and non-deterministic column order; the explicit list
    is the scale-safe form (one shuffle, fixed schema). Oracle:
    conditional aggregation."""
    ev = load(spark, sf_dir, "events")
    bucket = (F.col("user_id") % 20).alias("user_bucket")
    return (
        ev.groupBy(bucket)
        .pivot("event_type", ["click", "view", "purchase", "signup", "error"])
        .count()
        .na.fill(0)
        .select(
            "user_bucket",
            *[F.col(c).cast("long").alias(c) for c in ["click", "view", "purchase", "signup", "error"]],
        )
    )


EVENTS_PIVOT_TYPE_COUNTS_SQL = """
SELECT user_id % 20 AS user_bucket,
       CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS click,
       CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS view,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
       CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS signup,
       CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS error
FROM events GROUP BY user_id % 20
"""

QUERIES["events_pivot_type_counts"] = Q(
    events_pivot_type_counts,
    EVENTS_PIVOT_TYPE_COUNTS_SQL,
    "explicit-values pivot (fixed schema, one shuffle) vs conditional-agg oracle",
)


def lineitem_unpivot_measures(spark, sf_dir):
    """unpivot/melt API: the three lineitem measures to long form, then
    one grouped rollup per measure on the cent/ppm grid — the wide→long
    reshape feeding any per-metric pipeline; the oracle is the UNION ALL
    the reshape replaces."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_c"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
        F.round(F.col("l_discount") * 10000).cast("long").alias("disc_ppm"),
    )
    long = li.unpivot(
        ["l_orderkey"], ["qty_c", "price_c", "disc_ppm"], "measure", "v"
    )
    return long.groupBy("measure").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("v").cast("long").alias("total"),
        F.max("v").cast("long").alias("vmax"),
    )


LINEITEM_UNPIVOT_MEASURES_SQL = """
WITH long AS (
  SELECT l_orderkey, 'qty_c' AS measure, CAST(ROUND(l_quantity * 100) AS BIGINT) AS v FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'price_c', CAST(ROUND(l_extendedprice * 100) AS BIGINT) FROM lineitem
  UNION ALL
  SELECT l_orderkey, 'disc_ppm', CAST(ROUND(l_discount * 10000) AS BIGINT) FROM lineitem
)
SELECT measure, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(v) AS BIGINT) AS total, CAST(MAX(v) AS BIGINT) AS vmax
FROM long GROUP BY measure
"""

QUERIES["lineitem_unpivot_measures"] = Q(
    lineitem_unpivot_measures,
    LINEITEM_UNPIVOT_MEASURES_SQL,
    "unpivot/melt to long form + per-measure rollup vs UNION ALL oracle",
)


def value_run_lengths(spark, sf_dir):
    """Run-length encoding of per-user activity (gaps-and-islands on
    VALUE equality): consecutive same-event-type rows form runs via the
    LAG-change-flag + running-sum island id; emits per-user run counts
    and the longest run. One user-keyed sort carries all three window
    passes (same partitioning, no extra exchange)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") % 11 == 0).select(
        "user_id", "event_id", "event_type", ms("ts").alias("ts_ms")
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changed = (
        (F.lag("event_type").over(w).isNull())
        | (F.lag("event_type").over(w) != F.col("event_type"))
    ).cast("long")
    runs = ev.withColumn("island", F.sum(changed).over(w))
    per_run = runs.groupBy("user_id", "island").agg(
        F.count("*").alias("run_len")
    )
    return per_run.groupBy("user_id").agg(
        F.count("*").cast("long").alias("n_runs"),
        F.max("run_len").cast("long").alias("longest_run"),
    )


VALUE_RUN_LENGTHS_SQL = """
WITH e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
  FROM events WHERE user_id % 11 = 0
),
flagged AS (
  SELECT user_id, event_id, ts_ms,
         CASE WHEN LAG(event_type) OVER w IS NULL
                OR LAG(event_type) OVER w <> event_type THEN 1 ELSE 0 END AS chg
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
),
islands AS (
  SELECT user_id,
         SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM flagged
),
per_run AS (
  SELECT user_id, island, COUNT(*) AS run_len FROM islands GROUP BY user_id, island
)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_runs,
       CAST(MAX(run_len) AS BIGINT) AS longest_run
FROM per_run GROUP BY user_id
"""

QUERIES["value_run_lengths"] = Q(
    value_run_lengths,
    VALUE_RUN_LENGTHS_SQL,
    "gaps-and-islands run-length encoding: runs per user + longest run",
)


def cumulative_new_users(spark, sf_dir):
    """Growth accounting: each user's FIRST event day (one grouped min —
    the first-touch dedup), rolled up to new-users-per-day, with the
    running cumulative via a window over the day-count-bounded
    aggregate. The corpus-scale pass is the per-user min; everything
    after runs on ≤ calendar-days rows."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        "user_id", F.expr("unix_millis(cast(ts as timestamp)) DIV 86400000").alias("day")
    )
    first_day = ev.groupBy("user_id").agg(F.min("day").alias("d0"))
    daily = first_day.groupBy("d0").agg(F.count("*").alias("new_users"))
    w = Window.orderBy("d0").rowsBetween(Window.unboundedPreceding, 0)
    return daily.select(
        F.col("d0").cast("long").alias("day"),
        F.col("new_users").cast("long").alias("new_users"),
        F.sum("new_users").over(w).cast("long").alias("cum_users"),
    )


CUMULATIVE_NEW_USERS_SQL = """
WITH f AS (
  SELECT user_id, MIN(epoch_ms(ts) // 86400000) AS d0
  FROM events GROUP BY user_id
),
daily AS (
  SELECT d0, COUNT(*) AS new_users FROM f GROUP BY d0
)
SELECT CAST(d0 AS BIGINT) AS day, CAST(new_users AS BIGINT) AS new_users,
       CAST(SUM(new_users) OVER (ORDER BY d0
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
FROM daily
"""

QUERIES["cumulative_new_users"] = Q(
    cumulative_new_users,
    CUMULATIVE_NEW_USERS_SQL,
    "first-touch dedup + new/cumulative users per day (calendar-bounded window)",
)


def rolling_7d_distinct_exact(spark, sf_dir):
    """EXACT trailing-7-day distinct users per day — the precise
    counterpart of `hll_rolling_7d_distinct`, and the same range-join-free
    shape: each (user, active day) pair fans out to the ≤7 report days it
    covers (a bounded map-side explode — never a range join, whose
    candidate set grows quadratically in the window), distinct once, and
    the calendar dimension rides a broadcast semi-join so phantom report
    days (beyond the observed span) drop out. Cost at 100 TB: 7× the
    distinct (user, day) pairs — a constant factor chosen at query-author
    time, against the HLL variant's fixed-register approximation."""
    ev = load(spark, sf_dir, "events")
    active = ev.select(
        F.to_date(F.col("ts").cast("timestamp")).alias("day"), "user_id"
    ).distinct()
    cover = active.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("rday"),
    ).distinct()
    days = active.select(F.col("day").alias("rday")).distinct()
    return (
        cover.join(F.broadcast(days), "rday")
        .groupBy("rday")
        .agg(F.count("*").cast("bigint").alias("n_active_7d"))
        .orderBy("rday")
    )


ROLLING_7D_DISTINCT_EXACT_SQL = """
WITH active AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
),
cover AS (
  SELECT DISTINCT user_id,
         CAST(unnest(generate_series(CAST(day AS TIMESTAMP),
                                     CAST(day AS TIMESTAMP) + INTERVAL 6 DAY,
                                     INTERVAL 1 DAY)) AS DATE) AS rday
  FROM active
),
days AS (SELECT DISTINCT day AS rday FROM active)
SELECT c.rday, CAST(COUNT(*) AS BIGINT) AS n_active_7d
FROM cover c JOIN days d USING (rday)
GROUP BY c.rday ORDER BY c.rday
"""

QUERIES["rolling_7d_distinct_exact"] = Q(
    rolling_7d_distinct_exact,
    ROLLING_7D_DISTINCT_EXACT_SQL,
    "exact trailing-7d distinct users via bounded interval fan-out (no range join)",
)


def value_ewma_exact(spark, sf_dir):
    """EXACT exponentially-weighted moving average (α = 1/2) of daily
    revenue per event type — the level-smoothing recursion
    s_t = (s_{t-1} + x_t)/2 solved in closed form as a prefix sum of
    power-of-two weights: s_t·2^(t-1) = x_1 + Σ_{i≥2} x_i·2^(i-2), so
    one cumulative window over the (bounded) daily rollup computes the
    whole curve with NO per-row recursion and NO floats — α = 1/2 keeps
    every intermediate on the integer grid (weights are shifts). The
    corpus reduces map-side to ≤|days|·|types| rows before the window
    touches anything; the scaled prefix stays < 2^63 for spans ≤ ~45
    days at these magnitudes (use DECIMAL for longer horizons)."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("cents").alias("x_cents"))
    )
    w = Window.partitionBy("event_type").orderBy("day")
    cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        daily.withColumn("t", F.row_number().over(w))
        .withColumn(
            "wx",
            F.when(F.col("t") == 1, F.col("x_cents")).otherwise(
                F.expr("x_cents * shiftleft(CAST(1 AS BIGINT), CAST(t - 2 AS INT))")
            ),
        )
        .withColumn("p", F.sum("wx").over(cum))
        .select(
            "event_type",
            "day",
            "x_cents",
            F.expr("p DIV shiftleft(CAST(1 AS BIGINT), CAST(t - 1 AS INT))")
            .cast("bigint")
            .alias("ewma_cents"),
        )
        .orderBy("event_type", "day")
    )


VALUE_EWMA_EXACT_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS x_cents
  FROM events GROUP BY 1, 2
),
seq AS (
  SELECT event_type, day, x_cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
  FROM daily
),
wx AS (
  SELECT event_type, day, x_cents, t,
         CASE WHEN t = 1 THEN x_cents ELSE x_cents * (1 << (t - 2)) END AS wx
  FROM seq
)
SELECT event_type, day, CAST(x_cents AS BIGINT) AS x_cents,
       CAST(SUM(wx) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING)
            // (1 << (t - 1)) AS BIGINT) AS ewma_cents
FROM wx
ORDER BY event_type, day
"""

QUERIES["value_ewma_exact"] = Q(
    value_ewma_exact,
    VALUE_EWMA_EXACT_SQL,
    "exact integer EWMA (alpha=1/2) via power-of-two weighted prefix sums",
)


def ts_sax_motifs(spark, sf_dir):
    """SAX-style time-series motif discovery over per-user activity: each
    user's daily event-count series symbolizes onto a fixed 4-letter
    alphabet (1→a, 2→b, 3→c, ≥4→d — fixed breakpoints, so no global
    quantile pass), every sliding 4-day-window word is extracted
    JVM-side from the per-user symbol string, and the global word
    histogram surfaces the 10 most common local shapes. The per-user
    series is bounded by the calendar (collect_list stays small and
    ordered by an array_sort on the (day, count) struct, not a shuffle
    sort); word extraction is a codegen substring fan-out ≤ |days| per
    user; the only corpus-wide shuffle is the final word count. The
    approximation trade vs raw subsequence matching (PAA/SAX, Lin et
    al.) is the point: motifs at 100 TB cost one agg + one map + one
    agg."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
        )
        .groupBy("user_id", "day")
        .agg(F.count("*").alias("n"))
    )
    per_user = (
        daily.groupBy("user_id")
        .agg(
            F.array_sort(F.collect_list(F.struct("day", "n"))).alias("seq")
        )
        .filter(F.size("seq") >= 8)
        .select(
            F.concat_ws(
                "",
                F.transform(
                    "seq",
                    lambda x: F.when(x["n"] == 1, F.lit("a"))
                    .when(x["n"] == 2, F.lit("b"))
                    .when(x["n"] == 3, F.lit("c"))
                    .otherwise(F.lit("d")),
                ),
            ).alias("s")
        )
    )
    words = per_user.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("s") - 3),
                lambda i: F.substring(F.col("s"), i, F.lit(4)),
            )
        ).alias("word")
    )
    return (
        words.groupBy("word")
        .agg(F.count("*").cast("bigint").alias("n_windows"))
        .orderBy(F.col("n_windows").desc(), F.col("word").asc())
        .limit(10)
    )


TS_SAX_MOTIFS_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
per_user AS (
  SELECT user_id,
         string_agg(CASE WHEN n = 1 THEN 'a' WHEN n = 2 THEN 'b'
                         WHEN n = 3 THEN 'c' ELSE 'd' END,
                    '' ORDER BY day) AS s
  FROM daily GROUP BY user_id
  HAVING COUNT(*) >= 8
),
words AS (
  SELECT substr(s, CAST(i AS INT), 4) AS word
  FROM per_user, unnest(range(1, length(s) - 2)) AS t(i)
)
SELECT word, CAST(COUNT(*) AS BIGINT) AS n_windows
FROM words GROUP BY word
ORDER BY n_windows DESC, word ASC
LIMIT 10
"""

QUERIES["ts_sax_motifs"] = Q(
    ts_sax_motifs,
    TS_SAX_MOTIFS_SQL,
    "SAX time-series motif discovery: symbolized sliding windows, global top-10",
)


def cohort_ltv_curve(spark, sf_dir):
    """Cohort lifetime-value curve — the revenue counterpart of the
    retention triangle: users cohort by first-seen week, revenue buckets
    by whole weeks since that first touch (epoch-day arithmetic DIV 7 —
    convention-free, like `seasonality_dow`), and each (cohort, age)
    cell reports exact cents plus the cohort's cumulative LTV. Two
    aggregations + one bounded window over the ≤|weeks|² triangle."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        (F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(86_400_000))
        .cast("bigint")
        .alias("eday"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    first = base.groupBy("user_id").agg(F.min("eday").alias("d0"))
    cells = (
        base.join(first, "user_id")
        .select(
            F.expr("d0 DIV 7").alias("cohort_week"),
            F.expr("(eday - d0) DIV 7").alias("age_weeks"),
            "cents",
        )
        .groupBy("cohort_week", "age_weeks")
        .agg(F.sum("cents").alias("cents"))
    )
    w = Window.partitionBy("cohort_week").orderBy("age_weeks").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        cells.withColumn("cum_cents", F.sum("cents").over(w))
        .select(
            "cohort_week",
            "age_weeks",
            F.col("cents").cast("bigint").alias("cents"),
            F.col("cum_cents").cast("bigint").alias("cum_cents"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


COHORT_LTV_CURVE_SQL = """
WITH base AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS eday,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
first AS (SELECT user_id, MIN(eday) AS d0 FROM base GROUP BY user_id),
cells AS (
  SELECT f.d0 // 7 AS cohort_week, (b.eday - f.d0) // 7 AS age_weeks,
         SUM(b.cents) AS cents
  FROM base b JOIN first f USING (user_id)
  GROUP BY 1, 2
)
SELECT CAST(cohort_week AS BIGINT) AS cohort_week,
       CAST(age_weeks AS BIGINT) AS age_weeks,
       CAST(cents AS BIGINT) AS cents,
       CAST(SUM(cents) OVER (PARTITION BY cohort_week ORDER BY age_weeks
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
FROM cells ORDER BY cohort_week, age_weeks
"""

QUERIES["cohort_ltv_curve"] = Q(
    cohort_ltv_curve,
    COHORT_LTV_CURVE_SQL,
    "weekly-cohort LTV curve: exact cents per age cell + cumulative per cohort",
)


def events_dow_hour_heatmap(spark, sf_dir):
    """Seasonality heatmap — the (ISO day-of-week × hour) activity grid
    behind capacity planning: counts plus within-dow share ppm, dow
    derived convention-free from epoch days ((eday+3) mod 7 + 1 — the
    `seasonality_dow` rule) so both engines agree without WEEKDAY
    dialect differences. One bounded 168-cell aggregation."""
    ev = load(spark, sf_dir, "events")
    cells = (
        ev.select(
            (
                (
                    F.unix_millis(F.col("ts").cast("timestamp"))
                    / F.lit(86_400_000)
                ).cast("bigint")
                .alias("eday")
            ),
            F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("hour"),
        )
        .select((F.expr("(eday + 3) % 7 + 1")).alias("iso_dow"), "hour")
        .groupBy("iso_dow", "hour")
        .agg(F.count("*").alias("n"))
    )
    from pyspark.sql import Window

    tot = Window.partitionBy("iso_dow")
    return (
        cells.withColumn("t", F.sum("n").over(tot))
        .select(
            "iso_dow",
            "hour",
            F.col("n").cast("bigint").alias("n"),
            F.expr("n * 1000000 DIV t").cast("bigint").alias("dow_share_ppm"),
        )
        .orderBy("iso_dow", "hour")
    )


EVENTS_DOW_HOUR_HEATMAP_SQL = """
WITH cells AS (
  SELECT (epoch_ms(ts) // 86400000 + 3) % 7 + 1 AS iso_dow,
         EXTRACT(hour FROM ts) AS hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT CAST(iso_dow AS BIGINT) AS iso_dow, CAST(hour AS BIGINT) AS hour,
       CAST(n AS BIGINT) AS n,
       CAST(n * 1000000 // SUM(n) OVER (PARTITION BY iso_dow) AS BIGINT) AS dow_share_ppm
FROM cells ORDER BY iso_dow, hour
"""

QUERIES["events_dow_hour_heatmap"] = Q(
    events_dow_hour_heatmap,
    EVENTS_DOW_HOUR_HEATMAP_SQL,
    "dow-by-hour activity heatmap with within-dow shares (convention-free dow)",
)


def daily_local_peaks(spark, sf_dir):
    """Local-maximum detection on each user's daily spend series via
    lag/lead: a day is a peak iff its total strictly exceeds both
    neighbors' (series boundaries excluded, so every comparison has two
    real neighbors). Exact cents grid; one user-keyed aggregation and
    one window pass on the day-level series.
    """
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 86400000").alias("day_idx"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("user_id", "day_idx")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    peaks = (
        daily.withColumn("prev_c", F.lag("day_cents").over(w))
        .withColumn("next_c", F.lead("day_cents").over(w))
        .filter(
            F.col("prev_c").isNotNull()
            & F.col("next_c").isNotNull()
            & (F.col("day_cents") > F.col("prev_c"))
            & (F.col("day_cents") > F.col("next_c"))
        )
    )
    return peaks.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_peaks"),
        F.max("day_cents").cast("bigint").alias("max_peak_cents"),
        F.min("day_idx").cast("bigint").alias("first_peak_day"),
    )


DAILY_LOCAL_PEAKS_SQL = """
WITH daily AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS day_idx,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS day_cents
  FROM events GROUP BY 1, 2
), nbr AS (
  SELECT user_id, day_idx, day_cents,
         LAG(day_cents)  OVER (PARTITION BY user_id ORDER BY day_idx) AS prev_c,
         LEAD(day_cents) OVER (PARTITION BY user_id ORDER BY day_idx) AS next_c
  FROM daily
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_peaks,
       CAST(MAX(day_cents) AS BIGINT) AS max_peak_cents,
       CAST(MIN(day_idx) AS BIGINT) AS first_peak_day
FROM nbr
WHERE prev_c IS NOT NULL AND next_c IS NOT NULL
  AND day_cents > prev_c AND day_cents > next_c
GROUP BY user_id
"""


QUERIES["daily_local_peaks"] = Q(
    daily_local_peaks, DAILY_LOCAL_PEAKS_SQL, "lag/lead local-peak detection"
)


def user_value_drawdown(spark, sf_dir):
    """Maximum drawdown per user on the cumulative daily spend curve:
    running peak (cumulative max) minus current cumulative value,
    maximized over the series. The three stacked windows (cumsum,
    cummax-of-cumsum, max-of-gap) share one user_id×day sort, so Spark
    executes a single window pass. Exact cents arithmetic end-to-end.
    """
    daily = (
        load(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("unix_millis(CAST(ts AS TIMESTAMP)) DIV 86400000").alias("day_idx"),
            # signed contribution: errors spend down, everything else up —
            # gives the curve real drawdowns instead of monotone growth
            F.when(F.col("event_type") == "error", -F.round(F.col("value") * 100))
            .otherwise(F.round(F.col("value") * 100))
            .cast("long")
            .alias("cents"),
        )
        .groupBy("user_id", "day_idx")
        .agg(F.sum("cents").alias("day_cents"))
    )
    w = Window.partitionBy("user_id").orderBy("day_idx").rowsBetween(
        Window.unboundedPreceding, 0
    )
    curve = daily.select(
        "user_id",
        "day_idx",
        F.sum("day_cents").over(w).alias("cum_cents"),
    ).select(
        "user_id",
        "day_idx",
        "cum_cents",
        (F.max("cum_cents").over(w) - F.col("cum_cents")).alias("drawdown"),
    )
    return curve.groupBy("user_id").agg(
        F.max("drawdown").cast("bigint").alias("max_drawdown_cents"),
        F.max("cum_cents").cast("bigint").alias("peak_cents"),
        F.count("*").cast("bigint").alias("n_days"),
    )


USER_VALUE_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT user_id, epoch_ms(ts) // 86400000 AS day_idx,
         SUM(CASE WHEN event_type = 'error'
                  THEN -CAST(ROUND(value * 100) AS BIGINT)
                  ELSE  CAST(ROUND(value * 100) AS BIGINT) END) AS day_cents
  FROM events GROUP BY 1, 2
), curve AS (
  SELECT user_id, day_idx,
         SUM(day_cents) OVER (PARTITION BY user_id ORDER BY day_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM daily
), dd AS (
  SELECT user_id, day_idx, cum_cents,
         MAX(cum_cents) OVER (PARTITION BY user_id ORDER BY day_idx
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cum_cents
           AS drawdown
  FROM curve
)
SELECT user_id,
       CAST(MAX(drawdown) AS BIGINT) AS max_drawdown_cents,
       CAST(MAX(cum_cents) AS BIGINT) AS peak_cents,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM dd GROUP BY user_id
"""


QUERIES["user_value_drawdown"] = Q(
    user_value_drawdown, USER_VALUE_DRAWDOWN_SQL, "running-peak max drawdown (cummax)"
)
