"""As-of join declared query: each order joined to the user's latest event
at or before order time (point-in-time enrichment). The DuckDB oracle uses
an explicit range-join + rank formulation (deterministic tie-break on
``event_id`` — DuckDB's native ASOF JOIN leaves equal-timestamp ties
unspecified, so both engines pin the same total order)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.asof import asof_join
from .base import Q, load, ms


def orders_asof_event(spark, sf_dir):
    """Orders and events live in different eras in the driver schema
    (1995-2001 vs 2024-01), which would make a backward as-of vacuously
    empty — so the order timestamp is first PROJECTED onto the event
    month (epoch-ms modulo 30 days from 2024-01-01, pure BIGINT
    arithmetic, identical in both engines)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (F.lit(1704067200000) + ms("o_orderdate") % F.lit(2592000000)).alias("order_ts_ms"),
    )
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ms("ts").alias("event_ts_ms")
    )
    return asof_join(
        orders,
        events,
        on="user_id",
        left_ts="order_ts_ms",
        right_ts="event_ts_ms",
        right_payload=["event_id", "event_type", "event_ts_ms"],
        right_tiebreak="event_id",
        how="inner",
    )


ORDERS_ASOF_EVENT_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         1704067200000 + epoch_ms(o_orderdate) % 2592000000 AS order_ts_ms FROM orders
),
e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS event_ts_ms FROM events
),
j AS (
  SELECT o.user_id, o.order_ts_ms, o.o_orderkey, e.event_id, e.event_type, e.event_ts_ms,
         ROW_NUMBER() OVER (
           PARTITION BY o.o_orderkey
           ORDER BY e.event_ts_ms DESC, e.event_id DESC) AS rn
  FROM o JOIN e ON o.user_id = e.user_id AND e.event_ts_ms <= o.order_ts_ms
)
SELECT user_id, order_ts_ms, o_orderkey, event_id, event_type, event_ts_ms
FROM j WHERE rn = 1
"""


def event_attribution_window(spark, sf_dir):
    """Interval join (operators/asof.py::interval_join): every event a
    user produced inside the 24 hours after each of their signup events
    (exclusive end, the signup row itself excluded) — the attribution-
    window shape. Runs as a day-bucketed (user, bucket) equi-join; the
    oracle is the naive range join, proving the rewrite is lossless."""
    from ..operators.asof import interval_join

    ev = load(spark, sf_dir, "events")
    sig = ev.filter(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        ms("ts").alias("start_ms"),
        (ms("ts") + F.lit(86_400_000)).alias("end_ms"),
    )
    pts = ev.select("user_id", "event_id", ms("ts").alias("t_ms"))
    return (
        interval_join(
            pts, sig, on="user_id", point_ts="t_ms", start_ts="start_ms",
            end_ts="end_ms",
        )
        .filter(F.col("event_id") != F.col("signup_id"))
        .select(
            "user_id",
            "signup_id",
            "event_id",
            (F.col("t_ms") - F.col("start_ms")).alias("delta_ms"),
        )
    )


EVENT_ATTRIBUTION_WINDOW_SQL = """
WITH sig AS (
  SELECT user_id, event_id AS signup_id, epoch_ms(ts) AS start_ms,
         epoch_ms(ts) + 86400000 AS end_ms
  FROM events WHERE event_type = 'signup'
),
pts AS (SELECT user_id, event_id, epoch_ms(ts) AS t_ms FROM events)
SELECT s.user_id, s.signup_id, p.event_id, p.t_ms - s.start_ms AS delta_ms
FROM sig s
JOIN pts p
  ON p.user_id = s.user_id AND p.t_ms >= s.start_ms AND p.t_ms < s.end_ms
WHERE p.event_id <> s.signup_id
"""


QUERIES = {
    "orders_asof_event": Q(orders_asof_event, ORDERS_ASOF_EVENT_SQL, "as-of join"),
    "event_attribution_window": Q(
        event_attribution_window,
        EVENT_ATTRIBUTION_WINDOW_SQL,
        "day-bucketed interval join (attribution windows)",
    ),
}


def orders_asof_next_event(spark, sf_dir):
    """Forward as-of: each order joined to the user's NEXT event at or
    after order time — the post-purchase-behavior enrichment (pandas
    merge_asof direction='forward'). Same union + carry machinery as the
    backward join, scanning time-descending; ties at equal timestamps
    break to the greatest event_id, matching the oracle's rank."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (F.lit(1704067200000) + ms("o_orderdate") % F.lit(2592000000)).alias("order_ts_ms"),
    )
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ms("ts").alias("event_ts_ms")
    )
    return asof_join(
        orders,
        events,
        on="user_id",
        left_ts="order_ts_ms",
        right_ts="event_ts_ms",
        right_payload=["event_id", "event_type", "event_ts_ms"],
        right_tiebreak="event_id",
        how="inner",
        direction="forward",
    )


ORDERS_ASOF_NEXT_EVENT_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         1704067200000 + epoch_ms(o_orderdate) % 2592000000 AS order_ts_ms FROM orders
),
e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS event_ts_ms FROM events
),
j AS (
  SELECT o.user_id, o.order_ts_ms, o.o_orderkey, e.event_id, e.event_type, e.event_ts_ms,
         ROW_NUMBER() OVER (
           PARTITION BY o.o_orderkey
           ORDER BY e.event_ts_ms ASC, e.event_id DESC) AS rn
  FROM o JOIN e ON o.user_id = e.user_id AND e.event_ts_ms >= o.order_ts_ms
)
SELECT user_id, order_ts_ms, o_orderkey, event_id, event_type, event_ts_ms
FROM j WHERE rn = 1
"""

QUERIES["orders_asof_next_event"] = Q(
    orders_asof_next_event,
    ORDERS_ASOF_NEXT_EVENT_SQL,
    "forward as-of join: next event at-or-after each order",
)


def orders_asof_tolerance(spark, sf_dir):
    """As-of join with a staleness tolerance (pandas ``merge_asof``
    ``tolerance=``): each order takes the user's latest event at-or-
    before order time ONLY if it is at most 7 days old; staler matches
    null out but the order row survives (left semantics). Because the
    as-of kernel picks the single latest predecessor, in-tolerance
    equals ``matched_ts >= order_ts − 7d`` — one map-side predicate on
    the already-carried match timestamp, no second join. The oracle
    ranks events inside the [order_ts−7d, order_ts] window directly."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (F.lit(1704067200000) + ms("o_orderdate") % F.lit(2592000000)).alias("order_ts_ms"),
    )
    events = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ms("ts").alias("event_ts_ms")
    )
    j = asof_join(
        orders,
        events,
        on="user_id",
        left_ts="order_ts_ms",
        right_ts="event_ts_ms",
        right_payload=["event_id", "event_type", "event_ts_ms"],
        right_tiebreak="event_id",
        how="left",
    )
    in_tol = F.col("event_ts_ms").isNotNull() & (
        F.col("event_ts_ms") >= F.col("order_ts_ms") - F.lit(604_800_000)
    )
    return j.select(
        "user_id",
        "order_ts_ms",
        "o_orderkey",
        F.when(in_tol, F.col("event_id")).alias("event_id"),
        F.when(in_tol, F.col("event_type")).alias("event_type"),
        F.when(in_tol, F.col("event_ts_ms")).alias("event_ts_ms"),
        in_tol.cast("int").alias("matched"),
    )


ORDERS_ASOF_TOLERANCE_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         1704067200000 + epoch_ms(o_orderdate) % 2592000000 AS order_ts_ms FROM orders
),
e AS (
  SELECT user_id, event_id, event_type, epoch_ms(ts) AS event_ts_ms FROM events
),
j AS (
  SELECT o.user_id, o.order_ts_ms, o.o_orderkey, e.event_id, e.event_type, e.event_ts_ms,
         ROW_NUMBER() OVER (
           PARTITION BY o.o_orderkey
           ORDER BY e.event_ts_ms DESC, e.event_id DESC) AS rn
  FROM o JOIN e ON o.user_id = e.user_id
    AND e.event_ts_ms <= o.order_ts_ms
    AND e.event_ts_ms >= o.order_ts_ms - 604800000
)
SELECT o.user_id, o.order_ts_ms, o.o_orderkey,
       j.event_id, j.event_type, j.event_ts_ms,
       CAST(CASE WHEN j.event_id IS NOT NULL THEN 1 ELSE 0 END AS INT) AS matched
FROM o LEFT OUTER JOIN (SELECT * FROM j WHERE rn = 1) j ON o.o_orderkey = j.o_orderkey
"""

QUERIES["orders_asof_tolerance"] = Q(
    orders_asof_tolerance,
    ORDERS_ASOF_TOLERANCE_SQL,
    "as-of join with 7-day staleness tolerance (stale matches null, left rows survive)",
)


def pit_feature_join(spark, sf_dir):
    """Point-in-time feature-store join: one label spine (orders) picks
    up features from TWO feature groups — the user's latest purchase
    value and latest view recency — each as-of the label timestamp, with
    no leakage from the future. Two chained as-of kernels over the same
    user-keyed partitioning (the second shuffle co-locates with the
    first at scale via the shared key); left semantics throughout so the
    spine never loses rows. The oracle states each feature group as a
    ranked window over the leak-free prefix."""
    # same era projection as orders_asof_event (see its docstring):
    # without it the leak-free prefix is empty and every feature nulls.
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (F.lit(1704067200000) + ms("o_orderdate") % F.lit(2592000000)).alias("order_ts_ms"),
    )
    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_event_id"),
        F.round(F.col("value") * 100).cast("long").alias("purchase_cents"),
        ms("ts").alias("p_ts_ms"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id",
        F.col("event_id").alias("v_event_id"),
        ms("ts").alias("v_ts_ms"),
    )
    step1 = asof_join(
        orders,
        purchases,
        on="user_id",
        left_ts="order_ts_ms",
        right_ts="p_ts_ms",
        right_payload=["purchase_cents", "p_ts_ms"],
        right_tiebreak="p_event_id",
        how="left",
    )
    step2 = asof_join(
        step1,
        views,
        on="user_id",
        left_ts="order_ts_ms",
        right_ts="v_ts_ms",
        right_payload=["v_ts_ms"],
        right_tiebreak="v_event_id",
        how="left",
    )
    return step2.select(
        "o_orderkey",
        "user_id",
        "order_ts_ms",
        "purchase_cents",
        (F.col("order_ts_ms") - F.col("v_ts_ms")).alias("view_age_ms"),
    )


PIT_FEATURE_JOIN_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         1704067200000 + epoch_ms(o_orderdate) % 2592000000 AS order_ts_ms FROM orders
),
p AS (
  SELECT user_id, event_id, CAST(ROUND(value * 100) AS BIGINT) AS purchase_cents,
         epoch_ms(ts) AS p_ts_ms
  FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, event_id, epoch_ms(ts) AS v_ts_ms
  FROM events WHERE event_type = 'view'
),
f1 AS (
  SELECT o.o_orderkey, p.purchase_cents,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                            ORDER BY p.p_ts_ms DESC, p.event_id DESC) AS rn
  FROM o JOIN p ON o.user_id = p.user_id AND p.p_ts_ms <= o.order_ts_ms
),
f2 AS (
  SELECT o.o_orderkey, o.order_ts_ms - v.v_ts_ms AS view_age_ms,
         ROW_NUMBER() OVER (PARTITION BY o.o_orderkey
                            ORDER BY v.v_ts_ms DESC, v.event_id DESC) AS rn
  FROM o JOIN v ON o.user_id = v.user_id AND v.v_ts_ms <= o.order_ts_ms
)
SELECT o.o_orderkey, o.user_id, o.order_ts_ms,
       f1.purchase_cents, f2.view_age_ms
FROM o
LEFT OUTER JOIN (SELECT o_orderkey, purchase_cents FROM f1 WHERE rn = 1) f1
  ON o.o_orderkey = f1.o_orderkey
LEFT OUTER JOIN (SELECT o_orderkey, view_age_ms FROM f2 WHERE rn = 1) f2
  ON o.o_orderkey = f2.o_orderkey
"""

QUERIES["pit_feature_join"] = Q(
    pit_feature_join,
    PIT_FEATURE_JOIN_SQL,
    "point-in-time feature retrieval: two leak-free as-of feature groups on one spine",
)


def linear_attribution_credit(spark, sf_dir):
    """Multi-touch LINEAR attribution: each order's value splits equally
    across every event the user produced in the 7 days before it
    (credit = cents DIV n_touches, remainder to the earliest touch so
    credits sum EXACTLY to the order value — the same largest-remainder
    discipline as the budget allocator). Touch discovery is the
    day-bucketed interval join; per-type credit rolls up in one partial
    agg. Integer end-to-end."""
    from pyspark.sql import Window

    # same era projection as orders_asof_event: order dates (1995-2001)
    # mapped onto the 2024-01 event month so the 7-day lookback is
    # non-degenerate; pure BIGINT arithmetic, identical in both engines.
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 13 == 0).select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        (F.lit(1704067200000) + ms("o_orderdate") % F.lit(2592000000)).alias("order_ts_ms"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", ms("ts").alias("t_ms")
    )
    touches = orders.join(
        ev,
        (orders.user_id == ev.user_id)
        & (ev.t_ms <= orders.order_ts_ms)
        & (ev.t_ms > orders.order_ts_ms - F.lit(604_800_000)),
    ).select(orders.o_orderkey, orders.cents, ev.event_id, ev.event_type, ev.t_ms)
    w = Window.partitionBy("o_orderkey")
    w_first = Window.partitionBy("o_orderkey").orderBy("t_ms", "event_id")
    credited = touches.select(
        "o_orderkey",
        "event_type",
        (F.col("cents") / F.count("*").over(w)).cast("long").alias("base_credit"),
        (
            (F.col("cents") % F.count("*").over(w))
            * (F.row_number().over(w_first) == 1).cast("long")
        ).alias("remainder_credit"),
    )
    return credited.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum(F.col("base_credit") + F.col("remainder_credit")).cast("long").alias("credit_cents"),
    )


LINEAR_ATTRIBUTION_CREDIT_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey AS user_id,
         1704067200000 + epoch_ms(o_orderdate) % 2592000000 AS order_ts_ms,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders WHERE o_orderkey % 13 = 0
),
touches AS (
  SELECT o.o_orderkey, o.cents, e.event_id, e.event_type, epoch_ms(e.ts) AS t_ms
  FROM o JOIN events e
    ON o.user_id = e.user_id
   AND epoch_ms(e.ts) <= o.order_ts_ms
   AND epoch_ms(e.ts) > o.order_ts_ms - 604800000
),
credited AS (
  SELECT event_type,
         cents // COUNT(*) OVER w AS base_credit,
         (cents % COUNT(*) OVER w)
           * CASE WHEN ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY t_ms, event_id) = 1
                  THEN 1 ELSE 0 END AS remainder_credit
  FROM touches
  WINDOW w AS (PARTITION BY o_orderkey)
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
       CAST(SUM(base_credit + remainder_credit) AS BIGINT) AS credit_cents
FROM credited GROUP BY event_type
"""

QUERIES["linear_attribution_credit"] = Q(
    linear_attribution_credit,
    LINEAR_ATTRIBUTION_CREDIT_SQL,
    "multi-touch linear attribution: exact integer credit split, remainder to first touch",
)
