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
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        ms("o_orderdate").alias("order_ts_ms"),
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
  SELECT o_orderkey, o_custkey AS user_id, epoch_ms(o_orderdate) AS order_ts_ms FROM orders
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


QUERIES = {
    "orders_asof_event": Q(orders_asof_event, ORDERS_ASOF_EVENT_SQL, "as-of join"),
}
