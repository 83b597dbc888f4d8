"""Tumbling-window rollup declared query with a DuckDB ``time_bucket``
oracle (both engines align buckets to the epoch origin)."""

from __future__ import annotations

from ..operators.windows import tumbling_agg
from .base import Q, load


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


QUERIES = {
    "events_hourly_rollup": Q(events_hourly_rollup, EVENTS_HOURLY_ROLLUP_SQL, "tumbling window"),
}
