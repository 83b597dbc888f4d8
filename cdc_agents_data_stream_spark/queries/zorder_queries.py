"""Z-order clustering gate: the Morton key itself is the hard signal
(shared bit-interleave formula, engine-exact); the data-skipping payoff
(narrow per-file min/max on every interleaved column) is proven by
`tests/test_zorder.py` against real parquet footers."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import zorder as Z
from .base import Q, load

_BITS = 10
_COLS = ["ux", "vy"]
_Z_SQL = Z.zorder_expr_sql(_COLS, _BITS)


def zorder_events_key(spark, sf_dir):
    """Morton key over (user_id, rounded value) for every event — the
    clustering key `zorder_layout` range-partitions a lake table by."""
    ev = load(spark, sf_dir, "events")
    norm = ev.select(
        "event_id",
        (F.col("user_id") % 1024).cast("long").alias("ux"),
        F.least(F.round(F.col("value")).cast("long"), F.lit(1023)).alias("vy"),
    )
    return Z.with_zorder_key(norm, _COLS, _BITS).orderBy("event_id")


ZORDER_EVENTS_KEY_SQL = f"""
WITH norm AS (
  SELECT event_id,
         CAST(user_id % 1024 AS BIGINT) AS ux,
         LEAST(CAST(ROUND(value) AS BIGINT), 1023) AS vy
  FROM events
)
SELECT event_id, ux, vy, CAST({_Z_SQL} AS BIGINT) AS zval
FROM norm
ORDER BY event_id
"""


QUERIES = {
    "zorder_events_key": Q(
        zorder_events_key,
        ZORDER_EVENTS_KEY_SQL,
        "Morton z-order clustering key for multi-column data skipping",
    ),
}
