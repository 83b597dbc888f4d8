"""Sketch queries (operators/sketches.py) with engine-exact oracles: the
integer register sum is the hard signal; the float estimate derives from
it by one shared division chain."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sketches as K
from .base import Q, load


def hll_distinct_events(spark, sf_dir):
    """Per-event-type HyperLogLog estimate of distinct event ids next to
    the exact count — the register sum is exact int64 in both engines
    (see operators/sketches.py for why no float touches the registers)."""
    ev = load(spark, sf_dir, "events")
    true_counts = ev.groupBy("event_type").agg(
        F.countDistinct("event_id").cast("long").alias("n_true")
    )
    return K.hll_distinct(ev, "event_type", "event_id").join(
        true_counts, "event_type"
    ).select(
        "event_type", "n_true", "n_buckets_hit", "register_sum", "hll_estimate"
    )


_SCALE = float(1 << K.RHO_CAP)
_FULL = f"(g.present_sum + ({K.HLL_M} - g.n_buckets_hit) * (1::BIGINT << {K.RHO_CAP}))"

HLL_DISTINCT_EVENTS_SQL = f"""
WITH h AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
b AS (SELECT event_type, hv % {K.HLL_M} AS bucket, hv // {K.HLL_M} AS w FROM h),
r AS (
  SELECT event_type, bucket,
         LEAST(CASE WHEN w = 0 THEN {60 - K.HLL_B + 1}
                    ELSE {60 - K.HLL_B} - length(bin(w)) + 1 END,
               {K.RHO_CAP}) AS rho
  FROM b
),
regs AS (SELECT event_type, bucket, MAX(rho) AS m_j FROM r GROUP BY 1, 2),
g AS (
  SELECT event_type, COUNT(*) AS n_buckets_hit,
         SUM((1::BIGINT << CAST({K.RHO_CAP} - m_j AS INT))) AS present_sum
  FROM regs GROUP BY event_type
),
t AS (SELECT event_type, COUNT(DISTINCT event_id) AS n_true FROM events GROUP BY 1)
SELECT g.event_type,
       CAST(t.n_true AS BIGINT) AS n_true,
       CAST(g.n_buckets_hit AS BIGINT) AS n_buckets_hit,
       CAST({_FULL} AS BIGINT) AS register_sum,
       ROUND({K.HLL_ALPHA}::DOUBLE * {float(K.HLL_M) * float(K.HLL_M)}::DOUBLE
             * {_SCALE}::DOUBLE / {_FULL}, 3) AS hll_estimate
FROM g JOIN t USING (event_type)
"""

def cms_user_frequencies(spark, sf_dir):
    """Count-min frequency estimates for every user next to exact counts:
    the sketch (d×w integer counters) is built in one bounded-shuffle
    aggregation, broadcast, and probed with a map — cms_est >= true
    always, equal in the absence of collisions."""
    ev = load(spark, sf_dir, "events")
    sketch = K.cms_build(ev, "user_id")
    est = K.cms_estimate(sketch, ev.select("user_id").distinct(), "user_id")
    true_counts = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("true_cnt"))
    return est.join(true_counts, "user_id").select("user_id", "true_cnt", "cms_est")


CMS_USER_FREQUENCIES_SQL = f"""
WITH probes AS (
  SELECT user_id, j,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)),
                             1, 15) AS BIGINT) % {K.CMS_W} AS bucket
  FROM events, UNNEST([0, 1, 2]) AS t(j)
),
sketch AS (SELECT j, bucket, COUNT(*) AS cnt FROM probes GROUP BY j, bucket),
uprobe AS (SELECT DISTINCT user_id, j, bucket FROM probes),
est AS (
  SELECT u.user_id, CAST(MIN(s.cnt) AS BIGINT) AS cms_est
  FROM uprobe u JOIN sketch s USING (j, bucket)
  GROUP BY u.user_id
),
t AS (SELECT user_id, COUNT(*) AS true_cnt FROM events GROUP BY user_id)
SELECT est.user_id, CAST(t.true_cnt AS BIGINT) AS true_cnt, est.cms_est
FROM est JOIN t USING (user_id)
"""


QUERIES = {
    "hll_distinct_events": Q(
        hll_distinct_events,
        HLL_DISTINCT_EVENTS_SQL,
        "deterministic HyperLogLog distinct sketch",
    ),
    "cms_user_frequencies": Q(
        cms_user_frequencies,
        CMS_USER_FREQUENCIES_SQL,
        "count-min frequency sketch with exact-count comparison",
    ),
}
