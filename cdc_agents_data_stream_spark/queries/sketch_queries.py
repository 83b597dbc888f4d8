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


def hll_merge_parity(spark, sf_dir):
    """PROOF of sketch mergeability as a query: day-sharded HLL registers
    rolled up with register-wise MAX equal the registers built over the
    whole corpus in one pass, bucket for bucket. This is the property
    that makes HLL safe to pre-aggregate per partition/day and merge at
    rollup time without re-reading raw data — asserted here as a hard
    signal (every row's registers_match), not just claimed."""
    ev = load(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    shard = K.hll_registers(ev, "event_id", ("day",))
    merged = shard.groupBy("bucket").agg(
        F.max("m_j").cast("int").alias("merged_m_j"),
        F.countDistinct("day").cast("long").alias("n_shards_hit"),
    )
    glob = K.hll_registers(ev, "event_id").select(
        "bucket", F.col("m_j").cast("int").alias("global_m_j")
    )
    return (
        merged.join(glob, "bucket")
        .select(
            F.col("bucket").cast("long").alias("bucket"),
            "n_shards_hit",
            "merged_m_j",
            "global_m_j",
            (F.col("merged_m_j") == F.col("global_m_j")).alias("registers_match"),
        )
        .orderBy("bucket")
    )


HLL_MERGE_PARITY_SQL = f"""
WITH h AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
b AS (SELECT day, hv % {K.HLL_M} AS bucket, hv // {K.HLL_M} AS w FROM h),
r AS (
  SELECT day, bucket,
         LEAST(CASE WHEN w = 0 THEN {60 - K.HLL_B + 1}
                    ELSE {60 - K.HLL_B} - length(bin(w)) + 1 END,
               {K.RHO_CAP}) AS rho
  FROM b
),
shard AS (SELECT day, bucket, MAX(rho) AS m_j FROM r GROUP BY 1, 2),
merged AS (
  SELECT bucket, MAX(m_j) AS mm, COUNT(DISTINCT day) AS nsh FROM shard GROUP BY bucket
),
gsk AS (SELECT bucket, MAX(rho) AS gm FROM r GROUP BY bucket)
SELECT CAST(bucket AS BIGINT) AS bucket,
       CAST(nsh AS BIGINT) AS n_shards_hit,
       CAST(mm AS INT) AS merged_m_j,
       CAST(gm AS INT) AS global_m_j,
       mm = gm AS registers_match
FROM merged JOIN gsk USING (bucket) ORDER BY bucket
"""

QUERIES["hll_merge_parity"] = Q(
    hll_merge_parity,
    HLL_MERGE_PARITY_SQL,
    "day-sharded HLL registers merge exactly to the global sketch (mergeability proof)",
)


def hll_rolling_7d_distinct(spark, sf_dir):
    """Trailing-7-day distinct-event estimate per day — the sketch×window
    composition that makes rolling COUNT(DISTINCT) tractable at scale:
    exact rolling distinct needs the full id set per window, but HLL
    registers merge by MAX, so each day's registers are built ONCE and
    contributed to its 7 target days by a map-side explode (no range
    join, no re-reading raw events), then one partial-agg MAX per
    (day, bucket). Register math identical to hll_distinct/`hll_merge_parity`
    — the mergeability that gate proves is what this query exploits.

    The rolled value is event_id (~2.3k distinct per window at sf0.01):
    the raw estimator needs n ≳ 2.5m to be unbiased, and this module
    deliberately omits the small-range linear-counting correction (it
    needs libm ln, which is not cross-engine deterministic). The 150-user
    column sits deep in that bias regime (measured ~2× over-estimate), so
    a production rolling-distinct-USERS would size m down or add the
    correction OUTSIDE the oracle-checked integer core."""
    ev = load(spark, sf_dir, "events").withColumn(
        "eday", F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long")
    )
    day_regs = K.hll_registers(ev, "event_id", ("eday",))
    days = ev.select("eday").distinct()
    fanout = day_regs.select(
        F.explode(
            F.sequence(F.col("eday"), F.col("eday") + F.lit(6))
        ).alias("day"),
        "bucket",
        "m_j",
    )
    merged = (
        fanout.join(days.select(F.col("eday").alias("day")), "day")
        .groupBy("day", "bucket")
        .agg(F.max("m_j").alias("m_j"))
    )
    per_day = merged.groupBy("day").agg(
        F.count("*").cast("long").alias("n_buckets_hit"),
        F.sum(
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({K.RHO_CAP} - m_j AS INT))")
        ).alias("present_sum"),
    )
    full_sum = F.col("present_sum") + (F.lit(K.HLL_M) - F.col("n_buckets_hit")) * F.lit(
        1 << K.RHO_CAP
    ).cast("long")
    return per_day.select(
        "day",
        "n_buckets_hit",
        full_sum.alias("register_sum"),
        F.round(
            F.lit(K.HLL_ALPHA)
            * F.lit(float(K.HLL_M) * float(K.HLL_M))
            * F.lit(float(1 << K.RHO_CAP))
            / full_sum,
            3,
        ).alias("hll_estimate"),
    ).orderBy("day")


HLL_ROLLING_7D_DISTINCT_SQL = f"""
WITH e AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS eday,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events
),
b AS (SELECT eday, hv % {K.HLL_M} AS bucket, hv // {K.HLL_M} AS w FROM e),
r AS (
  SELECT eday, bucket,
         LEAST(CASE WHEN w = 0 THEN {60 - K.HLL_B + 1}
                    ELSE {60 - K.HLL_B} - length(bin(w)) + 1 END,
               {K.RHO_CAP}) AS rho
  FROM b
),
day_regs AS (SELECT eday, bucket, MAX(rho) AS m_j FROM r GROUP BY 1, 2),
days AS (SELECT DISTINCT eday FROM e),
fanout AS (
  SELECT eday + k.k AS day, bucket, m_j
  FROM day_regs, UNNEST([0, 1, 2, 3, 4, 5, 6]) AS k(k)
),
merged AS (
  SELECT f.day, f.bucket, MAX(f.m_j) AS m_j
  FROM fanout f JOIN days d ON d.eday = f.day
  GROUP BY f.day, f.bucket
),
g AS (
  SELECT day, COUNT(*) AS n_buckets_hit,
         SUM((1::BIGINT << CAST({K.RHO_CAP} - m_j AS INT))) AS present_sum
  FROM merged GROUP BY day
)
SELECT CAST(day AS BIGINT) AS day,
       CAST(n_buckets_hit AS BIGINT) AS n_buckets_hit,
       CAST({_FULL} AS BIGINT) AS register_sum,
       ROUND({K.HLL_ALPHA}::DOUBLE * {float(K.HLL_M) * float(K.HLL_M)}::DOUBLE
             * {float(1 << K.RHO_CAP)}::DOUBLE / {_FULL}, 3) AS hll_estimate
FROM g
ORDER BY day
"""

QUERIES["hll_rolling_7d_distinct"] = Q(
    hll_rolling_7d_distinct,
    HLL_ROLLING_7D_DISTINCT_SQL,
    "trailing-7-day distinct estimate via map-side HLL register fan-out (no range join)",
)


def hll_intersection_estimate(spark, sf_dir):
    """Sketch ALGEBRA: audience-overlap estimation between the 'click'
    and 'purchase' user sets by inclusion-exclusion over HLL registers —
    |A∩B| ≈ E(A) + E(B) − E(A∪B), where the union sketch is the
    register-wise MAX (exact sketch union, no rescan) — next to the
    exact overlap. The subtraction amplifies relative error (the known
    trade of sketch intersection), which is precisely why the gate
    reports both; every register and sum is exact integer, the three
    estimates share one division chain."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    regs = K.hll_registers(ev, "user_id", ("event_type",)).localCheckpoint()
    union_regs = regs.groupBy("bucket").agg(F.max("m_j").alias("m_j"))

    def estimate(r, label):
        g = r.agg(
            F.count("*").cast("long").alias("hit"),
            F.sum(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST({K.RHO_CAP} - m_j AS INT))")
            ).alias("present"),
        )
        full = F.col("present") + (F.lit(K.HLL_M) - F.col("hit")) * F.lit(
            1 << K.RHO_CAP
        ).cast("long")
        return g.select(
            F.round(
                F.lit(K.HLL_ALPHA)
                * F.lit(float(K.HLL_M) * K.HLL_M)
                * F.lit(float(1 << K.RHO_CAP))
                / full,
                3,
            ).alias(label)
        )

    ea = estimate(regs.filter(F.col("event_type") == "click"), "est_click")
    eb = estimate(regs.filter(F.col("event_type") == "purchase"), "est_purchase")
    eu = estimate(union_regs, "est_union")
    truth = (
        ev.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("ts"))
        .agg(
            F.sum((F.size("ts") == 2).cast("long")).cast("long").alias("true_inter")
        )
    )
    return (
        ea.crossJoin(eb)
        .crossJoin(eu)
        .crossJoin(truth)
        .select(
            "est_click",
            "est_purchase",
            "est_union",
            F.round(
                F.greatest(
                    F.col("est_click") + F.col("est_purchase") - F.col("est_union"),
                    F.lit(0.0),
                ),
                3,
            ).alias("est_inter"),
            "true_inter",
        )
    )


_E = "(g.present + ({m} - g.hit) * (1::BIGINT << {cap}))".format(m=K.HLL_M, cap=K.RHO_CAP)
_EST = "ROUND({a}::DOUBLE * {m2}::DOUBLE * {scale}::DOUBLE / {full}, 3)".format(
    a=K.HLL_ALPHA, m2=float(K.HLL_M) * K.HLL_M, scale=float(1 << K.RHO_CAP), full=_E
)

HLL_INTERSECTION_ESTIMATE_SQL = f"""
WITH e AS (
  SELECT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS hv
  FROM events WHERE event_type IN ('click', 'purchase')
),
b AS (SELECT event_type, hv % {K.HLL_M} AS bucket, hv // {K.HLL_M} AS w FROM e),
r AS (
  SELECT event_type, bucket,
         LEAST(CASE WHEN w = 0 THEN {60 - K.HLL_B + 1}
                    ELSE {60 - K.HLL_B} - length(bin(w)) + 1 END,
               {K.RHO_CAP}) AS rho
  FROM b
),
regs AS (SELECT event_type, bucket, MAX(rho) AS m_j FROM r GROUP BY 1, 2),
uregs AS (SELECT bucket, MAX(m_j) AS m_j FROM regs GROUP BY bucket),
ga AS (SELECT COUNT(*) AS hit, SUM((1::BIGINT << CAST({K.RHO_CAP} - m_j AS INT))) AS present
       FROM regs WHERE event_type = 'click'),
gb AS (SELECT COUNT(*) AS hit, SUM((1::BIGINT << CAST({K.RHO_CAP} - m_j AS INT))) AS present
       FROM regs WHERE event_type = 'purchase'),
gu AS (SELECT COUNT(*) AS hit, SUM((1::BIGINT << CAST({K.RHO_CAP} - m_j AS INT))) AS present
       FROM uregs),
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS true_inter FROM (
    SELECT user_id FROM events WHERE event_type IN ('click', 'purchase')
    GROUP BY user_id HAVING COUNT(DISTINCT event_type) = 2
  )
),
est AS (
  SELECT (SELECT {_EST} FROM ga g) AS est_click,
         (SELECT {_EST} FROM gb g) AS est_purchase,
         (SELECT {_EST} FROM gu g) AS est_union
)
SELECT est_click, est_purchase, est_union,
       ROUND(GREATEST(est_click + est_purchase - est_union, 0.0), 3) AS est_inter,
       (SELECT true_inter FROM t) AS true_inter
FROM est
"""

QUERIES["hll_intersection_estimate"] = Q(
    hll_intersection_estimate,
    HLL_INTERSECTION_ESTIMATE_SQL,
    "audience overlap by HLL inclusion-exclusion next to the exact count",
)


def log2_histogram_quantiles(spark, sf_dir):
    """DDSketch-style mergeable quantile sketch on a base-2 grid: values
    land in bucket ⌊log2(cents)⌋ (computed EXACTLY as the bit length of
    the integer — no transcendental log, so both engines agree bit-for-
    bit), the per-type bucket histogram is the sketch (counts merge by
    addition — shard/day partials combine associatively like the HLL
    registers), and P50/P99 read off the cumulative histogram with a
    guaranteed relative error ≤ 2× (the base). One partial-agg shuffle
    over (type, bucket) — ≤ ~40 buckets per type regardless of corpus
    size — then a ≤40-row window per type."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            F.greatest(
                F.lit(1), F.round(F.col("value") * 100).cast("bigint")
            ).alias("cents"),
        )
        .select(
            "event_type", (F.length(F.bin(F.col("cents"))) - 1).alias("bucket")
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("event_type"))
    )
    pick = (
        lambda q_num, q_den: F.min(
            F.when(F.col("cum") * q_den >= F.col("n") * q_num, F.col("bucket"))
        )
    )
    return (
        cum.groupBy("event_type")
        .agg(
            F.max("n").cast("bigint").alias("n"),
            pick(1, 2).cast("bigint").alias("p50_bucket"),
            pick(99, 100).cast("bigint").alias("p99_bucket"),
        )
        .select(
            "event_type",
            "n",
            "p50_bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p50_bucket AS INT))").alias("p50_lo_cents"),
            "p99_bucket",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p99_bucket AS INT))").alias("p99_lo_cents"),
        )
        .orderBy("event_type")
    )


LOG2_HISTOGRAM_QUANTILES_SQL = """
WITH hist AS (
  SELECT event_type,
         length(to_base(GREATEST(1, CAST(ROUND(value * 100) AS BIGINT)), 2)) - 1 AS bucket,
         COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, bucket, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY bucket
                        ROWS UNBOUNDED PRECEDING) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist
)
SELECT event_type,
       CAST(MAX(n) AS BIGINT) AS n,
       CAST(MIN(CASE WHEN cum * 2 >= n * 1 THEN bucket END) AS BIGINT) AS p50_bucket,
       CAST(1 << MIN(CASE WHEN cum * 2 >= n * 1 THEN bucket END) AS BIGINT) AS p50_lo_cents,
       CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN bucket END) AS BIGINT) AS p99_bucket,
       CAST(1 << MIN(CASE WHEN cum * 100 >= n * 99 THEN bucket END) AS BIGINT) AS p99_lo_cents
FROM cum GROUP BY event_type ORDER BY event_type
"""

QUERIES["log2_histogram_quantiles"] = Q(
    log2_histogram_quantiles,
    LOG2_HISTOGRAM_QUANTILES_SQL,
    "mergeable base-2 log histogram sketch with bounded-error P50/P99",
)


def log2_hist_merge_parity(spark, sf_dir):
    """Mergeability proof for the base-2 quantile sketch (the property
    `hll_merge_parity` pins for HLL registers): per-day partial
    histograms summed across days must equal the histogram built in one
    global pass — bucket for bucket. The query builds BOTH and emits one
    row per (event_type, bucket) with the two counts and their
    (structurally zero) difference; any nonzero diff fails the oracle
    because the oracle computes the single-pass truth for both
    columns."""
    ev = load(spark, sf_dir, "events")
    binned = ev.select(
        "event_type",
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        (
            F.length(
                F.bin(
                    F.greatest(
                        F.lit(1), F.round(F.col("value") * 100).cast("bigint")
                    )
                )
            )
            - 1
        ).alias("bucket"),
    )
    daily = binned.groupBy("event_type", "day", "bucket").agg(
        F.count("*").alias("part")
    )
    merged = daily.groupBy("event_type", "bucket").agg(
        F.sum("part").cast("bigint").alias("n_merged")
    )
    direct = binned.groupBy("event_type", "bucket").agg(
        F.count("*").cast("bigint").alias("n_direct")
    )
    return (
        merged.join(direct, ["event_type", "bucket"])
        .select(
            "event_type",
            "bucket",
            "n_merged",
            "n_direct",
            (F.col("n_merged") - F.col("n_direct")).cast("bigint").alias("diff"),
        )
        .orderBy("event_type", "bucket")
    )


LOG2_HIST_MERGE_PARITY_SQL = """
WITH binned AS (
  SELECT event_type,
         length(to_base(GREATEST(1, CAST(ROUND(value * 100) AS BIGINT)), 2)) - 1 AS bucket
  FROM events
),
direct AS (
  SELECT event_type, bucket, COUNT(*) AS n FROM binned GROUP BY 1, 2
)
SELECT event_type, bucket,
       CAST(n AS BIGINT) AS n_merged,
       CAST(n AS BIGINT) AS n_direct,
       CAST(0 AS BIGINT) AS diff
FROM direct ORDER BY event_type, bucket
"""

QUERIES["log2_hist_merge_parity"] = Q(
    log2_hist_merge_parity,
    LOG2_HIST_MERGE_PARITY_SQL,
    "day-sharded sketch partials merge exactly to the global histogram",
)
