"""Data-quality constraint report — the deequ/dbt-test surface a lake
pipeline runs before training on a new drop.

One gate emits a row per declared constraint: primary-key uniqueness,
foreign-key coverage, null ratios, domain bounds, and freshness — each as
(constraint, observed BIGINT, ok flag). Every check is a single-pass
aggregate or a broadcast/semi-join (FK coverage: the dimension side is
the small one — Catalyst broadcasts it); nothing scans a table more than
once per check family, and at 100 TB each check is exactly the plan you
would hand-write. Counts are BIGINT, ratios ×1e6 on the integer grid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .base import Q, load, ms


def data_quality_report(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    docs = load(spark, sf_dir, "documents")

    # single-pass profile of events: PK uniqueness + null ratio + domain
    ev_prof = ev.agg(
        F.count("*").alias("n"),
        F.countDistinct("event_id").alias("n_ids"),
        F.sum(F.col("user_id").isNull().cast("long")).alias("null_uid"),
        F.sum((F.col("value") < 0).cast("long")).alias("neg_value"),
        F.max(F.unix_millis(F.col("ts").cast("timestamp"))).alias("max_ts_ms"),
    )
    # FK coverage: orders.o_custkey ⊆ customer.c_custkey (dim side broadcast)
    fk_miss = (
        orders.join(
            customer.select(F.col("c_custkey").alias("k")).distinct().hint("broadcast"),
            orders["o_custkey"] == F.col("k"),
            "left_anti",
        )
        .agg(F.count("*").alias("n_miss"))
    )
    doc_prof = docs.agg(
        F.count("*").alias("n_docs"),
        F.sum((F.length(F.col("text")) == 0).cast("long")).alias("empty_text"),
        F.sum(F.col("lang").isNull().cast("long")).alias("null_lang"),
    )

    e = ev_prof.collect()[0]
    f = fk_miss.collect()[0]
    d = doc_prof.collect()[0]
    rows = [
        ("events.event_id unique", int(e["n"] - e["n_ids"]), int(e["n"] == e["n_ids"])),
        ("events.user_id not null", int(e["null_uid"]), int(e["null_uid"] == 0)),
        ("events.value >= 0", int(e["neg_value"]), int(e["neg_value"] == 0)),
        ("events freshness max_ts_ms", int(e["max_ts_ms"]), 1),
        ("orders.o_custkey fk coverage", int(f["n_miss"]), int(f["n_miss"] == 0)),
        ("documents.text non-empty", int(d["empty_text"]), int(d["empty_text"] == 0)),
        ("documents.lang not null", int(d["null_lang"]), int(d["null_lang"] == 0)),
    ]
    return spark.createDataFrame(
        rows, "check_name string, observed long, ok int"
    ).orderBy("check_name")


DATA_QUALITY_REPORT_SQL = """
WITH e AS (
  SELECT COUNT(*) AS n, COUNT(DISTINCT event_id) AS n_ids,
         SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS null_uid,
         SUM(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS neg_value,
         MAX(epoch_ms(ts)) AS max_ts_ms
  FROM events
),
f AS (
  SELECT COUNT(*) AS n_miss FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
),
d AS (
  SELECT COUNT(*) AS n_docs,
         SUM(CASE WHEN length(text) = 0 THEN 1 ELSE 0 END) AS empty_text,
         SUM(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS null_lang
  FROM documents
)
SELECT * FROM (
  SELECT 'events.event_id unique' AS check_name,
         CAST(n - n_ids AS BIGINT) AS observed,
         CAST(CASE WHEN n = n_ids THEN 1 ELSE 0 END AS INT) AS ok FROM e
  UNION ALL
  SELECT 'events.user_id not null', CAST(null_uid AS BIGINT),
         CAST(CASE WHEN null_uid = 0 THEN 1 ELSE 0 END AS INT) FROM e
  UNION ALL
  SELECT 'events.value >= 0', CAST(neg_value AS BIGINT),
         CAST(CASE WHEN neg_value = 0 THEN 1 ELSE 0 END AS INT) FROM e
  UNION ALL
  SELECT 'events freshness max_ts_ms', CAST(max_ts_ms AS BIGINT),
         CAST(1 AS INT) FROM e
  UNION ALL
  SELECT 'orders.o_custkey fk coverage', CAST(n_miss AS BIGINT),
         CAST(CASE WHEN n_miss = 0 THEN 1 ELSE 0 END AS INT) FROM f
  UNION ALL
  SELECT 'documents.text non-empty', CAST(empty_text AS BIGINT),
         CAST(CASE WHEN empty_text = 0 THEN 1 ELSE 0 END AS INT) FROM d
  UNION ALL
  SELECT 'documents.lang not null', CAST(null_lang AS BIGINT),
         CAST(CASE WHEN null_lang = 0 THEN 1 ELSE 0 END AS INT) FROM d
)
ORDER BY check_name
"""


QUERIES = {
    "data_quality_report": Q(
        data_quality_report,
        DATA_QUALITY_REPORT_SQL,
        "deequ-style data-quality constraint report",
    ),
}


def table_stats_profile(spark, sf_dir):
    """The ANALYZE TABLE surface as a query: per-column statistics of
    lineitem's key numeric columns (row count, nulls, exact NDV, min/max
    on the cent grid) computed in ONE pass — a single aggregate row
    unpivoted to one row per column via stack(), the CBO-feeding shape.
    At scale the exact count-distinct becomes approx_count_distinct; the
    rest of the plan is unchanged (one partial-agg reduction, no
    shuffle-by-column)."""
    li = load(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    aggs = []
    for c in cols:
        cents = F.round(F.col(c) * 100).cast("long")
        aggs += [
            F.count(F.lit(1)).cast("long").alias(f"{c}_n"),
            F.sum(F.col(c).isNull().cast("long")).cast("long").alias(f"{c}_nulls"),
            F.countDistinct(cents).cast("long").alias(f"{c}_ndv"),
            F.min(cents).alias(f"{c}_min_cents"),
            F.max(cents).alias(f"{c}_max_cents"),
        ]
    one = li.agg(*aggs)
    stack_expr = ", ".join(
        f"'{c}', {c}_n, {c}_nulls, {c}_ndv, {c}_min_cents, {c}_max_cents" for c in cols
    )
    return one.select(
        F.expr(
            f"stack({len(cols)}, {stack_expr}) AS "
            "(col_name, n_rows, n_nulls, ndv, min_cents, max_cents)"
        )
    ).orderBy("col_name")


TABLE_STATS_PROFILE_SQL = """
WITH a AS (
  SELECT
    CAST(COUNT(*) AS BIGINT) AS n,
    CAST(SUM(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS q_nulls,
    CAST(COUNT(DISTINCT CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_ndv,
    CAST(MIN(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_min,
    CAST(MAX(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS q_max,
    CAST(SUM(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS p_nulls,
    CAST(COUNT(DISTINCT CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p_ndv,
    CAST(MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p_min,
    CAST(MAX(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS p_max,
    CAST(SUM(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS d_nulls,
    CAST(COUNT(DISTINCT CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS d_ndv,
    CAST(MIN(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS d_min,
    CAST(MAX(CAST(ROUND(l_discount * 100) AS BIGINT)) AS BIGINT) AS d_max
  FROM lineitem
)
SELECT 'l_discount' AS col_name, n AS n_rows, d_nulls AS n_nulls, d_ndv AS ndv,
       d_min AS min_cents, d_max AS max_cents FROM a
UNION ALL
SELECT 'l_extendedprice', n, p_nulls, p_ndv, p_min, p_max FROM a
UNION ALL
SELECT 'l_quantity', n, q_nulls, q_ndv, q_min, q_max FROM a
ORDER BY col_name
"""

QUERIES["table_stats_profile"] = Q(
    table_stats_profile,
    TABLE_STATS_PROFILE_SQL,
    "one-pass ANALYZE-style per-column statistics, unpivoted via stack()",
)


def json_corrupt_tolerance(spark, sf_dir):
    """Malformed-record tolerance — the PERMISSIVE-parse accounting every
    JSON ingest needs: rows where event_id % 7 == 0 get their props
    payload deterministically corrupted (unbalanced brace appended), the
    parse maps corrupt rows to NULL instead of failing the job, and the
    gate reports per-type valid/corrupt counts plus the exact k-sum over
    rows that survived the parse. Spark's `from_json` returns null on
    malformed input; DuckDB's `json_valid` guards the same rows — the
    cross-engine contract is the COUNTS, pinned here."""
    ev = load(spark, sf_dir, "events").withColumn(
        "props2",
        F.when(
            F.col("event_id") % 7 == 0,
            F.expr("substring(props, 1, length(props) - 1)"),
        ).otherwise(F.col("props")),
    )
    parsed = ev.withColumn(
        "k_val", F.from_json("props2", "struct<k: long>")["k"]
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.sum(F.col("k_val").isNull().cast("long")).cast("long").alias("n_corrupt"),
            F.sum(F.coalesce(F.col("k_val"), F.lit(0))).cast("long").alias("k_sum_valid"),
        )
        .orderBy("event_type")
    )


JSON_CORRUPT_TOLERANCE_SQL = """
WITH e AS (
  SELECT event_type,
         CASE WHEN event_id % 7 = 0 THEN substr(props, 1, length(props) - 1)
              ELSE props END AS props2
  FROM events
),
p AS (
  SELECT event_type,
         CASE WHEN json_valid(props2)
              THEN CAST(json_extract(props2, '$.k') AS BIGINT)
              ELSE NULL END AS k_val
  FROM e
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN k_val IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
       CAST(SUM(COALESCE(k_val, 0)) AS BIGINT) AS k_sum_valid
FROM p
GROUP BY event_type ORDER BY event_type
"""

QUERIES["json_corrupt_tolerance"] = Q(
    json_corrupt_tolerance,
    JSON_CORRUPT_TOLERANCE_SQL,
    "PERMISSIVE JSON parse accounting: corrupt rows null out, never fail the job",
)


def value_drift_l1(spark, sf_dir):
    """Distribution-drift monitor: per event type, the L1 distance
    between the value histograms of the FIRST and SECOND half of the
    time range (20 equi-width buckets), on the ppm integer grid — the
    log-free alternative to PSI/KL (whose ln is not cross-engine
    deterministic). Proportions are integer ppm (n_bucket·10⁶ DIV
    n_half), so the statistic is exact; 0 = identical shape, 2·10⁶ =
    disjoint. Two partial-agg passes, shuffle bounded by types×buckets."""
    ev = load(spark, sf_dir, "events").select(
        "event_type",
        ms("ts").alias("ts_ms"),
        F.least(
            F.greatest(F.floor(F.col("value") / 5).cast("long"), F.lit(0)), F.lit(19)
        ).alias("bucket"),
    )
    # integer midpoint: float `/` then cast is NOT portable (Spark's
    # double->long cast truncates, DuckDB's rounds half-even)
    mid = ev.agg(
        F.expr("(MIN(ts_ms) + MAX(ts_ms)) DIV 2").cast("long").alias("mid_ms")
    )
    halved = ev.crossJoin(F.broadcast(mid)).withColumn(
        "half", (F.col("ts_ms") >= F.col("mid_ms")).cast("int")
    )
    counts = halved.groupBy("event_type", "half", "bucket").agg(
        F.count("*").cast("long").alias("n")
    )
    totals = counts.groupBy("event_type", "half").agg(
        F.sum("n").cast("long").alias("n_half")
    )
    props = counts.join(totals, ["event_type", "half"]).select(
        "event_type",
        "bucket",
        "half",
        F.expr("(n * 1000000) DIV n_half").cast("long").alias("p_ppm"),
    )
    p0 = props.filter(F.col("half") == 0).select(
        "event_type", "bucket", F.col("p_ppm").alias("p0")
    )
    p1 = props.filter(F.col("half") == 1).select(
        "event_type", "bucket", F.col("p_ppm").alias("p1")
    )
    joined = p0.join(p1, ["event_type", "bucket"], "full_outer").select(
        "event_type",
        F.abs(F.coalesce("p0", F.lit(0)) - F.coalesce("p1", F.lit(0))).alias("d"),
    )
    return (
        joined.groupBy("event_type")
        .agg(F.sum("d").cast("long").alias("l1_ppm"))
        .orderBy("event_type")
    )


VALUE_DRIFT_L1_SQL = """
WITH e AS (
  SELECT event_type, epoch_ms(ts) AS ts_ms,
         CAST(LEAST(GREATEST(FLOOR(value / 5), 0), 19) AS BIGINT) AS bucket
  FROM events
),
m AS (SELECT CAST((MIN(ts_ms) + MAX(ts_ms)) // 2 AS BIGINT) AS mid_ms FROM e),
h AS (
  SELECT event_type, bucket,
         CASE WHEN ts_ms >= (SELECT mid_ms FROM m) THEN 1 ELSE 0 END AS half
  FROM e
),
counts AS (
  SELECT event_type, half, bucket, CAST(COUNT(*) AS BIGINT) AS n
  FROM h GROUP BY 1, 2, 3
),
totals AS (
  SELECT event_type, half, CAST(SUM(n) AS BIGINT) AS n_half
  FROM counts GROUP BY 1, 2
),
props AS (
  SELECT c.event_type, c.bucket, c.half,
         CAST((c.n * 1000000) // t.n_half AS BIGINT) AS p_ppm
  FROM counts c JOIN totals t USING (event_type, half)
),
j AS (
  SELECT COALESCE(p0.event_type, p1.event_type) AS event_type,
         ABS(COALESCE(p0.p_ppm, 0) - COALESCE(p1.p_ppm, 0)) AS d
  FROM (SELECT * FROM props WHERE half = 0) p0
  FULL OUTER JOIN (SELECT * FROM props WHERE half = 1) p1
    ON p0.event_type = p1.event_type AND p0.bucket = p1.bucket
)
SELECT event_type, CAST(SUM(d) AS BIGINT) AS l1_ppm
FROM j GROUP BY event_type ORDER BY event_type
"""

QUERIES["value_drift_l1"] = Q(
    value_drift_l1,
    VALUE_DRIFT_L1_SQL,
    "first-half vs second-half histogram L1 drift per type (ppm grid, log-free)",
)


def class_weights_inverse(spark, sf_dir):
    """Inverse-frequency class weights for imbalanced training — the
    sklearn `balanced` rule w_c = N/(k·n_c) on the ppm integer grid, one
    tiny aggregate + a broadcast scalar; the weight table every skewed
    classification run feeds its loss."""
    docs = load(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").cast("long").alias("n_class"))
    totals = counts.agg(
        F.sum("n_class").cast("long").alias("n_total"),
        F.count("*").cast("long").alias("k_classes"),
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "lang",
            "n_class",
            F.expr("(n_total * 1000000) DIV (k_classes * n_class)")
            .cast("long")
            .alias("weight_ppm"),
        )
        .orderBy("lang")
    )


CLASS_WEIGHTS_INVERSE_SQL = """
WITH c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_class FROM documents GROUP BY lang),
t AS (SELECT CAST(SUM(n_class) AS BIGINT) AS n_total, CAST(COUNT(*) AS BIGINT) AS k_classes FROM c)
SELECT c.lang, c.n_class,
       CAST((t.n_total * 1000000) // (t.k_classes * c.n_class) AS BIGINT) AS weight_ppm
FROM c, t ORDER BY c.lang
"""

QUERIES["class_weights_inverse"] = Q(
    class_weights_inverse,
    CLASS_WEIGHTS_INVERSE_SQL,
    "inverse-frequency (balanced) class weights on the ppm grid",
)


def null_key_grouping(spark, sf_dir):
    """NULL-semantics pin: event types nulled for event_id % 11 == 0,
    then grouped — both engines must put all NULL keys in ONE group
    (SQL GROUP BY treats NULLs as equal, unlike equality), and
    count(col) must skip NULLs where count(*) does not. Dialect
    foot-gun territory, pinned as a hard signal."""
    ev = load(spark, sf_dir, "events").withColumn(
        "etype",
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    return (
        ev.groupBy("etype")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.count("etype").cast("long").alias("n_nonnull_key"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("sum_cents"),
        )
        .orderBy(F.col("etype").asc_nulls_first())
    )


NULL_KEY_GROUPING_SQL = """
WITH e AS (
  SELECT CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS etype,
         value
  FROM events
)
SELECT etype,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(etype) AS BIGINT) AS n_nonnull_key,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
FROM e
GROUP BY etype
ORDER BY etype ASC NULLS FIRST
"""

QUERIES["null_key_grouping"] = Q(
    null_key_grouping,
    NULL_KEY_GROUPING_SQL,
    "NULL grouping + count(col) vs count(*) semantics pin",
)


def null_safe_join_semantics(spark, sf_dir):
    """Null-safe equality join pin: Spark's `<=>` vs standard `IS NOT
    DISTINCT FROM` — a NULL-keyed row must match the dimension's NULL
    row exactly once (plain `=` silently drops it, the classic missing-
    rows bug after a lossy extract). Events with type nulled on
    event_id % 11 == 0 join a 6-row dim that includes a NULL key; output
    is per-label counts."""
    ev = load(spark, sf_dir, "events").withColumn(
        "etype",
        F.when(F.col("event_id") % 11 == 0, F.lit(None)).otherwise(
            F.col("event_type")
        ),
    )
    dim = spark.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "revenue"),
            ("signup", "acquisition"),
            ("error", "ops"),
            (None, "unattributed"),
        ],
        "etype string, label string",
    )
    return (
        ev.join(F.broadcast(dim), ev["etype"].eqNullSafe(dim["etype"]))
        .groupBy("label")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("label")
    )


NULL_SAFE_JOIN_SEMANTICS_SQL = """
WITH e AS (
  SELECT CASE WHEN event_id % 11 = 0 THEN NULL ELSE event_type END AS etype
  FROM events
),
dim(etype, label) AS (
  VALUES ('click', 'engagement'), ('view', 'engagement'),
         ('purchase', 'revenue'), ('signup', 'acquisition'),
         ('error', 'ops'), (NULL, 'unattributed')
)
SELECT d.label, CAST(COUNT(*) AS BIGINT) AS n
FROM e JOIN dim d ON e.etype IS NOT DISTINCT FROM d.etype
GROUP BY d.label
ORDER BY d.label
"""

QUERIES["null_safe_join_semantics"] = Q(
    null_safe_join_semantics,
    NULL_SAFE_JOIN_SEMANTICS_SQL,
    "null-safe equality join (<=> / IS NOT DISTINCT FROM) row-accounting pin",
)


def order_total_reconciliation(spark, sf_dir):
    """Financial reconciliation audit: the order header total vs the sum
    of its line amounts (extended price x (1 - discount) x (1 + tax)),
    computed entirely in DECIMAL and compared on the cent grid. The
    synthetic tables do NOT reconcile by construction — which is the
    point of an audit query: it must quantify the discrepancy
    deterministically (match count under a one-dollar tolerance,
    total absolute drift in cents), not assume integrity. One
    partial-agg per order, then a broadcast-size status rollup."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    # DECIMAL(12,2) factors: the triple product lands at (36,6)/(38,6) —
    # inside BOTH engines' 38-digit cap with NO scale truncation (wider
    # casts make DuckDB overflow where Spark silently reduces scale).
    dec = lambda c: F.col(c).cast("decimal(12,2)")  # noqa: E731
    amount = (
        dec("l_extendedprice")
        * (F.lit(1).cast("decimal(12,2)") - dec("l_discount"))
        * (F.lit(1).cast("decimal(12,2)") + dec("l_tax"))
    )
    per_order = li.groupBy("l_orderkey").agg(F.sum(amount).alias("line_total"))
    j = orders.join(per_order, orders.o_orderkey == per_order.l_orderkey, "left_outer")
    # FLOOR(|diff|·100) explicitly: Spark's long cast truncates while
    # DuckDB's rounds, so neither native cast is shared ground.
    abs_diff_cents = F.floor(
        F.abs(
            dec("o_totalprice")
            - F.coalesce(F.col("line_total"), F.lit(0).cast("decimal(12,2)"))
        )
        * 100
    ).cast("long")
    return (
        j.select("o_orderstatus", abs_diff_cents.alias("abs_diff_cents"))
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum((F.col("abs_diff_cents") <= 100).cast("long")).cast("long").alias("n_within_dollar"),
            F.sum("abs_diff_cents").cast("long").alias("total_abs_drift_cents"),
        )
    )


ORDER_TOTAL_RECONCILIATION_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2))
             * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
             * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2)))) AS line_total
  FROM lineitem GROUP BY l_orderkey
),
j AS (
  SELECT o_orderstatus,
         CAST(FLOOR(ABS(CAST(o_totalprice AS DECIMAL(12,2))
                        - COALESCE(line_total, CAST(0 AS DECIMAL(12,2)))) * 100) AS BIGINT) AS abs_diff_cents
  FROM orders LEFT OUTER JOIN per_order ON o_orderkey = l_orderkey
)
SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN abs_diff_cents <= 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_within_dollar,
       CAST(SUM(abs_diff_cents) AS BIGINT) AS total_abs_drift_cents
FROM j GROUP BY o_orderstatus
"""

QUERIES["order_total_reconciliation"] = Q(
    order_total_reconciliation,
    ORDER_TOTAL_RECONCILIATION_SQL,
    "header-vs-lines financial reconciliation on the exact cent grid",
)


def capped_contribution_rollup(spark, sf_dir):
    """Bounded-sensitivity aggregation — the preprocessing differential
    privacy and abuse-robust analytics share: each user's contribution
    to a (type) rollup is capped at k=5 events and a $50 value ceiling
    BEFORE the global sum, so no single key can move the aggregate by
    more than the cap. Two-level aggregation (user partials, then the
    capped rollup) — both stages partial-agg shuffles; the cap is a
    map-side LEAST on the bounded per-user partial."""
    ev = load(spark, sf_dir, "events")
    per_user = (
        ev.select(
            "event_type",
            "user_id",
            F.least(
                F.round(F.col("value") * 100).cast("bigint"), F.lit(5000)
            ).alias("cents_clipped"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.count("*").alias("n_u"), F.sum("cents_clipped").alias("c_u"))
    )
    return (
        per_user.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("n_u").cast("bigint").alias("n_events"),
            F.sum(F.least(F.col("n_u"), F.lit(5))).cast("bigint").alias("n_capped"),
            # value cap: at most 5 clipped events count per user
            F.sum(
                F.when(F.col("n_u") <= 5, F.col("c_u")).otherwise(
                    F.expr("c_u * 5 DIV n_u")
                )
            ).cast("bigint").alias("cents_capped"),
        )
        .orderBy("event_type")
    )


CAPPED_CONTRIBUTION_ROLLUP_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, COUNT(*) AS n_u,
         SUM(LEAST(CAST(ROUND(value * 100) AS BIGINT), 5000)) AS c_u
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_users,
       CAST(SUM(n_u) AS BIGINT) AS n_events,
       CAST(SUM(LEAST(n_u, 5)) AS BIGINT) AS n_capped,
       CAST(SUM(CASE WHEN n_u <= 5 THEN c_u ELSE c_u * 5 // n_u END) AS BIGINT) AS cents_capped
FROM per_user GROUP BY event_type ORDER BY event_type
"""

QUERIES["capped_contribution_rollup"] = Q(
    capped_contribution_rollup,
    CAPPED_CONTRIBUTION_ROLLUP_SQL,
    "bounded-sensitivity rollup: per-user contribution caps before the global sum",
)


def threshold_grid_eval(spark, sf_dir):
    """Hyperparameter-grid evaluation in ONE data pass: the candidate
    filter thresholds ride a broadcast literal dimension crossed into
    the scan, so evaluating N configs costs one corpus read + one
    (config)-keyed partial agg instead of N passes — the grid-search
    shape for tuning corpus filters at 100 TB. Here: minimum-token
    cutoffs 5/20/50 over documents, each reporting survivors, survival
    ppm, and surviving token mass."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(F.size(F.split("text", " ")).alias("nt"))
    grid = spark.range(1).select(
        F.explode(F.array(F.lit(5), F.lit(20), F.lit(50))).alias("min_tokens")
    )
    return (
        toks.crossJoin(F.broadcast(grid))
        .groupBy("min_tokens")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("nt") >= F.col("min_tokens"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.expr(
                "SUM(CASE WHEN nt >= min_tokens THEN 1 ELSE 0 END) * 1000000 DIV COUNT(*)"
            ).cast("bigint").alias("kept_ppm"),
            F.sum(F.when(F.col("nt") >= F.col("min_tokens"), F.col("nt")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("min_tokens")
    )


THRESHOLD_GRID_EVAL_SQL = """
WITH toks AS (SELECT len(string_split(text, ' ')) AS nt FROM documents),
grid AS (SELECT unnest([5, 20, 50]) AS min_tokens)
SELECT min_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN nt >= min_tokens THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN nt >= min_tokens THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) AS kept_ppm,
       CAST(SUM(CASE WHEN nt >= min_tokens THEN nt ELSE 0 END) AS BIGINT) AS kept_tokens
FROM toks CROSS JOIN grid
GROUP BY min_tokens ORDER BY min_tokens
"""

QUERIES["threshold_grid_eval"] = Q(
    threshold_grid_eval,
    THRESHOLD_GRID_EVAL_SQL,
    "filter-threshold grid evaluated in one scan via a broadcast config dimension",
)


def quantity_mode_exact(spark, sf_dir):
    """Exact MODE (most frequent value) per group with a pinned
    tie-break — the frequency-argmax aggregate: one (group, value)
    partial-agg histogram (bounded by the value domain, 1..50 here),
    then a ≤50-row window per group. Also reports the frequency and the
    share on the ppm grid."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    hist = (
        li.select("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(F.count("*").alias("n"))
    )
    tot = Window.partitionBy("l_returnflag")
    w = Window.partitionBy("l_returnflag").orderBy(
        F.col("n").desc(), F.col("qty").asc()
    )
    return (
        hist.withColumn("rn", F.row_number().over(w))
        .withColumn("n_all", F.sum("n").over(tot))
        .filter(F.col("rn") == 1)
        .select(
            "l_returnflag",
            F.col("qty").alias("mode_qty"),
            F.col("n").cast("bigint").alias("n_mode"),
            F.expr("n * 1000000 DIV n_all").cast("bigint").alias("share_ppm"),
        )
        .orderBy("l_returnflag")
    )


QUANTITY_MODE_EXACT_SQL = """
WITH hist AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
),
ranked AS (
  SELECT l_returnflag, qty, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag
                            ORDER BY n DESC, qty ASC) AS rn,
         SUM(n) OVER (PARTITION BY l_returnflag) AS n_all
  FROM hist
)
SELECT l_returnflag, qty AS mode_qty, CAST(n AS BIGINT) AS n_mode,
       CAST(n * 1000000 // n_all AS BIGINT) AS share_ppm
FROM ranked WHERE rn = 1 ORDER BY l_returnflag
"""

QUERIES["quantity_mode_exact"] = Q(
    quantity_mode_exact,
    QUANTITY_MODE_EXACT_SQL,
    "exact per-group MODE via bounded histogram + pinned tie-break",
)


def string_distance_pin(spark, sf_dir):
    """Levenshtein edit distance pinned across engines — the record-
    linkage verify primitive (the LSH gates block candidates; an edit
    distance is the classic verifier for short strings). Distances are
    computed between each part's name and the brand-wise
    lexicographic-successor name (a deterministic same-brand pair via
    LEAD — no cross join), rolled up per brand: pair count, total
    distance, max distance. Also pins the bounded form
    levenshtein(a, b, 10) Spark offers via the 3-arg overload —
    represented here by capping in the rollup (LEAST(d, 10)) so both
    engines share one text-level contract."""
    from pyspark.sql import Window

    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy("p_name")
    pairs = (
        part.select("p_brand", "p_name")
        .withColumn("nxt", F.lead("p_name").over(w))
        .filter(F.col("nxt").isNotNull())
        .select("p_brand", F.levenshtein("p_name", "nxt").alias("d"))
    )
    return (
        pairs.groupBy("p_brand")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("d").cast("bigint").alias("sum_dist"),
            F.sum(F.least(F.col("d"), F.lit(10))).cast("bigint").alias("sum_dist_cap10"),
            F.max("d").cast("bigint").alias("max_dist"),
        )
        .orderBy("p_brand")
    )


STRING_DISTANCE_PIN_SQL = """
WITH pairs AS (
  SELECT p_brand,
         levenshtein(p_name,
                     LEAD(p_name) OVER (PARTITION BY p_brand ORDER BY p_name)) AS d
  FROM part
)
SELECT p_brand,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(d) AS BIGINT) AS sum_dist,
       CAST(SUM(LEAST(d, 10)) AS BIGINT) AS sum_dist_cap10,
       CAST(MAX(d) AS BIGINT) AS max_dist
FROM pairs WHERE d IS NOT NULL
GROUP BY p_brand ORDER BY p_brand
"""

QUERIES["string_distance_pin"] = Q(
    string_distance_pin,
    STRING_DISTANCE_PIN_SQL,
    "Levenshtein distances over deterministic same-brand name pairs (rollup pin)",
)


def type_diversity_index(spark, sf_dir):
    """Per-day event-mix diversity via the Gini-Simpson index
    1 − Σ pᵢ² — the log-free diversity measure (Shannon entropy needs a
    transcendental log; this one is an exact rational on the ppm grid:
    (n² − Σ cᵢ²)·10⁶ DIV n²). Two bounded aggregations: (day, type)
    counts, then the per-day fold of Σ c² — the mix-monitoring shape a
    corpus pipeline runs per shard/source to spot collapsed diversity."""
    ev = load(spark, sf_dir, "events")
    counts = (
        ev.select(F.to_date(F.col("ts").cast("timestamp")).alias("day"), "event_type")
        .groupBy("day", "event_type")
        .agg(F.count("*").alias("c"))
    )
    return (
        counts.groupBy("day")
        .agg(
            F.sum("c").cast("bigint").alias("n"),
            F.count("*").cast("bigint").alias("n_types"),
            F.sum(F.expr("c * c")).alias("sum_c2"),
        )
        .select(
            "day",
            "n",
            "n_types",
            F.expr("(n * n - sum_c2) * 1000000 DIV (n * n)")
            .cast("bigint")
            .alias("gini_simpson_ppm"),
        )
        .orderBy("day")
    )


TYPE_DIVERSITY_INDEX_SQL = """
WITH counts AS (
  SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS c
  FROM events GROUP BY 1, 2
),
per_day AS (
  SELECT day, SUM(c) AS n, COUNT(*) AS n_types, SUM(c * c) AS sum_c2
  FROM counts GROUP BY day
)
SELECT day, CAST(n AS BIGINT) AS n, CAST(n_types AS BIGINT) AS n_types,
       CAST((n * n - sum_c2) * 1000000 // (n * n) AS BIGINT) AS gini_simpson_ppm
FROM per_day ORDER BY day
"""

QUERIES["type_diversity_index"] = Q(
    type_diversity_index,
    TYPE_DIVERSITY_INDEX_SQL,
    "log-free Gini-Simpson diversity of the daily event mix (ppm grid)",
)


def join_key_skew_report(spark, sf_dir):
    """Join-key skew diagnostic — the profile that decides salting /
    AQE-skew-join settings before a big join ships: per candidate key
    (events.user_id, lineitem.l_orderkey), the key count, max and mean
    per-key cardinality, and the max/mean skew ratio ppm. One partial
    agg per key column + a 2-row fold; the report is what the engine's
    `skew_salted_join` gate acts on."""
    ev = load(spark, sf_dir, "events")
    li = load(spark, sf_dir, "lineitem")

    def profile(df, col, label):
        per_key = df.groupBy(col).agg(F.count("*").alias("n"))
        return per_key.agg(
            F.lit(label).alias("key_col"),
            F.count("*").cast("bigint").alias("n_keys"),
            F.sum("n").cast("bigint").alias("n_rows"),
            F.max("n").cast("bigint").alias("max_rows"),
            F.expr("SUM(n) DIV COUNT(*)").cast("bigint").alias("mean_rows"),
            F.expr("MAX(n) * 1000000 DIV (SUM(n) DIV COUNT(*))")
            .cast("bigint")
            .alias("skew_ratio_ppm"),
        )

    return (
        profile(ev, "user_id", "events.user_id")
        .unionAll(profile(li, "l_orderkey", "lineitem.l_orderkey"))
        .orderBy("key_col")
    )


JOIN_KEY_SKEW_REPORT_SQL = """
WITH e AS (
  SELECT COUNT(*) AS n FROM events GROUP BY user_id
),
l AS (
  SELECT COUNT(*) AS n FROM lineitem GROUP BY l_orderkey
),
pe AS (
  SELECT 'events.user_id' AS key_col, COUNT(*) AS n_keys, SUM(n) AS n_rows,
         MAX(n) AS max_rows, SUM(n) // COUNT(*) AS mean_rows,
         MAX(n) * 1000000 // (SUM(n) // COUNT(*)) AS skew_ratio_ppm
  FROM e
),
pl AS (
  SELECT 'lineitem.l_orderkey' AS key_col, COUNT(*) AS n_keys, SUM(n) AS n_rows,
         MAX(n) AS max_rows, SUM(n) // COUNT(*) AS mean_rows,
         MAX(n) * 1000000 // (SUM(n) // COUNT(*)) AS skew_ratio_ppm
  FROM l
)
SELECT key_col, CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(max_rows AS BIGINT) AS max_rows, CAST(mean_rows AS BIGINT) AS mean_rows,
       CAST(skew_ratio_ppm AS BIGINT) AS skew_ratio_ppm
FROM (SELECT * FROM pe UNION ALL SELECT * FROM pl) ORDER BY key_col
"""

QUERIES["join_key_skew_report"] = Q(
    join_key_skew_report,
    JOIN_KEY_SKEW_REPORT_SQL,
    "join-key skew profile: per-key cardinality extremes and max/mean ratio ppm",
)


def customer_rfm_segments(spark, sf_dir):
    """RFM segmentation — recency / frequency / monetary quartiles per
    customer, the classic lifecycle-marketing rollup: one per-customer
    aggregate, three deterministic NTILE(4) passes (each on a total
    order — metric then customer key — so quartile edges are
    engine-agnostic), and the 3-digit segment code rollup. Output is the
    ≤64-row segment census with average spend cents."""
    from pyspark.sql import Window

    o = load(spark, sf_dir, "orders")
    end = o.agg(F.max(F.to_date("o_orderdate")).alias("end_day"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count("*").alias("freq"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
        .crossJoin(F.broadcast(end))
        .select(
            "o_custkey",
            F.datediff("end_day", "last_day").alias("rec_days"),
            "freq",
            "cents",
        )
    )
    seg = per_cust.select(
        "o_custkey",
        "cents",
        F.ntile(4)
        .over(Window.orderBy(F.col("rec_days").asc(), F.col("o_custkey").asc()))
        .alias("r"),
        F.ntile(4)
        .over(Window.orderBy(F.col("freq").desc(), F.col("o_custkey").asc()))
        .alias("f"),
        F.ntile(4)
        .over(Window.orderBy(F.col("cents").desc(), F.col("o_custkey").asc()))
        .alias("m"),
    )
    return (
        seg.groupBy((F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment"))
        .agg(
            F.count("*").cast("bigint").alias("n_customers"),
            F.expr("SUM(cents) DIV COUNT(*)").cast("bigint").alias("avg_cents"),
        )
        .orderBy("segment")
    )


CUSTOMER_RFM_SEGMENTS_SQL = """
WITH end_day AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS end_day FROM orders),
per_cust AS (
  SELECT o_custkey,
         date_diff('day', MAX(CAST(o_orderdate AS DATE)), e.end_day) AS rec_days,
         COUNT(*) AS freq,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
  FROM orders CROSS JOIN end_day e
  GROUP BY o_custkey, e.end_day
),
seg AS (
  SELECT o_custkey, cents,
         NTILE(4) OVER (ORDER BY rec_days ASC, o_custkey ASC) AS r,
         NTILE(4) OVER (ORDER BY freq DESC, o_custkey ASC) AS f,
         NTILE(4) OVER (ORDER BY cents DESC, o_custkey ASC) AS m
  FROM per_cust
)
SELECT r * 100 + f * 10 + m AS segment,
       CAST(COUNT(*) AS BIGINT) AS n_customers,
       CAST(SUM(cents) // COUNT(*) AS BIGINT) AS avg_cents
FROM seg GROUP BY 1 ORDER BY segment
"""

QUERIES["customer_rfm_segments"] = Q(
    customer_rfm_segments,
    CUSTOMER_RFM_SEGMENTS_SQL,
    "RFM quartile segmentation with deterministic ntile edges, segment census",
)


def order_value_benford(spark, sf_dir):
    """Benford first-digit screen over order totals — the forensic
    data-QA pass for financial columns: leading-digit counts and shares
    on the ppm grid (digit extracted by pure string math on the exact
    cent integers — no float log), one ≤9-row aggregation. Compare the
    shape against Benford's log-curve offline; the gate pins the exact
    counts."""
    o = load(spark, sf_dir, "orders")
    return (
        o.select(
            F.substring(
                F.round(F.col("o_totalprice") * 100).cast("bigint").cast("string"),
                1,
                1,
            )
            .cast("bigint")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count("*").cast("bigint").alias("n"))
        .crossJoin(
            F.broadcast(o.agg(F.count("*").cast("bigint").alias("n_all")))
        )
        .select(
            "digit",
            "n",
            F.expr("n * 1000000 DIV n_all").cast("bigint").alias("share_ppm"),
        )
        .orderBy("digit")
    )


ORDER_VALUE_BENFORD_SQL = """
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders
),
n_all AS (SELECT COUNT(*) AS n_all FROM orders)
SELECT digit, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) * 1000000 // a.n_all AS BIGINT) AS share_ppm
FROM d CROSS JOIN n_all a
GROUP BY digit, a.n_all ORDER BY digit
"""

QUERIES["order_value_benford"] = Q(
    order_value_benford,
    ORDER_VALUE_BENFORD_SQL,
    "Benford first-digit census of order totals (exact string math, ppm shares)",
)


def supplier_hhi_concentration(spark, sf_dir):
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation — the market-concentration screen: per-supplier revenue
    cents (one partial agg over lineitem ⋈ broadcast supplier), then
    HHI = Σ cᵢ²·10⁶ DIV (Σ cᵢ)² per nation on DECIMAL(38,0) (supplier
    revenue squares pass int64 at sf≥0.1). Output joins the broadcast
    nation dim for names — ≤25 rows at any scale."""
    li = load(spark, sf_dir, "lineitem")
    sup = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    nation = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nationkey"), "n_name"
    )
    per_sup = (
        li.select(
            "l_suppkey",
            F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("l_suppkey")
        .agg(F.sum("cents").alias("rev"))
        .join(F.broadcast(sup), "l_suppkey")
    )
    return (
        per_sup.groupBy("s_nationkey")
        .agg(
            F.count("*").cast("bigint").alias("n_suppliers"),
            F.sum("rev").cast("bigint").alias("rev_cents"),
            F.expr(
                "CAST(SUM(CAST(rev AS DECIMAL(38,0)) * rev) * 1000000 "
                "DIV (CAST(SUM(CAST(rev AS DECIMAL(38,0))) AS DECIMAL(38,0)) "
                "* SUM(CAST(rev AS DECIMAL(38,0)))) AS BIGINT)"
            ).alias("hhi_ppm"),
        )
        .join(F.broadcast(nation), "s_nationkey")
        .select("n_name", "n_suppliers", "rev_cents", "hhi_ppm")
        .orderBy("n_name")
    )


SUPPLIER_HHI_CONCENTRATION_SQL = """
WITH per_sup AS (
  SELECT l.l_suppkey, s.s_nationkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)) AS rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY 1, 2
)
SELECT n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(rev) AS BIGINT) AS rev_cents,
       CAST(SUM(rev * rev) * 1000000 // (SUM(rev) * SUM(rev)) AS BIGINT) AS hhi_ppm
FROM per_sup p JOIN nation n ON n.n_nationkey = p.s_nationkey
GROUP BY n.n_name ORDER BY n.n_name
"""

QUERIES["supplier_hhi_concentration"] = Q(
    supplier_hhi_concentration,
    SUPPLIER_HHI_CONCENTRATION_SQL,
    "Herfindahl concentration of supplier revenue per nation (exact ppm)",
)


def uniform_hash_chi2(spark, sf_dir):
    """Hash-uniformity audit — the assumption every md5-coin gate
    (splits, sampling, k-fold, A/B arms) rests on, made measurable: user
    ids hash into 64 buckets and the χ² statistic against the uniform
    expectation comes out in exact milli-units via cross-multiplication
    (Σ(o·k−n)² DIV (n·k), no floats). One 64-row aggregation; the
    statistic should hover near its k−1 = 63 expectation (×1000)."""
    ev = load(spark, sf_dir, "events")
    k = 64
    buckets = (
        ev.select("user_id")
        .distinct()
        .select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long")
                % k
            ).alias("b")
        )
        .groupBy("b")
        .agg(F.count("*").alias("o"))
    )
    tot = buckets.agg(F.sum("o").alias("n"))
    return buckets.crossJoin(F.broadcast(tot)).agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.sum("o").cast("bigint").alias("n_keys"),
        F.min("o").cast("bigint").alias("min_bucket"),
        F.max("o").cast("bigint").alias("max_bucket"),
        # empty buckets never reach the groupBy; add their (0·k−n)² = n²
        # terms explicitly so the statistic is the true χ² over all k bins
        F.expr(
            f"CAST((SUM((o * {k} - n) * (o * {k} - n)) "
            f"+ ({k} - COUNT(*)) * MAX(n) * MAX(n)) * 1000 "
            f"DIV (MAX(n) * {k}) AS BIGINT)"
        ).alias("chi2_milli"),
    )


UNIFORM_HASH_CHI2_SQL = """
WITH buckets AS (
  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 64 AS b,
         COUNT(*) AS o
  FROM (SELECT DISTINCT user_id FROM events) GROUP BY 1
),
tot AS (SELECT SUM(o) AS n FROM buckets)
SELECT CAST(COUNT(*) AS BIGINT) AS n_buckets,
       CAST(SUM(o) AS BIGINT) AS n_keys,
       CAST(MIN(o) AS BIGINT) AS min_bucket,
       CAST(MAX(o) AS BIGINT) AS max_bucket,
       CAST((SUM((o * 64 - t.n) * (o * 64 - t.n)) + (64 - COUNT(*)) * t.n * t.n)
            * 1000 // (t.n * 64) AS BIGINT) AS chi2_milli
FROM buckets CROSS JOIN tot t
GROUP BY t.n
"""

QUERIES["uniform_hash_chi2"] = Q(
    uniform_hash_chi2,
    UNIFORM_HASH_CHI2_SQL,
    "chi-squared uniformity audit of the md5 bucket coin (exact milli grid)",
)


def id_continuity_audit(spark, sf_dir):
    """Ingestion-hole audit: event ids bucket by DIV 10000 and each
    bucket reports observed count, the id span it actually covers, and
    the missing-id count — the completeness check a CDC consumer runs
    against a monotone source sequence (SURVEY §2 X6). One distinct +
    one bounded aggregation; a hole shows as missing > 0 in exactly the
    bucket that lost data."""
    ev = load(spark, sf_dir, "events")
    ids = ev.select(F.col("event_id").alias("id")).distinct()
    return (
        ids.select((F.col("id") / 10000).cast("bigint").alias("bucket"), "id")
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_present"),
            F.min("id").cast("bigint").alias("lo"),
            F.max("id").cast("bigint").alias("hi"),
            (F.max("id") - F.min("id") + 1 - F.count("*"))
            .cast("bigint")
            .alias("n_missing"),
        )
        .orderBy("bucket")
    )


ID_CONTINUITY_AUDIT_SQL = """
WITH ids AS (SELECT DISTINCT event_id AS id FROM events)
SELECT id // 10000 AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_present,
       CAST(MIN(id) AS BIGINT) AS lo,
       CAST(MAX(id) AS BIGINT) AS hi,
       CAST(MAX(id) - MIN(id) + 1 - COUNT(*) AS BIGINT) AS n_missing
FROM ids GROUP BY 1 ORDER BY bucket
"""

QUERIES["id_continuity_audit"] = Q(
    id_continuity_audit,
    ID_CONTINUITY_AUDIT_SQL,
    "monotone-id completeness audit: per-bucket span vs present count",
)


def demand_curve_buckets(spark, sf_dir):
    """Demand-curve table — quantity response to price: lineitem prices
    band into fixed $100 buckets (data-independent edges, like the
    calibration bins), each reporting order-line count, mean quantity
    (milli grid), and mean discount ppm. One map-side bucket assignment
    + one bounded aggregation; the econometrics happens on the ≤~1000-row
    artifact, not the lake."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.expr("CAST(ROUND(l_extendedprice * 100) AS BIGINT) DIV 10000").alias(
                "price_100"
            ),
            F.col("l_quantity").cast("bigint").alias("qty"),
            F.round(F.col("l_discount") * 1e6).cast("bigint").alias("disc_ppm"),
        )
        .groupBy("price_100")
        .agg(
            F.count("*").cast("bigint").alias("n_lines"),
            F.expr("SUM(qty) * 1000 DIV COUNT(*)").cast("bigint").alias("mean_qty_milli"),
            F.expr("SUM(disc_ppm) DIV COUNT(*)").cast("bigint").alias("mean_disc_ppm"),
        )
        .orderBy("price_100")
    )


DEMAND_CURVE_BUCKETS_SQL = """
SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) // 10000 AS price_100,
       CAST(COUNT(*) AS BIGINT) AS n_lines,
       CAST(SUM(CAST(l_quantity AS BIGINT)) * 1000 // COUNT(*) AS BIGINT) AS mean_qty_milli,
       CAST(SUM(CAST(ROUND(l_discount * 1e6) AS BIGINT)) // COUNT(*) AS BIGINT) AS mean_disc_ppm
FROM lineitem GROUP BY 1 ORDER BY price_100
"""

QUERIES["demand_curve_buckets"] = Q(
    demand_curve_buckets,
    DEMAND_CURVE_BUCKETS_SQL,
    "price-bucket demand curve: mean quantity and discount per $100 band",
)


_MANIFEST_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey * 8 + l_linenumber",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def lake_integrity_manifest(spark, sf_dir):
    """Cross-engine lake manifest — the checksum table a migration or
    replication pipeline publishes per snapshot: for EVERY driver table,
    the row count and an order-free key checksum (sum of 32-bit md5
    prefixes of the canonical key — addition commutes, so partition
    order can't leak in). One bounded aggregate per table, unioned;
    validating a 100 TB copy costs one scan per side and a 10-row
    diff."""
    outs = []
    for t, key in _MANIFEST_KEYS.items():
        df = load(spark, sf_dir, t)
        outs.append(
            df.select(
                F.expr(f"CAST({key} AS STRING)").alias("k")
            ).agg(
                F.lit(t).alias("table_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                F.sum(
                    F.conv(F.substring(F.md5("k"), 1, 8), 16, 10).cast("long")
                ).cast("bigint").alias("key_checksum"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("table_name")


LAKE_INTEGRITY_MANIFEST_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{t}' AS table_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST('0x' || substr(md5(CAST({k} AS VARCHAR)), 1, 8) AS BIGINT)) AS BIGINT) AS key_checksum
FROM {t}"""
    for t, k in _MANIFEST_KEYS.items()
) + "\nORDER BY table_name"

QUERIES["lake_integrity_manifest"] = Q(
    lake_integrity_manifest,
    LAKE_INTEGRITY_MANIFEST_SQL,
    "order-free per-table row-count + key-checksum manifest over all 10 tables",
)


def ship_lag_profile(spark, sf_dir):
    """Fulfillment-lag SLA profile — the cross-table duration rollup:
    days from order date to each line's ship date, aggregated per order
    priority with exact discrete P50/P90 read off the bounded lag
    histogram (the engine's percentile convention) plus the share
    beyond a 60-day SLA in ppm. The orders side joins broadcast-shaped
    (key + date only); durations histogram before any window touches
    them."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        F.to_date("o_orderdate").alias("odate"),
    )
    lags = li.join(o, "l_orderkey").select(
        "o_orderpriority", F.datediff("ship", "odate").cast("bigint").alias("lag")
    )
    hist = lags.groupBy("o_orderpriority", "lag").agg(F.count("*").alias("n"))
    cum = Window.partitionBy("o_orderpriority").orderBy("lag").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("o_orderpriority")
    ranked = hist.withColumn("c", F.sum("n").over(cum)).withColumn(
        "t", F.sum("n").over(tot)
    )
    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("t").cast("bigint").alias("n_lines"),
            F.min(F.when(F.expr("c * 2 >= t"), F.col("lag"))).cast("bigint").alias("p50_days"),
            F.min(F.when(F.expr("c * 10 >= t * 9"), F.col("lag"))).cast("bigint").alias("p90_days"),
            F.expr("SUM(CASE WHEN lag > 60 THEN n ELSE 0 END) * 1000000 DIV MAX(t)")
            .cast("bigint")
            .alias("over_sla_ppm"),
        )
        .orderBy("o_orderpriority")
    )


SHIP_LAG_PROFILE_SQL = """
WITH lags AS (
  SELECT o.o_orderpriority,
         date_diff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE)) AS lag
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
hist AS (
  SELECT o_orderpriority, lag, COUNT(*) AS n FROM lags GROUP BY 1, 2
),
ranked AS (
  SELECT o_orderpriority, lag, n,
         SUM(n) OVER (PARTITION BY o_orderpriority ORDER BY lag
                      ROWS UNBOUNDED PRECEDING) AS c,
         SUM(n) OVER (PARTITION BY o_orderpriority) AS t
  FROM hist
)
SELECT o_orderpriority,
       CAST(MAX(t) AS BIGINT) AS n_lines,
       CAST(MIN(CASE WHEN c * 2 >= t THEN lag END) AS BIGINT) AS p50_days,
       CAST(MIN(CASE WHEN c * 10 >= t * 9 THEN lag END) AS BIGINT) AS p90_days,
       CAST(SUM(CASE WHEN lag > 60 THEN n ELSE 0 END) * 1000000 // MAX(t) AS BIGINT) AS over_sla_ppm
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
"""

QUERIES["ship_lag_profile"] = Q(
    ship_lag_profile,
    SHIP_LAG_PROFILE_SQL,
    "order-to-ship lag SLA profile: discrete P50/P90 + over-SLA ppm per priority",
)
