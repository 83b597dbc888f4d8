"""Reference-parity relational operators declared over the driver tables.

Each entry demonstrates one operator family from SURVEY.md §2 (citation in
the docstring) re-expressed over the synthetic TPC-H-ish tables, with a
DuckDB oracle. The TPC-H-style aggregation/join queries double as the bench
headliners.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import Q, load, ms


# --- W1: latest row per key (the reference's load-bearing dedup-to-latest;
#     dao/CdcCheckpointDao.java:63-79) ----------------------------------------

def latest_event_per_user(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_id",
            F.unix_millis("ts").alias("ts_ms"),
            "event_type",
            "value",
        )
    )


LATEST_EVENT_PER_USER_SQL = """
WITH ranked AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts_ms, event_type, value FROM ranked WHERE rn = 1
"""


# --- A1/T4: grouped argmax via max_by (service/DataStreamService.java:134-140)

def argmax_event_value(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ev = ev.withColumn("ts_ms", F.unix_millis("ts"))
    ordering = F.struct(F.col("ts_ms"), F.col("event_id"))
    return ev.groupBy("user_id").agg(
        F.max_by("value", ordering).alias("latest_value"),
        F.max_by("event_type", ordering).alias("latest_type"),
        F.max("ts_ms").alias("max_ts_ms"),
    )


ARGMAX_EVENT_VALUE_SQL = """
WITH ranked AS (
  SELECT user_id, value, event_type, epoch_ms(ts) AS ts_ms,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
  FROM events
)
SELECT r.user_id, r.value AS latest_value, r.event_type AS latest_type, m.max_ts_ms
FROM ranked r
JOIN (SELECT user_id, MAX(epoch_ms(ts)) AS max_ts_ms FROM events GROUP BY user_id) m
  ON m.user_id = r.user_id
WHERE r.rn = 1
"""


# --- F1-F3/C8/C9: predicate + JSON field projection + timestamp cast
#     (dao/CdcCheckpointDao.java:67-76) ----------------------------------------

def events_filter_json(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
        F.unix_millis("ts").alias("ts_ms"),
        "value",
    )


EVENTS_FILTER_JSON_SQL = """
SELECT event_id, user_id, CAST(props->>'$.k' AS INT) AS k, epoch_ms(ts) AS ts_ms, value
FROM events WHERE event_type = 'purchase'
"""


# --- F4: DISTINCT projection (dao/CdcCheckpointDao.java:155-187) --------------

def distinct_event_types(spark, sf_dir):
    return load(spark, sf_dir, "events").select("event_type").distinct()


DISTINCT_EVENT_TYPES_SQL = "SELECT DISTINCT event_type FROM events"


# --- J1: inner equi-join with filter pushdown (dao/CdcCheckpointDao.java:70-71)

def orders_customer_join(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "c_name", "o_totalprice", ms("o_orderdate").alias("o_orderdate_ms")
    )


ORDERS_CUSTOMER_JOIN_SQL = """
SELECT o_orderkey, c_name, o_totalprice, epoch_ms(o_orderdate) AS o_orderdate_ms
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
"""


# --- J2/U1: full-outer keyset join + add/remove/modify classification
#     (service/DiffService.java:87-121) ----------------------------------------

_SPLIT_TS = "2024-03-01 00:00:00"


def user_change_classify(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    first = ev.filter(F.col("ts") < F.lit(_SPLIT_TS)).groupBy("user_id").agg(
        F.count("*").alias("cnt_before")
    )
    second = ev.filter(F.col("ts") >= F.lit(_SPLIT_TS)).groupBy("user_id").agg(
        F.count("*").alias("cnt_after")
    )
    j = first.join(second, "user_id", "full_outer")
    return j.select(
        "user_id",
        F.when(F.col("cnt_before").isNull(), "add")
        .when(F.col("cnt_after").isNull(), "remove")
        .otherwise("modify")
        .alias("change_kind"),
        F.coalesce("cnt_before", F.lit(0)).alias("cnt_before"),
        F.coalesce("cnt_after", F.lit(0)).alias("cnt_after"),
    )


USER_CHANGE_CLASSIFY_SQL = f"""
WITH first AS (
  SELECT user_id, COUNT(*) AS cnt_before FROM events
  WHERE ts < TIMESTAMP '{_SPLIT_TS}' GROUP BY user_id
), second AS (
  SELECT user_id, COUNT(*) AS cnt_after FROM events
  WHERE ts >= TIMESTAMP '{_SPLIT_TS}' GROUP BY user_id
)
SELECT COALESCE(f.user_id, s.user_id) AS user_id,
       CASE WHEN f.user_id IS NULL THEN 'add'
            WHEN s.user_id IS NULL THEN 'remove'
            ELSE 'modify' END AS change_kind,
       COALESCE(f.cnt_before, 0) AS cnt_before,
       COALESCE(s.cnt_after, 0) AS cnt_after
FROM first f FULL OUTER JOIN second s ON f.user_id = s.user_id
"""


# --- A3/X3: per-key max + strictly-newer staleness predicate
#     (dao/CheckpointDao.java:33-56) -------------------------------------------

def fresh_events_after_signup(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    signup_max = ev.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.max(F.unix_millis("ts")).alias("signup_ts_ms")
    )
    return (
        ev.withColumn("ts_ms", F.unix_millis("ts"))
        .join(signup_max, "user_id")
        .filter(F.col("ts_ms") > F.col("signup_ts_ms"))
        .groupBy("user_id")
        .agg(F.count("*").alias("fresh_cnt"), F.max("ts_ms").alias("latest_ts_ms"))
    )


FRESH_EVENTS_AFTER_SIGNUP_SQL = """
WITH signup_max AS (
  SELECT user_id, MAX(epoch_ms(ts)) AS signup_ts_ms FROM events
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT e.user_id, COUNT(*) AS fresh_cnt, MAX(epoch_ms(e.ts)) AS latest_ts_ms
FROM events e JOIN signup_max s ON e.user_id = s.user_id
WHERE epoch_ms(e.ts) > s.signup_ts_ms
GROUP BY e.user_id
"""


# --- A4/A5: group + timestamp-ordered collect + no-separator concat
#     (service/DiffService.java:130-138, 254-259) ------------------------------

def user_event_type_concat(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    ordered = F.array_sort(
        F.collect_list(F.struct(F.unix_millis("ts").alias("ts_ms"), "event_id", "event_type"))
    )
    return ev.groupBy("user_id").agg(
        F.array_join(F.transform(ordered, lambda s: s.event_type), "").alias("type_seq"),
        F.count("*").alias("n_events"),
    )


USER_EVENT_TYPE_CONCAT_SQL = """
SELECT user_id,
       string_agg(event_type, '' ORDER BY epoch_ms(ts), event_id) AS type_seq,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


# --- T1: global top-1 by timestamp (dao/CdcCheckpointDao.java:139-140) --------

def top1_global_event(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .select("event_id", "user_id", F.unix_millis("ts").alias("ts_ms"), "event_type")
    )


TOP1_GLOBAL_EVENT_SQL = """
SELECT event_id, user_id, epoch_ms(ts) AS ts_ms, event_type
FROM events ORDER BY epoch_us(ts) DESC, event_id DESC LIMIT 1
"""


# --- U1: union of keysets (service/DiffService.java:87) -----------------------

def union_active_users(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    a = ev.filter(F.col("event_type") == "purchase").select("user_id")
    b = ev.filter(F.col("event_type") == "click").select("user_id")
    return a.union(b).distinct()


UNION_ACTIVE_USERS_SQL = """
SELECT user_id FROM events WHERE event_type = 'purchase'
UNION
SELECT user_id FROM events WHERE event_type = 'click'
"""


# --- X6 analog: monotone per-key sequence numbers ------------------------------

def user_event_sequence(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return ev.select(
        "user_id",
        "event_id",
        F.row_number().over(w).cast("long").alias("seq"),
    )


USER_EVENT_SEQUENCE_SQL = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_us(ts) ASC, event_id ASC) AS seq
FROM events
"""


# --- C-group scalar sampler (split/md5/concat_ws/contains/length) --------------

def scalar_expr_sampler(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("token_cnt"),
        F.element_at(toks, 1).alias("first_token"),
        F.md5(F.col("text")).alias("text_md5"),
        F.concat_ws(":", "lang", "source").alias("lang_source"),
        F.col("text").contains("spark").cast("int").alias("mentions_spark"),
        F.length("text").cast("long").alias("char_len"),
    )


SCALAR_EXPR_SAMPLER_SQL = """
SELECT doc_id,
       len(string_split(text, ' ')) AS token_cnt,
       string_split(text, ' ')[1] AS first_token,
       md5(text) AS text_md5,
       concat_ws(':', lang, source) AS lang_source,
       CAST(contains(text, 'spark') AS INT) AS mentions_spark,
       length(text) AS char_len
FROM documents
"""


# --- TPC-H-style bench headliners ----------------------------------------------

def tpch_q1(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    disc_price = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


TPCH_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2024-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def tpch_q3(spark, sf_dir):
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            ms("o_orderdate").alias("o_orderdate_ms"),
            "o_orderpriority",
            "revenue",
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


TPCH_Q3_SQL = """
SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def tpch_q5_region_revenue(spark, sf_dir):
    region = load(spark, sf_dir, "region")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supplier = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,2)")  # noqa: E731
    revenue = dec("l_extendedprice") * (F.lit(1).cast("decimal(18,2)") - dec("l_discount"))
    dims = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("c_custkey", "c_nationkey", "n_name", "r_name")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(dims), orders.o_custkey == F.col("c_custkey"))
        .join(
            F.broadcast(supplier),
            (li.l_suppkey == supplier.s_suppkey)
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("r_name", "n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"), F.count("*").alias("n_items"))
    )


TPCH_Q5_REGION_REVENUE_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
"""


QUERIES: dict[str, Q] = {
    "latest_event_per_user": Q(latest_event_per_user, LATEST_EVENT_PER_USER_SQL, "W1 dedup-to-latest"),
    "argmax_event_value": Q(argmax_event_value, ARGMAX_EVENT_VALUE_SQL, "A1/T4 grouped argmax"),
    "events_filter_json": Q(events_filter_json, EVENTS_FILTER_JSON_SQL, "F1-F3/C8/C9"),
    "distinct_event_types": Q(distinct_event_types, DISTINCT_EVENT_TYPES_SQL, "F4"),
    "orders_customer_join": Q(orders_customer_join, ORDERS_CUSTOMER_JOIN_SQL, "J1"),
    "user_change_classify": Q(user_change_classify, USER_CHANGE_CLASSIFY_SQL, "J2/U1 diff classify"),
    "fresh_events_after_signup": Q(fresh_events_after_signup, FRESH_EVENTS_AFTER_SIGNUP_SQL, "A3/X3"),
    "user_event_type_concat": Q(user_event_type_concat, USER_EVENT_TYPE_CONCAT_SQL, "A4/A5"),
    "top1_global_event": Q(top1_global_event, TOP1_GLOBAL_EVENT_SQL, "T1"),
    "union_active_users": Q(union_active_users, UNION_ACTIVE_USERS_SQL, "U1"),
    "user_event_sequence": Q(user_event_sequence, USER_EVENT_SEQUENCE_SQL, "X6 analog"),
    "scalar_expr_sampler": Q(scalar_expr_sampler, SCALAR_EXPR_SAMPLER_SQL, "C-group scalars"),
    "tpch_q1": Q(tpch_q1, TPCH_Q1_SQL, "bench: pricing summary"),
    "tpch_q3": Q(tpch_q3, TPCH_Q3_SQL, "bench: shipping priority"),
    "tpch_q5_region_revenue": Q(tpch_q5_region_revenue, TPCH_Q5_REGION_REVENUE_SQL, "bench: 6-way join"),
}


# --- beyond-reference aggregates: grouping sets + exact percentiles ----------

def orders_status_rollup(spark, sf_dir):
    """ROLLUP grouping sets (the reference has none — SURVEY §2.4); totals
    and subtotals in one pass."""
    orders = load(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
    )


ORDERS_STATUS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
"""


def event_value_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (Spark ``percentile`` and
    DuckDB ``quantile_cont`` share the linear-interpolation definition)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 5).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 5).alias("p90"),
        F.count("*").cast("bigint").alias("n"),
    )


EVENT_VALUE_PERCENTILES_SQL = """
SELECT event_type,
       ROUND(quantile_cont(value, 0.5), 5) AS p50,
       ROUND(quantile_cont(value, 0.9), 5) AS p90,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type
"""

def user_event_map_collect(spark, sf_dir):
    """A7 map-collect (subscriber/ctx/TestReportContextProvider.java:105:
    collect ``{key: value}`` per session): per user, the event_type→count
    map, serialized as a sorted ``type:count`` CSV so the map compares
    deterministically across engines (map column types don't hash-compare
    portably)."""
    ev = load(spark, sf_dir, "events")
    per_type = ev.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))
    return per_type.groupBy("user_id").agg(
        F.concat_ws(
            ",",
            F.array_sort(F.collect_list(F.format_string("%s:%d", F.col("event_type"), F.col("n")))),
        ).alias("type_counts")
    )


USER_EVENT_MAP_COLLECT_SQL = """
WITH c AS (SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2)
SELECT user_id,
       string_agg(event_type || ':' || CAST(n AS VARCHAR), ','
                  ORDER BY event_type || ':' || CAST(n AS VARCHAR)) AS type_counts
FROM c GROUP BY user_id
"""


QUERIES["orders_status_rollup"] = Q(orders_status_rollup, ORDERS_STATUS_ROLLUP_SQL, "grouping sets")
QUERIES["event_value_percentiles"] = Q(event_value_percentiles, EVENT_VALUE_PERCENTILES_SQL, "exact percentiles")
QUERIES["user_event_map_collect"] = Q(user_event_map_collect, USER_EVENT_MAP_COLLECT_SQL, "A7 map-collect per user")


def frequent_item_pairs(spark, sf_dir):
    """Market-basket association mining (the A-priori first pass): parts
    co-purchased in the same order, support-filtered, with confidence
    ratios on the ppm grid. Pair generation is a per-basket self-join of
    the DISTINCT item list — fan-out bounded by basket size², never
    |orders|² — and counting is one partial-agg groupBy; singleton
    supports broadcast back for the confidence division (integer, no
    floats). The shape behind co-occurrence recommenders at lake scale."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").cast("long").alias("item"),
        )
        .distinct()
        .localCheckpoint()  # consumed by the pair self-join (twice) + supports
    )
    n_orders = li.select("okey").distinct().count()
    supp = li.groupBy("item").agg(F.count("*").cast("long").alias("n_item"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("long").alias("n_pair"))
        .filter(F.col("n_pair") >= 3)
    )
    return (
        pairs.join(supp.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a")), "item_a")
        .join(supp.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b")), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            F.expr("(n_pair * 1000000) DIV n_a").cast("long").alias("conf_a_to_b_ppm"),
            F.expr(f"(n_pair * {n_orders}L * 1000000) DIV (n_a * n_b)")
            .cast("long")
            .alias("lift_ppm"),
        )
        .orderBy("item_a", "item_b")
    )


FREQUENT_ITEM_PAIRS_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS okey, CAST(l_partkey AS BIGINT) AS item FROM lineitem),
n AS (SELECT COUNT(DISTINCT okey) AS n_orders FROM li),
supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM li GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM li a JOIN li b ON a.okey = b.okey AND a.item < b.item
  GROUP BY a.item, b.item
  HAVING COUNT(*) >= 3
)
SELECT p.item_a, p.item_b, p.n_pair,
       sa.n_item AS n_a, sb.n_item AS n_b,
       CAST((p.n_pair * 1000000) // sa.n_item AS BIGINT) AS conf_a_to_b_ppm,
       CAST((p.n_pair * (SELECT n_orders FROM n) * 1000000) // (sa.n_item * sb.n_item) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN supp sa ON sa.item = p.item_a
JOIN supp sb ON sb.item = p.item_b
ORDER BY p.item_a, p.item_b
"""

QUERIES["frequent_item_pairs"] = Q(
    frequent_item_pairs,
    FREQUENT_ITEM_PAIRS_SQL,
    "A-priori frequent co-purchased pairs with ppm confidence and lift",
)


def events_keyset_page(spark, sf_dir):
    """Keyset (cursor) pagination — the scale-correct alternative to
    OFFSET (which always scans and discards the skip): page 3 of the
    event feed ordered by (ts, id), where the cursor is page 2's last
    key computed as a bounded subquery. The page read is a pure
    range predicate on the sort key — index/partition-prunable —
    plus one TakeOrdered of page size; OFFSET-free end to end."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", ms("ts").alias("ts_ms"), "event_type"
    )
    page = 50
    # cursor = the 100th row's (ts, id) in feed order (end of page 2),
    # computed as a 1-row bounded artifact
    cursor = (
        ev.orderBy("ts_ms", "event_id")
        .limit(2 * page)
        .orderBy(F.col("ts_ms").desc(), F.col("event_id").desc())
        .limit(1)
        .select(F.col("ts_ms").alias("c_ts"), F.col("event_id").alias("c_id"))
    )
    return (
        ev.crossJoin(F.broadcast(cursor))
        .filter(
            (F.col("ts_ms") > F.col("c_ts"))
            | ((F.col("ts_ms") == F.col("c_ts")) & (F.col("event_id") > F.col("c_id")))
        )
        .orderBy("ts_ms", "event_id")
        .limit(page)
        .select("event_id", "ts_ms", "event_type")
    )


EVENTS_KEYSET_PAGE_SQL = """
WITH e AS (SELECT event_id, epoch_ms(ts) AS ts_ms, event_type FROM events),
cursor AS (
  SELECT ts_ms AS c_ts, event_id AS c_id
  FROM (SELECT * FROM e ORDER BY ts_ms, event_id LIMIT 100)
  ORDER BY ts_ms DESC, event_id DESC LIMIT 1
)
SELECT e.event_id, e.ts_ms, e.event_type
FROM e, cursor
WHERE e.ts_ms > cursor.c_ts
   OR (e.ts_ms = cursor.c_ts AND e.event_id > cursor.c_id)
ORDER BY e.ts_ms, e.event_id
LIMIT 50
"""

QUERIES["events_keyset_page"] = Q(
    events_keyset_page,
    EVENTS_KEYSET_PAGE_SQL,
    "cursor-based pagination: range predicate + TakeOrdered, no OFFSET scan",
)


def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping): lineitem revenue flowing between
    two chosen nations in either direction, by year — two dimension
    chains onto one fact (supplier→nation, order→customer→nation), both
    broadcast; revenue on exact DECIMAL, year by EXTRACT (identical in
    both engines on date types)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    j = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    return (
        j.groupBy(
            "supp_nation",
            "cust_nation",
            F.year(F.col("o_orderdate")).cast("long").alias("o_year"),
        )
        .agg(
            F.sum(
                (
                    F.col("l_extendedprice").cast("decimal(18,6)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,6)"))
                ).cast("decimal(38,12)")
            )
            .cast("double")
            .alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
        .orderBy("supp_nation", "cust_nation", "o_year")
    )


TPCH_Q7_VOLUME_SHIPPING_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,6))
                * (1 - CAST(l.l_discount AS DECIMAL(18,6))) AS DECIMAL(38,12)))
            AS DOUBLE) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_items
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

QUERIES["tpch_q7_volume_shipping"] = Q(
    tpch_q7_volume_shipping,
    TPCH_Q7_VOLUME_SHIPPING_SQL,
    "TPC-H Q7 shape: nation-pair revenue by year, dual dim chains broadcast",
)


def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): orders whose total
    quantity exceeds a threshold — the grouped-HAVING-then-join pattern
    where the aggregate RESTRICTS the join (the having set is the small
    side and semi-restricts everything downstream)."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            ms("o_orderdate").alias("order_ts_ms"),
            F.col("total_qty").cast("double").alias("total_qty"),
        )
        .orderBy("o_orderkey")
    )


TPCH_Q18_LARGE_ORDERS_SQL = """
WITH big AS (
  SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 150
)
SELECT c.c_custkey, o.o_orderkey,
       epoch_ms(o.o_orderdate) AS order_ts_ms,
       CAST(b.total_qty AS DOUBLE) AS total_qty
FROM orders o
JOIN big b ON o.o_orderkey = b.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_orderkey
"""

QUERIES["tpch_q18_large_orders"] = Q(
    tpch_q18_large_orders,
    TPCH_Q18_LARGE_ORDERS_SQL,
    "TPC-H Q18 shape: HAVING-restricted aggregate drives the join",
)


def item_item_similarity(spark, sf_dir):
    """Item-item collaborative filtering from co-purchase counts: squared
    cosine on the ppm grid — sim²(a,b) = c_ab²·10⁶ DIV (c_a·c_b) — so no
    sqrt (not cross-engine exact) ever runs; ranking by sim² orders
    identically to sim. Top-3 similar items per item with support >= 3,
    symmetric pairs expanded from the canonical a<b counts. The classic
    recsys neighborhood build, all partial-agg + one bounded rank."""
    from pyspark.sql import Window

    li = (
        load(spark, sf_dir, "lineitem")
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_partkey").cast("long").alias("item"),
        )
        .distinct()
        .localCheckpoint()
    )
    supp = li.groupBy("item").agg(F.count("*").cast("long").alias("n_item"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.okey") == F.col("b.okey")) & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(F.col("a.item").alias("item_a"), F.col("b.item").alias("item_b"))
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 3)
    )
    sym = pairs.unionByName(
        pairs.select(
            F.col("item_b").alias("item_a"),
            F.col("item_a").alias("item_b"),
            "c_ab",
        )
    )
    scored = (
        sym.join(supp.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a")), "item_a")
        .join(supp.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b")), "item_b")
        .select(
            "item_a",
            "item_b",
            "c_ab",
            F.expr("(c_ab * c_ab * 1000000) DIV (n_a * n_b)")
            .cast("long")
            .alias("sim2_ppm"),
        )
    )
    w = Window.partitionBy("item_a").orderBy(
        F.col("sim2_ppm").desc(), F.col("item_b").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("item_a", "rnk", "item_b", "c_ab", "sim2_ppm")
        .orderBy("item_a", "rnk")
    )


ITEM_ITEM_SIMILARITY_SQL = """
WITH li AS (SELECT DISTINCT l_orderkey AS okey, CAST(l_partkey AS BIGINT) AS item FROM lineitem),
supp AS (SELECT item, CAST(COUNT(*) AS BIGINT) AS n_item FROM li GROUP BY item),
pairs AS (
  SELECT a.item AS item_a, b.item AS item_b, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM li a JOIN li b ON a.okey = b.okey AND a.item < b.item
  GROUP BY a.item, b.item HAVING COUNT(*) >= 3
),
sym AS (
  SELECT item_a, item_b, c_ab FROM pairs
  UNION ALL
  SELECT item_b, item_a, c_ab FROM pairs
),
scored AS (
  SELECT s.item_a, s.item_b, s.c_ab,
         CAST((s.c_ab * s.c_ab * 1000000) // (sa.n_item * sb.n_item) AS BIGINT) AS sim2_ppm
  FROM sym s
  JOIN supp sa ON sa.item = s.item_a
  JOIN supp sb ON sb.item = s.item_b
)
SELECT item_a, rnk, item_b, c_ab, sim2_ppm FROM (
  SELECT item_a, item_b, c_ab, sim2_ppm,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY item_a ORDER BY sim2_ppm DESC, item_b ASC) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 3
ORDER BY item_a, rnk
"""

QUERIES["item_item_similarity"] = Q(
    item_item_similarity,
    ITEM_ITEM_SIMILARITY_SQL,
    "item-item CF neighborhoods: squared-cosine ppm over co-purchase counts",
)


def audience_overlap_matrix(spark, sf_dir):
    """Exact pairwise audience overlap between event-type user sets —
    the 10-cell Jaccard matrix the HLL intersection gate estimates one
    cell of: distinct (type, user) sets self-joined on user, canonical
    type_a < type_b, overlap and union exact, jaccard on the ppm grid.
    Set sizes are type-bounded so the self-join operand is |types|·|users|
    — dimension-scale, no sketch needed at ANY corpus size (the sketch
    path exists for when the DISTINCT itself is the bottleneck)."""
    tu = (
        load(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .localCheckpoint()
    )
    sizes = tu.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a, b = tu.alias("a"), tu.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count("*").cast("long").alias("n_inter"))
    )
    return (
        inter.join(sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a")), "type_a")
        .join(sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b")), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_inter",
            F.expr("(n_inter * 1000000) DIV (n_a + n_b - n_inter)")
            .cast("long")
            .alias("jaccard_ppm"),
        )
        .orderBy("type_a", "type_b")
    )


AUDIENCE_OVERLAP_MATRIX_SQL = """
WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
sizes AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM tu GROUP BY event_type),
inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         CAST(COUNT(*) AS BIGINT) AS n_inter
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT i.type_a, i.type_b, sa.n AS n_a, sb.n AS n_b, i.n_inter,
       CAST((i.n_inter * 1000000) // (sa.n + sb.n - i.n_inter) AS BIGINT) AS jaccard_ppm
FROM inter i
JOIN sizes sa ON sa.event_type = i.type_a
JOIN sizes sb ON sb.event_type = i.type_b
ORDER BY i.type_a, i.type_b
"""

QUERIES["audience_overlap_matrix"] = Q(
    audience_overlap_matrix,
    AUDIENCE_OVERLAP_MATRIX_SQL,
    "exact pairwise audience Jaccard matrix between event-type user sets",
)


def revenue_share_hierarchy(spark, sf_dir):
    """Ratio-to-parent at two hierarchy levels in one pass: each nation's
    revenue as a ppm share of its region, and each region's as a ppm
    share of the global total.

    The nation-level aggregate is the only fact-table shuffle; both
    parent totals are computed by windows OVER the ~25-row nation
    aggregate, so the hierarchy costs nothing extra. Exact decimal sums;
    each ratio is one double multiply-divide-floor (bit-identical across
    engines on exact inputs).
    """
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)"))
    )
    per_nation = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.sum(rev).alias("nation_dec"))
    )
    w_region = Window.partitionBy("r_name")
    w_all = Window.partitionBy()
    return per_nation.select(
        "r_name",
        "n_name",
        F.col("nation_dec").cast("double").alias("nation_rev"),
        F.floor(
            F.col("nation_dec").cast("double")
            * 1000000.0
            / F.sum("nation_dec").over(w_region).cast("double")
        ).cast("bigint").alias("nation_share_ppm"),
        F.floor(
            F.sum("nation_dec").over(w_region).cast("double")
            * 1000000.0
            / F.sum("nation_dec").over(w_all).cast("double")
        ).cast("bigint").alias("region_share_ppm"),
    )


REVENUE_SHARE_HIERARCHY_SQL = """
WITH per_nation AS (
  SELECT r_name, n_name,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS nation_dec
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
)
SELECT r_name, n_name,
       CAST(nation_dec AS DOUBLE) AS nation_rev,
       CAST(FLOOR(CAST(nation_dec AS DOUBLE) * 1000000.0
                  / CAST(SUM(nation_dec) OVER (PARTITION BY r_name) AS DOUBLE)) AS BIGINT)
         AS nation_share_ppm,
       CAST(FLOOR(CAST(SUM(nation_dec) OVER (PARTITION BY r_name) AS DOUBLE) * 1000000.0
                  / CAST(SUM(nation_dec) OVER () AS DOUBLE)) AS BIGINT)
         AS region_share_ppm
FROM per_nation
"""

QUERIES["revenue_share_hierarchy"] = Q(
    revenue_share_hierarchy,
    REVENUE_SHARE_HIERARCHY_SQL,
    "two-level ratio-to-parent revenue shares (nation→region→global)",
)
