"""Dialect-portable SQL surface queries: each query here is ONE SQL string
executed verbatim by BOTH engines — ``spark.sql(text)`` over the registered
lake views (sql.py::register_tables) and DuckDB over the same parquet. The
oracle IS the query text, which pins the ``spark.sql`` entry point itself
(parser, analyzer, null-grouping semantics, set-op semantics, window
frames) rather than a hand-built DataFrame translation.

Constraints for the shared subset:
- money math in exact DECIMAL, cast to DOUBLE once at the end (float SUM
  order is engine-dependent, decimal sums are not);
- GROUPING() flags cast to BIGINT (the engines' native return types
  differ);
- no engine-specific temporal functions (``epoch_ms`` vs ``unix_millis``)
  — these queries stick to keys, strings, and decimals.
"""

from __future__ import annotations

from ..sql import register_tables
from .base import Q, load


def _sql_query(text: str):
    def fn(spark, sf_dir):
        register_tables(spark, sf_dir, include_derived=False)
        return spark.sql(text)

    return fn


SQL_ROLLUP_AGGREGATES = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""

SQL_NOT_EXISTS_CORRELATED = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
)
"""

# The EXCEPT side subtracts HIGH-VALUE error users only: every user has
# some error event, so subtracting all of them would make the result
# vacuously empty at every SF.
SQL_SET_OPS = """
(SELECT user_id FROM events WHERE event_type = 'purchase'
 INTERSECT
 SELECT user_id FROM events WHERE event_type = 'view')
EXCEPT
SELECT user_id FROM events WHERE event_type = 'error' AND value > 95
"""

SQL_RUNNING_WINDOW = """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_total
FROM orders WHERE o_custkey % 100 = 1
"""

SQL_SCALAR_SUBQUERY = """
SELECT o_orderpriority,
       COUNT(*) AS n_big,
       CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS min_price
FROM orders
WHERE CAST(o_totalprice AS DECIMAL(18,2)) >
      (SELECT CAST(AVG(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
       FROM orders)
GROUP BY o_orderpriority
"""

SQL_CUBE_FILTERED = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_custkey % 3 = 0) AS n_cust3,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            FILTER (WHERE o_custkey % 2 = 0) AS DOUBLE) AS even_cust_price
FROM orders
GROUP BY CUBE(o_orderstatus, o_orderpriority)
"""

SQL_CASE_PIVOT = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
FROM orders GROUP BY o_orderpriority
"""

QUERIES = {
    "sql_cube_filtered": Q(
        _sql_query(SQL_CUBE_FILTERED),
        SQL_CUBE_FILTERED,
        "CUBE grouping with FILTER-clause aggregates (shared SQL text)",
    ),
    "sql_case_pivot": Q(
        _sql_query(SQL_CASE_PIVOT),
        SQL_CASE_PIVOT,
        "conditional-aggregation pivot (shared SQL text)",
    ),
    "sql_rollup_aggregates": Q(
        _sql_query(SQL_ROLLUP_AGGREGATES),
        SQL_ROLLUP_AGGREGATES,
        "GROUP BY ROLLUP with GROUPING flags (shared SQL text)",
    ),
    "sql_not_exists_correlated": Q(
        _sql_query(SQL_NOT_EXISTS_CORRELATED),
        SQL_NOT_EXISTS_CORRELATED,
        "correlated NOT EXISTS anti-join (shared SQL text)",
    ),
    "sql_set_ops": Q(
        _sql_query(SQL_SET_OPS),
        SQL_SET_OPS,
        "INTERSECT / EXCEPT set operations (shared SQL text)",
    ),
    "sql_running_window": Q(
        _sql_query(SQL_RUNNING_WINDOW),
        SQL_RUNNING_WINDOW,
        "running decimal window frame (shared SQL text)",
    ),
    "sql_scalar_subquery": Q(
        _sql_query(SQL_SCALAR_SUBQUERY),
        SQL_SCALAR_SUBQUERY,
        "uncorrelated scalar subquery filter (shared SQL text)",
    ),
}


def sql_udf_surface(spark, sf_dir):
    """The registered-function surface (sql.py::register_functions) driven
    entirely through ``spark.sql``: SQL scalar functions (zmorton /
    tok_count / quality_ratio — inlined into codegen, zero UDF overhead)
    over the documents table. The oracle expands the same expressions
    DuckDB-side, proving the function bodies are dialect-portable."""
    from ..sql import register_functions

    load_mod = __import__(
        f"{__package__}.base", fromlist=["load"]
    )
    load_mod.load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    register_functions(spark)
    return spark.sql(
        """
        SELECT doc_id,
               tok_count(text) AS n_toks,
               quality_ratio(text) AS q_micro,
               zmorton(doc_id % 1024, LEAST(n_chars, 1023)) AS zkey
        FROM documents ORDER BY doc_id
        """
    )


def _udf_surface_oracle() -> str:
    from ..operators.zorder import zorder_expr_sql

    z = zorder_expr_sql(["(doc_id % 1024)", "LEAST(n_chars, 1023)"], 10)
    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
       CAST(ROUND(length(regexp_replace(text, '[^a-z ]', '', 'g'))
            * 1e6 / GREATEST(length(text), 1)) AS BIGINT) AS q_micro,
       CAST({z} AS BIGINT) AS zkey
FROM documents ORDER BY doc_id
"""


QUERIES["sql_udf_surface"] = Q(
    sql_udf_surface,
    _udf_surface_oracle(),
    "registered SQL scalar functions driven through spark.sql",
)


def sql_udtf_ngrams(spark, sf_dir):
    """The Python UDTF extension point (Spark 4 `spark.udtf.register`) —
    a user-defined TABLE function driven through SQL's LATERAL join, the
    modern replacement for RDD flatMap-style custom expansion. The UDTF
    emits (pos, 3-gram) rows per document; the query aggregates back to a
    bounded per-doc signature (count, distinct count, exact md5-prefix
    sum reduced mod 2^61-1 — integer end to end, no float rounding) so the hard signal covers every emitted row
    without shipping 100k rows through the comparator. Python UDTFs are
    the slow path (per-row eval) — this gate pins the API surface and its
    exact semantics, not a hot-path recommendation; the engine's hot
    n-gram kernels (shingles, chunking) stay in codegen."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: int, ngram: string")
    class NGrams:
        def eval(self, text: str, n: int):
            toks = text.split(" ")
            for i in range(len(toks) - n + 1):
                yield i, " ".join(toks[i : i + n])

    spark.udtf.register("ngrams_udtf", NGrams)
    load_mod = __import__(f"{__package__}.base", fromlist=["load"])
    load_mod.load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        """
        SELECT d.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_ngrams,
               CAST(COUNT(DISTINCT g.ngram) AS BIGINT) AS n_distinct,
               CAST(SUM(CAST(CAST(conv(substring(md5(concat(CAST(g.pos AS STRING), ':', g.ngram)), 1, 15), 16, 10) AS BIGINT) AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS hash_mod
        FROM documents d, LATERAL ngrams_udtf(d.text, 3) g
        GROUP BY d.doc_id ORDER BY d.doc_id
        """
    )


SQL_UDTF_NGRAMS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
g AS (
  SELECT doc_id,
         unnest(range(0, greatest(len(toks) - 2, 0))) AS pos,
         toks
  FROM t
),
e AS (
  SELECT doc_id, pos, array_to_string(toks[pos + 1:pos + 3], ' ') AS ngram FROM g
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_ngrams,
       CAST(COUNT(DISTINCT ngram) AS BIGINT) AS n_distinct,
       CAST(SUM(CAST(CAST('0x' || substr(md5(CAST(pos AS VARCHAR) || ':' || ngram), 1, 15) AS BIGINT) AS DECIMAL(38,0))) % 2305843009213693951 AS BIGINT) AS hash_mod
FROM e
GROUP BY doc_id ORDER BY doc_id
"""

QUERIES["sql_udtf_ngrams"] = Q(
    sql_udtf_ngrams,
    SQL_UDTF_NGRAMS_SQL,
    "Python UDTF (LATERAL table function) n-gram expansion with exact per-doc signature",
)


SQL_RECURSIVE_MONTH_GRID = """
WITH RECURSIVE months(y, m) AS (
  SELECT 1995, 1
  UNION ALL
  SELECT CASE WHEN m = 12 THEN y + 1 ELSE y END,
         CASE WHEN m = 12 THEN 1 ELSE m + 1 END
  FROM months WHERE (y < 2001) OR (y = 2001 AND m < 8)
),
om AS (
  SELECT CAST(year(o_orderdate) AS INT) AS y, CAST(month(o_orderdate) AS INT) AS m, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
)
SELECT g.y, g.m, CAST(COALESCE(om.n, 0) AS BIGINT) AS n_orders
FROM months g LEFT OUTER JOIN om ON g.y = om.y AND g.m = om.m
"""

QUERIES["sql_recursive_month_grid"] = Q(
    _sql_query(SQL_RECURSIVE_MONTH_GRID),
    SQL_RECURSIVE_MONTH_GRID,
    # Spark 4 WITH RECURSIVE pin: the calendar-scaffold recursion (80
    # iterations, integer-only arithmetic so the shared text is exact in
    # both dialects) left-joined to per-month order counts — zero-filled
    # months included, the gapfill pattern expressed in pure SQL.
    "WITH RECURSIVE month grid + zero-filled per-month counts (one shared text)",
)


def sql_udtf_table_arg(spark, sf_dir):
    """Spark 4 polymorphic UDTF with a TABLE argument: the planner
    routes each PARTITION BY group through one UDTF instance
    (eval per row, terminate emits the group summary) — the
    user-defined *relational* operator surface, distinct from the
    scalar-arg UDTF gate. Values aggregate on the cent grid so the
    spread is exact; the oracle is the plain GROUP BY equivalent.
    At scale this is one hash exchange (the PARTITION BY) feeding
    Arrow-batched Python, state bounded per group."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n bigint, spread_cents bigint")
    class SummarizeUser:
        def __init__(self):
            self._rows = []

        def eval(self, row):
            self._rows.append((row["user_id"], row["cents"]))

        def terminate(self):
            if self._rows:
                vals = [c for _, c in self._rows]
                yield self._rows[0][0], len(vals), max(vals) - min(vals)

    spark.udtf.register("summarize_user_cents", SummarizeUser)
    register_tables(spark, sf_dir, include_derived=False)
    return spark.sql(
        """
        SELECT user_id, n, spread_cents
        FROM summarize_user_cents(
          TABLE(SELECT user_id, CAST(ROUND(value * 100) AS BIGINT) AS cents
                FROM events)
          PARTITION BY user_id)
        """
    )


SQL_UDTF_TABLE_ARG_SQL = """
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MAX(CAST(ROUND(value * 100) AS BIGINT))
            - MIN(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS spread_cents
FROM events GROUP BY user_id
"""

QUERIES["sql_udtf_table_arg"] = Q(
    sql_udtf_table_arg,
    SQL_UDTF_TABLE_ARG_SQL,
    "polymorphic UDTF over a TABLE argument with PARTITION BY (per-group instance)",
)


def calendar_arithmetic_pin(spark, sf_dir):
    """Calendar-semantics battery: month addition CLAMPS at month end
    (Jan 31 + 1 month = Feb 29/28) identically in both engines, last_day,
    Monday-start week truncation, quarter extraction, and ISO day
    numbering (dayofweek is Sunday=1 in Spark vs isodow Monday=1 in
    DuckDB — the pin normalizes to ISO so the convention difference is
    explicit, not latent). All emitted as epoch-ms/BIGINT."""
    from pyspark.sql import functions as F

    from .base import load, ms

    o = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 97 == 0)
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        ms("o_orderdate").alias("d_ms"),
        F.unix_millis(F.add_months(d, 1).cast("timestamp")).alias("plus_month_ms"),
        F.unix_millis(F.last_day(d).cast("timestamp")).alias("month_end_ms"),
        F.unix_millis(F.date_trunc("week", d).cast("timestamp")).alias("week_start_ms"),
        F.quarter(d).cast("int").alias("qtr"),
        F.expr("((dayofweek(o_orderdate) + 5) % 7) + 1").cast("int").alias("iso_dow"),
    )


CALENDAR_ARITHMETIC_PIN_SQL = """
SELECT o_orderkey,
       epoch_ms(o_orderdate) AS d_ms,
       epoch_ms(CAST(CAST(o_orderdate AS DATE) + INTERVAL 1 MONTH AS TIMESTAMP)) AS plus_month_ms,
       epoch_ms(CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS month_end_ms,
       epoch_ms(CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS TIMESTAMP)) AS week_start_ms,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(isodow(o_orderdate) AS INT) AS iso_dow
FROM orders WHERE o_orderkey % 97 = 0
"""

QUERIES["calendar_arithmetic_pin"] = Q(
    calendar_arithmetic_pin,
    CALENDAR_ARITHMETIC_PIN_SQL,
    "calendar semantics: month-end clamp, last_day, ISO week/dow, quarter",
)


def try_cast_tolerance(spark, sf_dir):
    """TRY_CAST error-tolerance parity (the ANSI-mode-safe ingestion
    idiom): casting a hex fragment to INT yields a value for digit-only
    fragments and NULL for the rest — deterministic per row, no job
    failure. Found divergence, documented and excluded: DuckDB's
    TRY_CAST accepts scientific notation ('2e5' → 200000) AND binary
    literals ('0b1' → 1) where Spark's try_cast-to-int returns NULL, so
    hex fragments containing 'e' or starting '0b' are filtered out; on
    the rest the engines agree exactly (digit-only parses,
    letter-bearing → NULL)."""
    from pyspark.sql import functions as F

    from .base import load

    docs = load(spark, sf_dir, "documents")
    frag = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 3)
    parsed = F.expr(
        "try_cast(substring(md5(cast(doc_id as string)), 1, 3) as int)"
    )
    return docs.select(
        "doc_id", frag.alias("frag"), parsed.alias("parsed")
    ).filter(
        ~F.col("frag").contains("e") & ~F.col("frag").startswith("0b")
    ).groupBy().agg(
        F.count("*").cast("long").alias("n"),
        F.count("parsed").cast("long").alias("n_parsed"),
        F.sum("parsed").cast("long").alias("parsed_sum"),
    )


TRY_CAST_TOLERANCE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(TRY_CAST(substring(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS INT)) AS BIGINT) AS n_parsed,
       CAST(SUM(TRY_CAST(substring(md5(CAST(doc_id AS VARCHAR)), 1, 3) AS INT)) AS BIGINT) AS parsed_sum
FROM documents
WHERE NOT contains(substring(md5(CAST(doc_id AS VARCHAR)), 1, 3), 'e')
  AND substring(md5(CAST(doc_id AS VARCHAR)), 1, 2) <> '0b'
"""

QUERIES["try_cast_tolerance"] = Q(
    try_cast_tolerance,
    TRY_CAST_TOLERANCE_SQL,
    "TRY_CAST tolerance: identical parse/NULL decisions and sums in both engines",
)


SQL_GROUPING_SETS_EXPLICIT = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_s,
       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_p,
       COUNT(*) AS n
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
"""

QUERIES["sql_grouping_sets_explicit"] = Q(
    _sql_query(SQL_GROUPING_SETS_EXPLICIT),
    SQL_GROUPING_SETS_EXPLICIT,
    # explicit GROUPING SETS (disjoint slices + grand total in one pass)
    # — the form ROLLUP/CUBE cannot express; one shared text
    "explicit GROUPING SETS with GROUPING() flags (one shared text)",
)


SQL_LATERAL_TOPK = """
SELECT n.n_name, t.c_custkey, t.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_custkey, c_acctbal FROM customer c
  WHERE c.c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 2
) t
"""

QUERIES["sql_lateral_topk"] = Q(
    _sql_query(SQL_LATERAL_TOPK),
    SQL_LATERAL_TOPK,
    # correlated LATERAL derived table (top-2 per outer row) — the
    # per-row subplan join both planners decorrelate to a ranked join
    "correlated LATERAL top-k per outer row (one shared text)",
)


SQL_INTERSECT_ALL = """
SELECT user_id FROM events WHERE event_type = 'view'
INTERSECT ALL
SELECT user_id FROM events WHERE event_type = 'click'
"""

QUERIES["sql_intersect_all"] = Q(
    _sql_query(SQL_INTERSECT_ALL),
    SQL_INTERSECT_ALL,
    "bag-semantics INTERSECT ALL (multiplicity = min of the two sides)",
)


SQL_EXCEPT_ALL = """
SELECT user_id FROM events WHERE event_type = 'view'
EXCEPT ALL
SELECT user_id FROM events WHERE event_type = 'error'
"""

QUERIES["sql_except_all"] = Q(
    _sql_query(SQL_EXCEPT_ALL),
    SQL_EXCEPT_ALL,
    "bag-semantics EXCEPT ALL (multiplicity subtraction, not distinct)",
)


def try_arithmetic_pin(spark, sf_dir):
    """ANSI-safe arithmetic pin: try_multiply returns NULL on BIGINT
    overflow instead of failing the job (DuckDB has no try_* family and
    ERRORS on overflow, so the oracle guards with an explicit bound
    check — which is exactly the portable semantics the pin records).
    Factor 1 stays exact; factors ≥ 2 overflow 2⁶² and must null."""
    from pyspark.sql import functions as F

    from .base import load

    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 31 == 0)
    m = (F.col("event_id") % 5 + 1).cast("long")
    return ev.select(
        "event_id",
        m.alias("factor"),
        F.expr(
            "try_multiply(CAST(event_id % 5 + 1 AS BIGINT), CAST(4611686018427387904 AS BIGINT))"
        ).alias("product"),
    )


TRY_ARITHMETIC_PIN_SQL = """
SELECT event_id,
       CAST(event_id % 5 + 1 AS BIGINT) AS factor,
       CASE WHEN event_id % 5 + 1 = 1
            THEN CAST(4611686018427387904 AS BIGINT) END AS product
FROM events WHERE event_id % 31 = 0
"""

QUERIES["try_arithmetic_pin"] = Q(
    try_arithmetic_pin,
    TRY_ARITHMETIC_PIN_SQL,
    "try_multiply overflow-to-NULL vs the explicit guard the oracle must use",
)


def bitwise_agg_pin(spark, sf_dir):
    """Bitwise aggregate family (bit_and / bit_or / bit_xor) per event
    type over the low byte of user ids — exact integers, order-free
    (bitwise ops are commutative/associative), identical names in both
    engines."""
    from pyspark.sql import functions as F

    from .base import load

    ev = load(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 256).cast("long").alias("b")
    )
    return ev.groupBy("event_type").agg(
        F.expr("bit_and(b)").cast("long").alias("band"),
        F.expr("bit_or(b)").cast("long").alias("bor"),
        F.expr("bit_xor(b)").cast("long").alias("bxor"),
    )


BITWISE_AGG_PIN_SQL = """
SELECT event_type,
       CAST(BIT_AND(user_id % 256) AS BIGINT) AS band,
       CAST(BIT_OR(user_id % 256) AS BIGINT) AS bor,
       CAST(BIT_XOR(user_id % 256) AS BIGINT) AS bxor
FROM events GROUP BY event_type
"""

QUERIES["bitwise_agg_pin"] = Q(
    bitwise_agg_pin,
    BITWISE_AGG_PIN_SQL,
    "bit_and/bit_or/bit_xor aggregates (order-free exact integers)",
)


SQL_GROUP_BY_ALL = """
SELECT event_type, user_id % 10 AS bucket, COUNT(*) AS n,
       CAST(SUM(CASE WHEN props IS DISTINCT FROM '{"k": 0}' THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero_k
FROM events
GROUP BY ALL
ORDER BY ALL
"""

QUERIES["sql_group_by_all"] = Q(
    _sql_query(SQL_GROUP_BY_ALL),
    SQL_GROUP_BY_ALL,
    # GROUP BY ALL / ORDER BY ALL (the modern analyst dialect both
    # engines converged on) + null-safe IS DISTINCT FROM, one shared text
    "GROUP BY ALL + ORDER BY ALL + IS DISTINCT FROM (one shared text)",
)


SQL_TUPLE_SEMANTICS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CASE WHEN (o_orderstatus, o_orderpriority) < ('O', '3-MEDIUM') THEN 1 ELSE 0 END) AS BIGINT) AS n_below
FROM orders
WHERE (o_orderstatus, o_orderpriority) IN (('O', '1-URGENT'), ('F', '5-LOW'), ('P', '2-HIGH'))
GROUP BY ALL
"""

QUERIES["sql_tuple_semantics"] = Q(
    _sql_query(SQL_TUPLE_SEMANTICS),
    SQL_TUPLE_SEMANTICS,
    # row-value (tuple) IN-list membership and lexicographic tuple
    # comparison — one shared text
    "row-value IN list + lexicographic tuple comparison (one shared text)",
)


def sql_named_params(spark, sf_dir):
    """Spark 4 parameterized SQL: named ``:param`` markers bound at
    ``spark.sql(...)`` call time plus a ``{df}`` DataFrame template
    argument — the injection-safe programmatic-SQL entry point (literals
    arrive as typed values, never string-spliced). The oracle runs the
    equivalent text with the same constants inlined; parameter binding
    must be invisible to the result."""
    from .base import load

    orders = load(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
        FROM {orders}
        WHERE o_totalprice > :minp AND o_orderstatus = :status
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
        """,
        orders=orders,
        args={"minp": 50000.0, "status": "O"},
    )


SQL_NAMED_PARAMS_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(o_totalprice * 100 AS DECIMAL(18,0))) AS BIGINT) AS cents
FROM orders
WHERE o_totalprice > 50000.0 AND o_orderstatus = 'O'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES["sql_named_params"] = Q(
    sql_named_params,
    SQL_NAMED_PARAMS_ORACLE,
    "Spark 4 named-parameter SQL + DataFrame template args vs inlined-constant oracle",
)


def observed_ingest_metrics(spark, sf_dir):
    """``Dataset.observe()`` — data-quality counters that ride the ingest
    scan as a CollectMetrics node: row count, cent-grid value sum, a
    conditional anomaly counter, and a max watermark accumulate on the
    executors DURING the write action, costing zero extra jobs (the
    alternative — a second aggregation over the source — re-scans
    everything; at 100 TB that is the difference between free telemetry
    and a second pass). The noop-sink write drives the action; the
    Observation's resolved metrics are rebuilt into a 1-row DataFrame
    whose values the batch-side oracle must reproduce exactly.

    DISTINCT aggregates are rejected by CollectMetrics (Spark
    INVALID_OBSERVED_METRICS), so the counters stick to the
    merge-able forms a streaming-safe metric requires.
    """
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    ev = load(spark, sf_dir, "events").select("user_id", "event_type", "value")
    obs = Observation("ingest_metrics")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_cents"),
        F.count(F.when(F.col("value") < 0, 1)).alias("n_negative"),
        F.max("user_id").alias("max_user_id"),
    )
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    return spark.createDataFrame(
        [
            (
                int(m["n_rows"]),
                int(m["sum_cents"]),
                int(m["n_negative"]),
                int(m["max_user_id"]),
            )
        ],
        "n_rows long, sum_cents long, n_negative long, max_user_id long",
    )


OBSERVED_INGEST_METRICS_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
       CAST(COUNT(CASE WHEN value < 0 THEN 1 END) AS BIGINT) AS n_negative,
       CAST(MAX(user_id) AS BIGINT) AS max_user_id
FROM events
"""

QUERIES["observed_ingest_metrics"] = Q(
    observed_ingest_metrics,
    OBSERVED_INGEST_METRICS_SQL,
    "Dataset.observe() CollectMetrics counters riding the ingest action, zero extra scan",
)
