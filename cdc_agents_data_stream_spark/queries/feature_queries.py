"""Feature-engineering gates — the tabular prep steps between a raw
lake and a training run: outlier winsorization, leave-one-out target
encoding, and the deterministic hash split. Each is one or two
partial-aggregated passes; nothing collects, nothing is keyed on more
than the feature's own cardinality.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .base import Q, load


def winsorize_stats(spark, sf_dir):
    """Per-event-type P01/P99 winsorization with DISCRETE (type-1)
    percentile thresholds on the exact micro grid: clip counts and the
    micro-grid sum of the clipped column.

    Why discrete + integral: the original interpolated-percentile form
    compared raw values against an FP-constructed threshold — the sf1
    derivative sweep caught a 1-ulp Spark/DuckDB divergence in the
    interpolation flipping an entire 10-row tie group at the boundary
    (n_clip_high 2000 vs 2010). Here the threshold IS a data value
    (smallest v with cum_count ≥ ceil(q·n), rank math in pure integers:
    ceil(n/100) = (n+99) DIV 100), so both engines agree bit-for-bit no
    matter how tied the data is.

    Shape: ONE shuffle over raw events builds the bounded per-(type,
    micro-value) histogram (map-side combine; cardinality is the value
    DOMAIN, not the row count — the auc_roc_exact pattern); thresholds,
    clip counts and clipped sums all derive from that histogram, so the
    raw table is never re-scanned. At 100 TB with an unbounded value
    domain this becomes approx_percentile territory; the exact-histogram
    contract is documented here on purpose."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 1e6).cast("long").alias("v")
    )
    h = ev.groupBy("event_type", "v").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy("v")
    cum = (
        h.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("n", F.sum("cnt").over(Window.partitionBy("event_type")))
    )
    bounds = cum.groupBy("event_type").agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 99) DIV 100"), F.col("v"))
        ).alias("p01"),
        F.min(
            F.when(F.col("cum") >= F.expr("(99 * n + 99) DIV 100"), F.col("v"))
        ).alias("p99"),
        F.max("n").alias("n"),
    )
    return (
        h.join(F.broadcast(bounds), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n").cast("long").alias("n"),
            F.sum(F.when(F.col("v") < F.col("p01"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_clip_low"),
            F.sum(F.when(F.col("v") > F.col("p99"), F.col("cnt")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_clip_high"),
            F.sum(
                F.col("cnt")
                * F.least(F.greatest(F.col("v"), F.col("p01")), F.col("p99"))
            )
            .cast("long")
            .alias("sum_clipped_micro"),
        )
        .orderBy("event_type")
    )


WINSORIZE_STATS_SQL = """
WITH h AS (
  SELECT event_type, CAST(ROUND(value * 1e6) AS BIGINT) AS v, COUNT(*) AS cnt
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT event_type, v, cnt,
         SUM(cnt) OVER (PARTITION BY event_type ORDER BY v) AS cum,
         SUM(cnt) OVER (PARTITION BY event_type) AS n
  FROM h
),
b AS (
  SELECT event_type,
         MIN(CASE WHEN cum >= (n + 99) // 100 THEN v END) AS p01,
         MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END) AS p99,
         MAX(n) AS n
  FROM cum GROUP BY event_type
)
SELECT h.event_type,
       CAST(MAX(b.n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN h.v < b.p01 THEN h.cnt ELSE 0 END) AS BIGINT) AS n_clip_low,
       CAST(SUM(CASE WHEN h.v > b.p99 THEN h.cnt ELSE 0 END) AS BIGINT) AS n_clip_high,
       CAST(SUM(h.cnt * LEAST(GREATEST(h.v, b.p01), b.p99)) AS BIGINT) AS sum_clipped_micro
FROM h JOIN b USING (event_type)
GROUP BY h.event_type
ORDER BY h.event_type
"""


def target_encode_loo(spark, sf_dir):
    """Leave-one-out target encoding of ``event_type`` against the value
    target: enc(row) = (Σ_group − v) / (n_group − 1) on the exact micro
    grid — the standard leakage-safe categorical encoding. One grouped
    aggregate (category-cardinality artifact, broadcast back) + a map;
    singleton groups encode null rather than divide by zero."""
    ev = load(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 1e6).cast("long").alias("v_micro"),
    )
    g = ev.groupBy("event_type").agg(
        F.sum(F.col("v_micro").cast("decimal(38,0)")).alias("s"),
        F.count("*").cast("long").alias("n"),
    )
    # integer floor-division on the DECIMAL grid: a float ROUND(x, 6)
    # here diverged by 1 ulp between engines at sf0.1 (half-boundary
    # representation), so the encoding stays exact end-to-end
    enc = F.expr("(s - v_micro) DIV (n - 1)").cast("long")
    return (
        ev.join(F.broadcast(g), "event_type")
        .select(
            "event_id",
            "event_type",
            "v_micro",
            F.when(F.col("n") > 1, enc).alias("loo_enc_micro"),
        )
        .orderBy("event_id")
    )


TARGET_ENCODE_LOO_SQL = """
WITH e AS (
  SELECT event_id, event_type,
         CAST(ROUND(value * 1e6) AS BIGINT) AS v_micro
  FROM events
),
g AS (
  SELECT event_type, CAST(SUM(CAST(v_micro AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM e GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.v_micro,
       CASE WHEN g.n > 1
            THEN CAST((CAST(g.s AS HUGEINT) - e.v_micro) // (g.n - 1) AS BIGINT)
            END AS loo_enc_micro
FROM e JOIN g USING (event_type)
ORDER BY e.event_id
"""


def train_val_test_split(spark, sf_dir):
    """Deterministic 80/10/10 hash split: the split of a row is a pure
    function of its id (md5 bucket), so reruns, backfills, and other
    engines agree row-for-row — no random() anywhere. Output: per
    (event_type, split) counts plus the exact id-sum as the
    membership-hash signal (counts alone could mask swapped rows)."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 100"
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        ev.select("event_type", split.alias("split"), "event_id")
        .groupBy("event_type", "split")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("event_id").cast("decimal(38,0)"))
            .cast("double")
            .alias("sum_id"),
        )
        .orderBy("event_type", "split")
    )


TRAIN_VAL_TEST_SPLIT_SQL = """
WITH e AS (
  SELECT event_type, event_id,
         CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT)
           % 100 AS bucket
  FROM events
)
SELECT event_type,
       CASE WHEN bucket < 80 THEN 'train'
            WHEN bucket < 90 THEN 'val'
            ELSE 'test' END AS split,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(event_id AS DECIMAL(38,0))) AS DECIMAL(38,0))
            AS DOUBLE) AS sum_id
FROM e
GROUP BY event_type, split
ORDER BY event_type, split
"""


QUERIES = {
    "winsorize_stats": Q(
        winsorize_stats,
        WINSORIZE_STATS_SQL,
        "per-group P01/P99 winsorization with clip counts",
    ),
    "target_encode_loo": Q(
        target_encode_loo,
        TARGET_ENCODE_LOO_SQL,
        "leave-one-out target encoding (leakage-safe)",
    ),
    "train_val_test_split": Q(
        train_val_test_split,
        TRAIN_VAL_TEST_SPLIT_SQL,
        "deterministic md5 80/10/10 split with membership signal",
    ),
}


def value_outliers_zscore(spark, sf_dir):
    """3σ outlier screen per event type, entirely in exact integers: the
    test |x−μ| > 3σ cross-multiplies to (x·n − Σx)² > 9·(n·Σx² − (Σx)²)
    on the cent grid, so no mean, no sqrt, and no float ever enters the
    comparison. The squared terms reach ~4·10¹⁹ at sf0.1 (past BIGINT),
    so both engines widen exactly: Spark to DECIMAL(38,0), DuckDB to
    HUGEINT. One partial-agg pass builds the per-type moments (5 groups
    → broadcast), one map-side pass flags; at 100 TB the fact table
    never shuffles."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    g = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    d38 = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    j = ev.join(F.broadcast(g), "event_type")
    diff = d38(F.col("c") * F.col("n") - F.col("s"))
    rhs = (d38(F.col("ss")) * d38(F.col("n")) - d38(F.col("s")) * d38(F.col("s"))) * 9
    return (
        j.select("event_type", "n", (diff * diff > rhs).cast("int").alias("is_outlier"))
        .groupBy("event_type")
        .agg(
            F.first("n").cast("long").alias("n"),
            F.sum("is_outlier").cast("long").alias("n_outliers"),
        )
    )


VALUE_OUTLIERS_ZSCORE_SQL = """
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
g AS (
  SELECT event_type, COUNT(*) AS n, SUM(c) AS s, SUM(c * c) AS ss
  FROM e GROUP BY event_type
),
flags AS (
  SELECT e.event_type, g.n,
         CASE WHEN CAST(e.c * g.n - g.s AS HUGEINT) * CAST(e.c * g.n - g.s AS HUGEINT)
                   > 9 * (CAST(g.ss AS HUGEINT) * g.n - CAST(g.s AS HUGEINT) * g.s)
              THEN 1 ELSE 0 END AS is_outlier
  FROM e JOIN g USING (event_type)
)
SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
       CAST(SUM(is_outlier) AS BIGINT) AS n_outliers
FROM flags GROUP BY event_type
"""

QUERIES["value_outliers_zscore"] = Q(
    value_outliers_zscore,
    VALUE_OUTLIERS_ZSCORE_SQL,
    "integer-exact 3-sigma outlier screen (cross-multiplied, no sqrt/float)",
)


def value_gini_ppm(spark, sf_dir):
    """Inequality profile per event type — the Gini coefficient on the
    integer ppm grid, computed by a GROUPED_AGG pandas UDF (the Arrow
    vectorized-UDAF path; this is the one aggregation family built-ins
    cannot express, since Gini needs the full sorted group). Inside the
    UDF: sort, Σ(2i−n−1)·x in int64 (≤1.4·10¹⁴ here), then the ppm via
    arbitrary-precision Python ints — exact, tie-order invariant. The
    oracle reproduces the rank formula with HUGEINT widening. Spark
    shuffles only (type, cents) pairs; each group aggregates in one
    Arrow batch."""
    import pandas as pd

    # NOTE: no type annotations — `from __future__ import annotations`
    # stringifies them and pandas_udf's signature inference rejects the
    # strings; the PandasUDFType is pinned explicitly instead.
    from pyspark.sql.functions import PandasUDFType

    @F.pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def gini_ppm(cents):
        x = cents.sort_values().to_numpy()
        n = len(x)
        tot = int(x.sum())
        if n == 0 or tot == 0:
            return 0
        import numpy as np

        num = int(((2 * np.arange(1, n + 1) - n - 1) * x).sum())
        return num * 1_000_000 // (n * tot)

    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    # Spark disallows mixing a GROUPED_AGG pandas UDF with JVM aggregates
    # in one agg() — the counts come from a second pass joined back (both
    # sides partial-aggregate; the join is 5 rows).
    g = ev.groupBy("event_type").agg(gini_ppm("cents").alias("gini_ppm"))
    n = ev.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    return n.join(g, "event_type").select("event_type", "n", "gini_ppm")


VALUE_GINI_PPM_SQL = """
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
),
r AS (
  SELECT event_type, cents,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY cents) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n,
         SUM(cents) OVER (PARTITION BY event_type) AS tot
  FROM e
)
SELECT event_type, CAST(MIN(n) AS BIGINT) AS n,
       CAST(CAST(SUM((2 * rn - n - 1) * cents) AS HUGEINT) * 1000000
            // (MIN(n) * MIN(tot)) AS BIGINT) AS gini_ppm
FROM r GROUP BY event_type
"""

QUERIES["value_gini_ppm"] = Q(
    value_gini_ppm,
    VALUE_GINI_PPM_SQL,
    "Gini coefficient per group via GROUPED_AGG pandas UDF (exact ppm grid)",
)


def minmax_scale_ppm(spark, sf_dir):
    """Per-group min-max scaling to the ppm grid: scaled = FLOOR((x −
    min)·10⁶ / (max − min)) — the [0, 1e6] normalization a feature
    pipeline applies before training, exact because x lives on the cent
    grid and FLOOR is pinned on both engines (their native casts
    disagree: truncate vs round). Degenerate groups (max == min) emit
    0. One broadcast moments pass + a map-side scale; the fact table
    never shuffles."""
    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    g = ev.groupBy("event_type").agg(
        F.min("c").alias("cmin"), F.max("c").alias("cmax")
    )
    j = ev.join(F.broadcast(g), "event_type")
    scaled = F.when(F.col("cmax") > F.col("cmin"),
        F.floor((F.col("c") - F.col("cmin")) * 1_000_000 / (F.col("cmax") - F.col("cmin")))
    ).otherwise(F.lit(0)).cast("long")
    return j.select("event_id", "event_type", scaled.alias("scaled_ppm"))


MINMAX_SCALE_PPM_SQL = """
WITH e AS (
  SELECT event_id, event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
g AS (
  SELECT event_type, MIN(c) AS cmin, MAX(c) AS cmax FROM e GROUP BY event_type
)
SELECT event_id, e.event_type,
       CAST(CASE WHEN g.cmax > g.cmin
                 THEN FLOOR((e.c - g.cmin) * 1000000.0 / (g.cmax - g.cmin))
                 ELSE 0 END AS BIGINT) AS scaled_ppm
FROM e JOIN g ON e.event_type = g.event_type
"""

QUERIES["minmax_scale_ppm"] = Q(
    minmax_scale_ppm,
    MINMAX_SCALE_PPM_SQL,
    "per-group min-max scaling to [0, 1e6] (broadcast moments, map-side scale)",
)


def value_ks_statistic(spark, sf_dir):
    """Two-sample Kolmogorov–Smirnov drift statistic, exact integers:
    split events by id parity, pre-aggregate counts per cent value
    (the corpus-scale pass — the running CDFs then live on the
    distinct-value domain, bounded by the cent grid, not the row
    count), and take D = max |F1 − F2| cross-multiplied onto the
    n1·n2 grid: ks_num = max |c1·n2 − c2·n1|, reported with the exact
    denominator and the argmax cent value. The classic drift test the
    L1-histogram monitor approximates."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("c"),
        (F.col("event_id") % 2 == 0).cast("int").alias("s1"),
    )
    per_val = ev.groupBy("c").agg(
        F.sum("s1").cast("long").alias("n1_v"),
        F.sum(1 - F.col("s1")).cast("long").alias("n2_v"),
    )
    tot = per_val.agg(
        F.sum("n1_v").alias("n1"), F.sum("n2_v").alias("n2")
    )
    w = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cdf = per_val.select(
        "c",
        F.sum("n1_v").over(w).alias("c1"),
        F.sum("n2_v").over(w).alias("c2"),
    ).crossJoin(F.broadcast(tot))
    diff = F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1"))
    return cdf.select("c", diff.alias("d"), "n1", "n2").groupBy().agg(
        F.max("d").cast("long").alias("ks_num"),
        (F.first("n1") * F.first("n2")).cast("long").alias("ks_den"),
        F.max_by(F.col("c"), F.struct(F.col("d"), -F.col("c"))).cast("long").alias("ks_at_cent"),
    )


VALUE_KS_STATISTIC_SQL = """
WITH e AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS c,
         CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END AS s1
  FROM events
),
per_val AS (
  SELECT c, CAST(SUM(s1) AS BIGINT) AS n1_v, CAST(SUM(1 - s1) AS BIGINT) AS n2_v
  FROM e GROUP BY c
),
tot AS (SELECT SUM(n1_v) AS n1, SUM(n2_v) AS n2 FROM per_val),
cdf AS (
  SELECT c,
         SUM(n1_v) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c1,
         SUM(n2_v) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c2
  FROM per_val
),
d AS (
  SELECT c, ABS(c1 * t.n2 - c2 * t.n1) AS d, t.n1, t.n2
  FROM cdf CROSS JOIN tot t
),
r AS (
  SELECT c, d, n1, n2,
         ROW_NUMBER() OVER (ORDER BY d DESC, c ASC) AS rn
  FROM d
)
SELECT CAST(MAX(d) AS BIGINT) AS ks_num,
       CAST(MIN(n1) * MIN(n2) AS BIGINT) AS ks_den,
       CAST(MIN(CASE WHEN rn = 1 THEN c END) AS BIGINT) AS ks_at_cent
FROM r
"""

QUERIES["value_ks_statistic"] = Q(
    value_ks_statistic,
    VALUE_KS_STATISTIC_SQL,
    "exact two-sample KS drift statistic on the cross-multiplied integer grid",
)


def value_percentile_disc(spark, sf_dir):
    """Discrete percentiles (percentile_disc WITHIN GROUP — the value
    returned must be an ACTUAL element, not an interpolation, so on the
    cent grid it is hash-exact with no float anywhere): p25/p50/p75 per
    event type plus the interpolated median's 2× integer form for
    contrast. DuckDB's quantile_disc uses the same lower-rank
    definition."""
    ev = load(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    ev.createOrReplaceTempView("pd_events")
    out = spark.sql(
        """
        SELECT event_type,
               percentile_disc(0.25) WITHIN GROUP (ORDER BY c) AS p25_cents,
               percentile_disc(0.5)  WITHIN GROUP (ORDER BY c) AS p50_cents,
               percentile_disc(0.75) WITHIN GROUP (ORDER BY c) AS p75_cents,
               CAST(ROUND(2 * percentile(c, 0.5)) AS BIGINT) AS median2_cents
        FROM pd_events GROUP BY event_type
        """
    ).select(
        "event_type",
        F.col("p25_cents").cast("long").alias("p25_cents"),
        F.col("p50_cents").cast("long").alias("p50_cents"),
        F.col("p75_cents").cast("long").alias("p75_cents"),
        "median2_cents",
    )
    spark.catalog.dropTempView("pd_events")
    return out


VALUE_PERCENTILE_DISC_SQL = """
WITH e AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
)
SELECT event_type,
       CAST(quantile_disc(c, 0.25) AS BIGINT) AS p25_cents,
       CAST(quantile_disc(c, 0.5)  AS BIGINT) AS p50_cents,
       CAST(quantile_disc(c, 0.75) AS BIGINT) AS p75_cents,
       CAST(ROUND(2 * quantile_cont(c, 0.5)) AS BIGINT) AS median2_cents
FROM e GROUP BY event_type
"""

QUERIES["value_percentile_disc"] = Q(
    value_percentile_disc,
    VALUE_PERCENTILE_DISC_SQL,
    "discrete percentiles (actual elements, WITHIN GROUP) + 2x interpolated median",
)


def kfold_assignment(spark, sf_dir):
    """Deterministic k-fold cross-validation assignment (k=5): the fold
    of a row is md5(id) mod k — a pure row function, layout-invariant
    and reproducible across engines and reruns (the generalization of
    the 80/10/10 holdout split). Per (fold, event_type) counts with the
    exact id-sum membership signal, so swapped rows cannot hide behind
    equal counts."""
    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    fold = F.expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10) AS BIGINT) % 5"
    )
    return (
        ev.select(fold.cast("long").alias("fold"), "event_type", "event_id")
        .groupBy("fold", "event_type")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(F.col("event_id").cast("decimal(38,0)")).cast("double").alias("id_sum"),
        )
    )


KFOLD_ASSIGNMENT_SQL = """
SELECT CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) AS BIGINT) % 5 AS fold,
       event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(CAST(SUM(CAST(event_id AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS DOUBLE) AS id_sum
FROM events
GROUP BY fold, event_type
"""

QUERIES["kfold_assignment"] = Q(
    kfold_assignment,
    KFOLD_ASSIGNMENT_SQL,
    "deterministic md5 k-fold assignment with id-sum membership signal",
)


def doc_embedding_mean_pool(spark, sf_dir):
    """Embed-and-pool — the shape that turns a text lake into a vector
    lake: tokens hash into the (broadcast) embedding table, and each
    document mean-pools its token vectors componentwise. Three bounded
    stages: (1) per-doc token-frequency reduction BEFORE the join (the
    join input is distinct (doc, vec) pairs, not raw tokens), (2) one
    broadcast hash join against the micro-grid embedding table, (3) a
    componentwise weighted sum via a 16-wide posexplode of the already-
    reduced pairs. Everything integral: components on the 1e6 grid,
    mean = Σ cnt·v DIV Σ cnt. At 100 TB the corpus shuffles once (the
    doc-token reduction); the embedding table rides the broadcast.

    Output long-form (doc_id, j, mean_micro) over the first 16
    components — 16 rows/doc, hash-stable."""
    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    n_vecs = F.broadcast(emb.agg(F.count("*").alias("nv")))
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).filter(F.col("tok") != "")
    # Hash the VOCABULARY, not every occurrence: md5+base-conv are the
    # per-row hot cost, and the corpus repeats a bounded token set
    # (~3k distinct over 27M occurrences at the sf10 decade — a 9000×
    # cut in hash invocations). The distinct reduces map-side to the
    # vocab before shuffling, and the tok→vec_id map rides a broadcast
    # back onto the occurrence stream. For an unbounded real-corpus
    # vocabulary the occurrence-side hash (previous form) is the
    # fallback shape — the vocab here is dimension-bounded like the
    # brand dictionary in market_basket_pairs.
    vhash = (
        toks.select("tok")
        .distinct()
        .crossJoin(n_vecs)
        .select(
            "tok",
            (
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
                % F.col("nv")
            ).alias("vec_id"),
        )
    )
    pairs = (
        toks.join(F.broadcast(vhash), "tok")
        .groupBy("doc_id", "vec_id")
        .agg(F.count("*").alias("cnt"))
    )
    emb16 = emb.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.expr(
            "transform(slice(embedding, 1, 16), v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT))"
        ).alias("iv"),
    )
    j = pairs.join(F.broadcast(emb16), "vec_id")
    # Pool the 16 components as WIDE aggregate columns and unpivot AFTER
    # the reduction: the earlier posexplode-then-groupBy(doc, j) form
    # multiplied the exchange's row count 16× before aggregating, and a
    # cosmetic global ORDER BY added a full range-exchange sort of the
    # 16·|docs| output (the driver compare is order-insensitive). Wide
    # agg + post-agg posexplode shuffles one row per doc and emits the
    # long form map-side. A/B at the sf10 decade (500k docs, ~50M
    # tokens): 21.2 s → the pairs reduction now dominates.
    sums = j.groupBy("doc_id").agg(
        F.sum("cnt").alias("den"),
        *[F.sum(F.expr(f"cnt * iv[{i}]")).alias(f"s{i}") for i in range(16)],
    )
    return sums.select(
        "doc_id",
        "den",
        F.posexplode(F.array(*[F.col(f"s{i}") for i in range(16)])).alias("j", "num"),
    ).select(
        "doc_id",
        "j",
        F.expr("num DIV den").cast("long").alias("mean_micro"),
    )


DOC_EMBEDDING_MEAN_POOL_SQL = """
WITH nv AS (SELECT COUNT(*) AS nv FROM embeddings),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
pairs AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) % nv.nv AS vec_id,
         COUNT(*) AS cnt
  FROM toks CROSS JOIN nv
  WHERE tok <> ''
  GROUP BY 1, 2
),
emb16 AS (
  SELECT CAST(vec_id AS BIGINT) AS vec_id,
         list_transform(embedding[1:16],
                        v -> CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)) AS iv
  FROM embeddings
),
expl AS (
  SELECT p.doc_id, p.cnt, u.j - 1 AS j, iv[u.j] AS v
  FROM pairs p
  JOIN emb16 e USING (vec_id)
  CROSS JOIN (SELECT unnest(generate_series(1, 16)) AS j) u
)
SELECT doc_id, CAST(j AS INT) AS j,
       CAST(SUM(cnt * v) // SUM(cnt) AS BIGINT) AS mean_micro
FROM expl GROUP BY doc_id, j ORDER BY doc_id, j
"""

QUERIES["doc_embedding_mean_pool"] = Q(
    doc_embedding_mean_pool,
    DOC_EMBEDDING_MEAN_POOL_SQL,
    "embed-and-pool: hashed token->embedding broadcast join, integer-grid mean pooling",
)


def weighted_median_cents(spark, sf_dir):
    """WEIGHTED median — the quantile family's missing member (the
    engine's percentile gates are row-weighted): per event type, the
    smallest value whose cumulative cents reach half the type's total
    cents, i.e. the value splitting the MONEY in half rather than the
    rows. Same scale shape as the discrete percentiles: a (type, value)
    histogram bounded by the cent grid, one cumulative window over it,
    one argmin — the corpus shuffles once."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    hist = (
        ev.select(
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(F.sum("cents").alias("w"), F.count("*").alias("n"))
    )
    cum = Window.partitionBy("event_type").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.partitionBy("event_type")
    ranked = hist.withColumn("cw", F.sum("w").over(cum)).withColumn(
        "tw", F.sum("w").over(tot)
    )
    return (
        ranked.filter(F.expr("cw * 2 >= tw"))
        .groupBy("event_type")
        .agg(
            F.min("cents").cast("bigint").alias("weighted_median_cents"),
            F.max("tw").cast("bigint").alias("total_cents"),
        )
        .orderBy("event_type")
    )


WEIGHTED_MEDIAN_CENTS_SQL = """
WITH hist AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS w
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT event_type, cents,
         SUM(w) OVER (PARTITION BY event_type ORDER BY cents
                      ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(w) OVER (PARTITION BY event_type) AS tw
  FROM hist
)
SELECT event_type,
       CAST(MIN(cents) AS BIGINT) AS weighted_median_cents,
       CAST(MAX(tw) AS BIGINT) AS total_cents
FROM ranked WHERE cw * 2 >= tw
GROUP BY event_type ORDER BY event_type
"""

QUERIES["weighted_median_cents"] = Q(
    weighted_median_cents,
    WEIGHTED_MEDIAN_CENTS_SQL,
    "weighted median: the value splitting each type's total cents in half",
)
