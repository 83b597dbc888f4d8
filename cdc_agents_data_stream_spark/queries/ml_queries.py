"""Distributed-ML gates: grouped OLS (normal equations), the embedding
covariance/second-moment matrix, and Johnson-Lindenstrauss projection.

These extend the engine past the reference's aggregation ceiling (the
reference has no model fitting or linear algebra — SURVEY §2) with the
shapes a training-data pipeline fits models with at 100 TB: sufficient
statistics via one partial aggregation, d²-bounded partial outer
products, and a map-only projection. Oracles follow the engine-wide
integer-grid rules (base.py docstring).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import linalg as L
from ..operators import regression as R
from .base import Q, load

# Fixed epoch base (2024-01-01 UTC) keeps x² sums small enough for the
# decimal grid at any SF; a shared literal like HLL_ALPHA.
_X_BASE_S = 1_704_067_200
EMB_DIM = 64
RP_DIM = 16


def event_value_trend(spark, sf_dir):
    """Per-event-type OLS trend of value (micro-units) over time
    (seconds since 2024-01-01): one partially-aggregated groupBy carrying
    five sufficient statistics — the fit itself never sees a row."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(1000))
        .cast("bigint")
        .alias("x_raw"),
        F.round(F.col("value") * 1e6).cast("bigint").alias("y_micro"),
    ).select(
        "event_type",
        (F.col("x_raw") - F.lit(_X_BASE_S)).alias("x_s"),
        "y_micro",
    )
    return R.grouped_ols(pts, "event_type", "x_s", "y_micro").orderBy("event_type")


# unix_millis() DIV 1000 floors; epoch_ms(ts)//1000 floors too (ts >= epoch).
EVENT_VALUE_TREND_SQL = R.ols_oracle_sql(
    "events",
    "event_type",
    f"(epoch_ms(ts) // 1000 - {_X_BASE_S})",
    "CAST(ROUND(value * 1e6) AS BIGINT)",
) + " ORDER BY event_type"


def grouped_normal_eq(spark, sf_dir):
    """Per-event-type multi-feature sufficient statistics (XᵀX upper
    triangle + Xᵀy with x₁ = seconds since 2024-01-01, x₂ = hour of day,
    y = value micro-units): the d-feature generalization of
    `event_value_trend` — the coefficients solve driver-side from this
    bounded artifact (tests/test_linalg.py pins the solve against numpy
    lstsq on raw data)."""
    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (
            (F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(1000)).cast(
                "bigint"
            )
            - F.lit(_X_BASE_S)
        ).alias("x1"),
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("x2"),
        F.round(F.col("value") * 1e6).cast("bigint").alias("y_micro"),
    )
    return R.grouped_normal_equations(
        pts, "event_type", ["x1", "x2"], "y_micro"
    ).orderBy("event_type")


GROUPED_NORMAL_EQ_SQL = R.normal_equations_oracle_sql(
    "events",
    "event_type",
    {
        "x1": f"(epoch_ms(ts) // 1000 - {_X_BASE_S})",
        "x2": "EXTRACT(hour FROM ts)",
    },
    "CAST(ROUND(value * 1e6) AS BIGINT)",
) + " ORDER BY event_type"


def embedding_covariance(spark, sf_dir):
    """Exact second-moment matrix of the embedding corpus: 2080 (i≤j)
    rows from per-batch numpy outer products — the PCA precursor whose
    shuffle is d²-sized regardless of corpus size."""
    emb = load(spark, sf_dir, "embeddings")
    return L.embedding_moments(emb, "embedding", EMB_DIM).orderBy("i", "j")


EMBEDDING_COVARIANCE_SQL = (
    L.moments_oracle_sql("embeddings", "embedding") + " ORDER BY i, j"
)


def embedding_rp_project(spark, sf_dir):
    """JL ±1 projection 64→16 on the integer grid — map-only,
    whole-stage-codegen higher-order functions; the cheap first pass that
    shrinks an embedding lake 4× before indexing."""
    emb = load(spark, sf_dir, "embeddings")
    return L.rp_project(emb, "embedding", EMB_DIM, RP_DIM).orderBy("vec_id")


EMBEDDING_RP_SQL = (
    L.rp_oracle_sql("embeddings", "embedding", EMB_DIM, RP_DIM)
    + " ORDER BY vec_id"
)


QUERIES = {
    "event_value_trend": Q(
        event_value_trend,
        EVENT_VALUE_TREND_SQL,
        "grouped OLS via normal-equation sufficient statistics",
    ),
    "grouped_normal_eq": Q(
        grouped_normal_eq,
        GROUPED_NORMAL_EQ_SQL,
        "multi-feature XᵀX/Xᵀy sufficient statistics per group",
    ),
    "embedding_covariance": Q(
        embedding_covariance,
        EMBEDDING_COVARIANCE_SQL,
        "distributed second-moment/covariance matrix (PCA precursor)",
    ),
    "embedding_rp_project": Q(
        embedding_rp_project,
        EMBEDDING_RP_SQL,
        "Johnson-Lindenstrauss ±1 projection on the integer grid",
    ),
}


def nb_train_counts(spark, sf_dir):
    """Multinomial Naive Bayes TRAINING as pure aggregation — the
    canonical fit-a-classifier-with-one-shuffle shape: class priors
    (docs per language, ppm) and the top-5 per-class token likelihoods
    with add-one smoothing on the ppm integer grid (likelihood =
    (count+1)·10⁶ DIV (class_tokens + vocab)). Everything is counting
    + one broadcast of the per-class totals; no float ever enters, so
    the trained parameters hash exactly. Scoring with these parameters
    is the log-free doc_lm_score / quality_classifier path."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    toks = docs.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    tok_counts = toks.groupBy("lang", "tok").agg(F.count("*").alias("n"))
    class_tot = tok_counts.groupBy("lang").agg(
        F.sum("n").alias("class_tokens"), F.count("*").alias("class_vocab")
    )
    vocab = toks.select("tok").distinct().agg(F.count("*").alias("v"))
    priors = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total_docs = docs.agg(F.count("*").alias("td"))
    j = (
        tok_counts.join(F.broadcast(class_tot), "lang")
        .crossJoin(F.broadcast(vocab))
        .join(F.broadcast(priors), "lang")
        .crossJoin(F.broadcast(total_docs))
    )
    lik_ppm = F.expr("((n + 1) * 1000000) DIV (class_tokens + v)")
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tok").asc())
    return (
        j.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "lang",
            F.expr("(n_docs * 1000000) DIV td").cast("long").alias("prior_ppm"),
            F.col("rnk").cast("long").alias("rnk"),
            "tok",
            lik_ppm.cast("long").alias("lik_ppm"),
        )
    )


NB_TRAIN_COUNTS_SQL = """
WITH toks AS (
  SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
),
tok_counts AS (
  SELECT lang, tok, COUNT(*) AS n FROM toks GROUP BY lang, tok
),
class_tot AS (
  SELECT lang, SUM(n) AS class_tokens FROM tok_counts GROUP BY lang
),
vocab AS (SELECT COUNT(DISTINCT tok) AS v FROM toks),
priors AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
td AS (SELECT COUNT(*) AS td FROM documents),
ranked AS (
  SELECT tc.lang, tc.tok, tc.n, ct.class_tokens, v.v, p.n_docs, td.td,
         ROW_NUMBER() OVER (PARTITION BY tc.lang ORDER BY tc.n DESC, tc.tok ASC) AS rnk
  FROM tok_counts tc
  JOIN class_tot ct USING (lang)
  CROSS JOIN vocab v
  JOIN priors p USING (lang)
  CROSS JOIN td
)
SELECT lang,
       CAST((n_docs * 1000000) // td AS BIGINT) AS prior_ppm,
       CAST(rnk AS BIGINT) AS rnk, tok,
       CAST(((n + 1) * 1000000) // (class_tokens + v) AS BIGINT) AS lik_ppm
FROM ranked WHERE rnk <= 5
"""

QUERIES["nb_train_counts"] = Q(
    nb_train_counts,
    NB_TRAIN_COUNTS_SQL,
    "Naive Bayes training by aggregation: priors + smoothed top-5 likelihoods (ppm)",
)


def auc_roc_exact(spark, sf_dir):
    """Exact ROC-AUC as the tie-corrected Mann-Whitney rank statistic —
    the canonical model-evaluation reduction: does `value` rank purchase
    events above the rest, per calendar day?

    AUC = (Σ_pos avg_rank − n_pos(n_pos+1)/2) / (n_pos·n_neg) needs one
    global sort per group in the naive form; here scores are pre-grouped
    (day, score_cents), so the window walks O(distinct scores) rows —
    bounded by the cent grid, not the corpus — and every quantity stays
    integral (avg ranks carried DOUBLED, so ties never leave the integer
    grid; AUC reported in ppm by integer division). One shuffle for the
    score histogram, one bounded per-day window, one per-day rollup:
    the shape survives 100 TB because rows after stage 1 are
    |days| × |distinct cents|."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    hist = (
        ev.select(
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            F.round(F.col("value") * 100).cast("bigint").alias("score_cents"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_pos"),
        )
        .groupBy("day", "score_cents")
        .agg(F.count("*").alias("n_at"), F.sum("is_pos").alias("pos_at"))
    )
    w = (
        Window.partitionBy("day")
        .orderBy("score_cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # doubled 1-based average rank of the tied block ending the cumulative
    # prefix: 2·cum_before + n_at + 1  (cum_before = cum − n_at)
    ranked = hist.withColumn("cum", F.sum("n_at").over(w)).withColumn(
        "dbl_rank", F.expr("2 * (cum - n_at) + n_at + 1")
    )
    per_day = ranked.groupBy("day").agg(
        F.sum("pos_at").cast("bigint").alias("n_pos"),
        F.sum(F.expr("n_at - pos_at")).cast("bigint").alias("n_neg"),
        F.sum(F.expr("pos_at * dbl_rank")).cast("bigint").alias("dbl_rank_sum"),
    )
    return (
        per_day.filter("n_pos > 0 AND n_neg > 0")
        .select(
            "day",
            "n_pos",
            "n_neg",
            F.expr("dbl_rank_sum - n_pos * (n_pos + 1)").alias("u2"),
            F.expr("(dbl_rank_sum - n_pos * (n_pos + 1)) * 1000000 DIV (2 * n_pos * n_neg)")
            .cast("bigint")
            .alias("auc_ppm"),
        )
        .orderBy("day")
    )


AUC_ROC_EXACT_SQL = """
WITH hist AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS score_cents,
         COUNT(*) AS n_at,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos_at
  FROM events GROUP BY 1, 2
),
ranked AS (
  SELECT day, n_at, pos_at,
         SUM(n_at) OVER (PARTITION BY day ORDER BY score_cents
                         ROWS UNBOUNDED PRECEDING) AS cum
  FROM hist
),
per_day AS (
  SELECT day,
         SUM(pos_at) AS n_pos,
         SUM(n_at - pos_at) AS n_neg,
         SUM(pos_at * (2 * (cum - n_at) + n_at + 1)) AS dbl_rank_sum
  FROM ranked GROUP BY day
)
SELECT day,
       CAST(n_pos AS BIGINT) AS n_pos,
       CAST(n_neg AS BIGINT) AS n_neg,
       CAST(dbl_rank_sum - n_pos * (n_pos + 1) AS BIGINT) AS u2,
       CAST((dbl_rank_sum - n_pos * (n_pos + 1)) * 1000000
            // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
FROM per_day
WHERE n_pos > 0 AND n_neg > 0
ORDER BY day
"""

QUERIES["auc_roc_exact"] = Q(
    auc_roc_exact,
    AUC_ROC_EXACT_SQL,
    "exact tie-corrected ROC-AUC (Mann-Whitney) per day on the ppm grid",
)


def calibration_bins(spark, sf_dir):
    """Reliability diagram for the same value→purchase 'model' the AUC
    gate evaluates: decile the score by value cents (fixed-width bins on
    the observed [0,100) dollar span, so bin edges are data-independent —
    a quantile binning would itself need a sort), then per bin emit
    support, observed positive rate (ppm), and mean score (cents). One
    map-side bin assignment + one 10-row aggregation: the evaluation
    costs a single partial-agg shuffle at any corpus size."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.least(
                F.lit(9).cast("bigint"),
                F.expr("CAST(ROUND(value * 100) AS BIGINT) DIV 1000"),
            ).alias("bin"),
            F.round(F.col("value") * 100).cast("bigint").alias("score_cents"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_pos"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum("is_pos").cast("bigint").alias("n_pos"),
            F.expr("SUM(is_pos) * 1000000 DIV COUNT(*)").cast("bigint").alias("pos_rate_ppm"),
            F.expr("SUM(score_cents) DIV COUNT(*)").cast("bigint").alias("mean_score_cents"),
        )
        .orderBy("bin")
    )


CALIBRATION_BINS_SQL = """
WITH scored AS (
  SELECT LEAST(9, CAST(ROUND(value * 100) AS BIGINT) // 1000) AS bin,
         CAST(ROUND(value * 100) AS BIGINT) AS score_cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos
  FROM events
)
SELECT bin,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(is_pos) AS BIGINT) AS n_pos,
       CAST(SUM(is_pos) * 1000000 // COUNT(*) AS BIGINT) AS pos_rate_ppm,
       CAST(SUM(score_cents) // COUNT(*) AS BIGINT) AS mean_score_cents
FROM scored GROUP BY bin ORDER BY bin
"""

QUERIES["calibration_bins"] = Q(
    calibration_bins,
    CALIBRATION_BINS_SQL,
    "fixed-width reliability bins: support, positive rate, mean score (ppm grid)",
)


def tree_split_histogram(spark, sf_dir):
    """Decision-tree split finding by the gradient-boosting histogram
    trick: the corpus reduces to a ≤100-bin (dollar, label) histogram in
    ONE partial-agg shuffle, candidate thresholds are the bin edges, and
    each threshold's Gini gain reads off the cumulative histogram — so
    split search costs O(bins), not O(rows·thresholds), at any corpus
    size (the XGBoost/LightGBM approx-split shape). Gain stays exact:
    gain ∝ (pos_l·n − pos·n_l)² / (n_l·(n−n_l)), cross-multiplied onto
    the ppm grid by integer division. Top-5 thresholds returned with
    their left-side counts; ties break on the threshold."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    hist = (
        ev.select(
            F.expr("CAST(ROUND(value * 100) AS BIGINT) DIV 100").alias("dollar"),
            F.when(F.col("event_type") == "purchase", F.lit(1))
            .otherwise(F.lit(0))
            .alias("is_pos"),
        )
        .groupBy("dollar")
        .agg(F.count("*").alias("cnt"), F.sum("is_pos").alias("pos"))
    )
    w = Window.orderBy("dollar").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy()
    cum = (
        hist.withColumn("n_l", F.sum("cnt").over(w))
        .withColumn("pos_l", F.sum("pos").over(w))
        .withColumn("n", F.sum("cnt").over(tot))
        .withColumn("pos", F.sum("pos").over(tot))
        .filter(F.col("n_l") < F.col("n"))  # rightmost bin splits nothing
    )
    scored = cum.select(
        F.col("dollar").alias("threshold_dollar"),
        F.col("n_l").cast("bigint").alias("n_left"),
        F.col("pos_l").cast("bigint").alias("pos_left"),
        # phi-squared split statistic in [0,1], ppm grid: d²/(n_l·n_r·pos·neg)
        # with d = pos_l·n − pos·n_l.  DECIMAL(38,0) carries the ~1e30
        # numerator exactly (int64 would overflow at sf0.1's d ~ 1e12).
        F.expr(
            "CAST(((CAST(pos_l AS DECIMAL(38,0)) * n - CAST(pos AS DECIMAL(38,0)) * n_l)"
            " * (CAST(pos_l AS DECIMAL(38,0)) * n - CAST(pos AS DECIMAL(38,0)) * n_l)"
            " * 1000000)"
            " DIV (CAST(n_l AS DECIMAL(38,0)) * (n - n_l) * pos * (n - pos))"
            " AS BIGINT)"
        ).alias("gain_ppm"),
    )
    rk = Window.orderBy(F.col("gain_ppm").desc(), F.col("threshold_dollar").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(rk).cast("int"))
        .filter(F.col("rnk") <= 5)
        .select("rnk", "threshold_dollar", "n_left", "pos_left", "gain_ppm")
        .orderBy("rnk")
    )


TREE_SPLIT_HISTOGRAM_SQL = """
WITH hist AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) // 100 AS dollar,
         COUNT(*) AS cnt,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS pos
  FROM events GROUP BY 1
),
cum AS (
  SELECT dollar,
         SUM(cnt) OVER (ORDER BY dollar ROWS UNBOUNDED PRECEDING) AS n_l,
         SUM(pos) OVER (ORDER BY dollar ROWS UNBOUNDED PRECEDING) AS pos_l,
         SUM(cnt) OVER () AS n,
         SUM(pos) OVER () AS pos
  FROM hist
),
scored AS (
  SELECT dollar AS threshold_dollar,
         CAST(n_l AS BIGINT) AS n_left,
         CAST(pos_l AS BIGINT) AS pos_left,
         CAST((pos_l * n - pos * n_l) * (pos_l * n - pos * n_l) * 1000000
              // (n_l * (n - n_l) * pos * (n - pos)) AS BIGINT) AS gain_ppm
  FROM cum WHERE n_l < n
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY gain_ppm DESC, threshold_dollar ASC) AS INT) AS rnk,
       threshold_dollar, n_left, pos_left, gain_ppm
FROM scored
QUALIFY rnk <= 5
ORDER BY rnk
"""

QUERIES["tree_split_histogram"] = Q(
    tree_split_histogram,
    TREE_SPLIT_HISTOGRAM_SQL,
    "histogram-trick decision-tree split search with exact integer Gini gain",
)


def decile_lift_table(spark, sf_dir):
    """Gains/lift table — the marketing-model companion of AUC and
    calibration: users rank by total spend (total order: cents desc,
    user_id asc, so NTILE is deterministic), and each decile reports its
    captured share of all purchase events plus the cumulative capture
    ppm — 'the top 10% of users hold X% of purchases'. Per-user rollup
    is one partial-agg shuffle; the decile pass windows over |users|
    rows partitioned by nothing but bounded output (10 rows) — the
    NTILE itself is the documented range-exchange shape shared with
    `value_equidepth_bins`."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("purchases"),
    )
    deciled = per_user.withColumn(
        "decile",
        F.ntile(10).over(
            Window.orderBy(F.col("cents").desc(), F.col("user_id").asc())
        ),
    )
    agg = deciled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("purchases").cast("bigint").alias("purchases"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tot = Window.partitionBy()
    return (
        agg.withColumn("cum_p", F.sum("purchases").over(w))
        .withColumn("all_p", F.sum("purchases").over(tot))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            "purchases",
            F.expr("cum_p * 1000000 DIV all_p").cast("bigint").alias("cum_capture_ppm"),
        )
        .orderBy("decile")
    )


DECILE_LIFT_TABLE_SQL = """
WITH per_user AS (
  SELECT user_id,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purchases
  FROM events GROUP BY user_id
),
deciled AS (
  SELECT *, NTILE(10) OVER (ORDER BY cents DESC, user_id ASC) AS decile
  FROM per_user
),
agg AS (
  SELECT decile, COUNT(*) AS n_users, SUM(purchases) AS purchases
  FROM deciled GROUP BY decile
)
SELECT CAST(decile AS INT) AS decile,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(purchases AS BIGINT) AS purchases,
       CAST(SUM(purchases) OVER (ORDER BY decile ROWS UNBOUNDED PRECEDING)
            * 1000000 // SUM(purchases) OVER () AS BIGINT) AS cum_capture_ppm
FROM agg ORDER BY decile
"""

QUERIES["decile_lift_table"] = Q(
    decile_lift_table,
    DECILE_LIFT_TABLE_SQL,
    "gains/lift table: deterministic spend deciles, cumulative purchase capture ppm",
)


def survival_hazard_table(spark, sf_dir):
    """Kaplan-Meier sufficient statistics — time-to-event analysis with
    right censoring: per user, 'birth' is the first observed day, the
    event is the first purchase on-or-after birth, and users without one
    censor at the calendar end. The duration histogram reduces the
    corpus to ≤|days| rows; the at-risk set n(t) = Σ_{s≥t}(d_s+c_s) is
    one REVERSE cumulative window over that bounded histogram (never a
    per-user range join); hazard_ppm = d·10⁶ DIV n stays integral. The
    float product Π(1−d/n) is left to the caller — the table IS the
    estimator's exact sufficient statistic."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    days = ev.select(
        "user_id",
        F.to_date(F.col("ts").cast("timestamp")).alias("day"),
        F.col("event_type"),
    )
    per_user = days.groupBy("user_id").agg(
        F.min("day").alias("birth"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("day"))).alias(
            "purchase_day"
        ),
    )
    end = days.agg(F.max("day").alias("end_day"))
    durs = per_user.crossJoin(F.broadcast(end)).select(
        F.when(
            F.col("purchase_day").isNotNull(),
            F.datediff("purchase_day", "birth"),
        )
        .otherwise(F.datediff("end_day", "birth"))
        .cast("bigint")
        .alias("t"),
        F.when(F.col("purchase_day").isNotNull(), 1).otherwise(0).alias("event"),
    )
    hist = durs.groupBy("t").agg(
        F.sum("event").alias("d"),
        F.sum(F.expr("1 - event")).alias("c"),
    )
    w_rev = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        hist.withColumn("n_risk", F.sum(F.col("d") + F.col("c")).over(w_rev))
        .select(
            "t",
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.col("d").cast("bigint").alias("d"),
            F.col("c").cast("bigint").alias("c"),
            F.expr("d * 1000000 DIV n_risk").cast("bigint").alias("hazard_ppm"),
        )
        .orderBy("t")
    )


SURVIVAL_HAZARD_TABLE_SQL = """
WITH days AS (
  SELECT user_id, CAST(ts AS DATE) AS day, event_type FROM events
),
per_user AS (
  SELECT user_id, MIN(day) AS birth,
         MIN(CASE WHEN event_type = 'purchase' THEN day END) AS purchase_day
  FROM days GROUP BY user_id
),
end_day AS (SELECT MAX(day) AS end_day FROM days),
durs AS (
  SELECT CASE WHEN purchase_day IS NOT NULL
              THEN date_diff('day', birth, purchase_day)
              ELSE date_diff('day', birth, e.end_day) END AS t,
         CASE WHEN purchase_day IS NOT NULL THEN 1 ELSE 0 END AS event
  FROM per_user CROSS JOIN end_day e
),
hist AS (
  SELECT t, SUM(event) AS d, SUM(1 - event) AS c FROM durs GROUP BY t
)
SELECT CAST(t AS BIGINT) AS t,
       CAST(SUM(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_risk,
       CAST(d AS BIGINT) AS d, CAST(c AS BIGINT) AS c,
       CAST(d * 1000000 // SUM(d + c) OVER (ORDER BY t DESC ROWS UNBOUNDED PRECEDING) AS BIGINT) AS hazard_ppm
FROM hist ORDER BY t
"""

QUERIES["survival_hazard_table"] = Q(
    survival_hazard_table,
    SURVIVAL_HAZARD_TABLE_SQL,
    "Kaplan-Meier risk-set table: reverse-cumulative at-risk counts, exact hazard ppm",
)


def ab_test_analysis(spark, sf_dir):
    """Experiment readout over a deterministic assignment: users split
    50/50 into control/treatment by the layout-invariant md5 coin (the
    engine's split primitive — df.sample is partition-layout-dependent,
    pinned in tests/test_api_surface_pins.py), and each arm reports
    users, purchasers, conversion ppm, and mean spend cents. The
    between-arm contrast (diff of conversion ppm) rides every row so
    the table is self-contained. One per-user rollup + one 2-row arm
    aggregation — experiment analysis at any scale is two partial-agg
    shuffles."""
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        ),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents"),
    )
    arms = (
        per_user.select(
            (
                F.conv(
                    F.substring(F.md5(F.col("user_id").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("arm"),
            "converted",
            "cents",
        )
        .groupBy("arm")
        .agg(
            F.count("*").cast("bigint").alias("n_users"),
            F.sum("converted").cast("bigint").alias("n_converted"),
            F.expr("SUM(converted) * 1000000 DIV COUNT(*)")
            .cast("bigint")
            .alias("conv_ppm"),
            F.expr("SUM(cents) DIV COUNT(*)").cast("bigint").alias("mean_cents"),
        )
    )
    both = arms.agg(
        F.max(F.when(F.col("arm") == 1, F.col("conv_ppm"))).alias("t_ppm"),
        F.max(F.when(F.col("arm") == 0, F.col("conv_ppm"))).alias("c_ppm"),
    )
    return (
        arms.crossJoin(F.broadcast(both))
        .select(
            F.col("arm").cast("bigint").alias("arm"),
            "n_users",
            "n_converted",
            "conv_ppm",
            "mean_cents",
            (F.col("t_ppm") - F.col("c_ppm")).cast("bigint").alias("uplift_ppm"),
        )
        .orderBy("arm")
    )


AB_TEST_ANALYSIS_SQL = """
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS converted,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY user_id
),
arms AS (
  SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) % 2 AS arm,
         COUNT(*) AS n_users,
         SUM(converted) AS n_converted,
         SUM(converted) * 1000000 // COUNT(*) AS conv_ppm,
         SUM(cents) // COUNT(*) AS mean_cents
  FROM per_user GROUP BY 1
),
contrast AS (
  SELECT MAX(CASE WHEN arm = 1 THEN conv_ppm END) AS t_ppm,
         MAX(CASE WHEN arm = 0 THEN conv_ppm END) AS c_ppm
  FROM arms
)
SELECT CAST(arm AS BIGINT) AS arm,
       CAST(n_users AS BIGINT) AS n_users,
       CAST(n_converted AS BIGINT) AS n_converted,
       CAST(conv_ppm AS BIGINT) AS conv_ppm,
       CAST(mean_cents AS BIGINT) AS mean_cents,
       CAST(t_ppm - c_ppm AS BIGINT) AS uplift_ppm
FROM arms CROSS JOIN contrast ORDER BY arm
"""

QUERIES["ab_test_analysis"] = Q(
    ab_test_analysis,
    AB_TEST_ANALYSIS_SQL,
    "A/B readout on the md5 split: conversion ppm per arm + uplift contrast",
)


_CM_TYPES = ["click", "error", "purchase", "signup", "view"]


def daily_type_comoments(spark, sf_dir):
    """Cross-series co-moments — the correlation-matrix precursor for
    the five daily revenue series (one per event type): the corpus
    pivots map-side into a (day × 5) grid by conditional aggregation
    (never a self-join on day), then ONE tiny aggregation carries every
    pairwise Σxy plus the marginals — 15 (i≤j) rows whose shuffle is
    series²-sized regardless of corpus size, the same partial-moments
    shape as `embedding_covariance`. All sums exact on the cent grid."""
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.select(
            F.to_date(F.col("ts").cast("timestamp")).alias("day"),
            "event_type",
            F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        )
        .groupBy("day")
        .agg(
            *[
                F.sum(
                    F.when(F.col("event_type") == t, F.col("cents")).otherwise(0)
                ).alias(f"x_{t}")
                for t in _CM_TYPES
            ]
        )
    )
    aggs = [F.count("*").cast("bigint").alias("n_days")]
    pairs = []
    for i, a in enumerate(_CM_TYPES):
        for b in _CM_TYPES[i:]:
            pairs.append((a, b))
            aggs.append(
                F.sum(F.expr(f"x_{a} * x_{b}")).cast("bigint").alias(f"sxy_{a}_{b}")
            )
    for t in _CM_TYPES:
        aggs.append(F.sum(f"x_{t}").cast("bigint").alias(f"sx_{t}"))
    wide = daily.agg(*aggs)
    rows = [
        wide.select(
            F.lit(a).alias("series_a"),
            F.lit(b).alias("series_b"),
            F.col("n_days"),
            F.col(f"sx_{a}").alias("sum_a"),
            F.col(f"sx_{b}").alias("sum_b"),
            F.col(f"sxy_{a}_{b}").alias("sum_ab"),
        )
        for a, b in pairs
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out.orderBy("series_a", "series_b")


def _comoments_oracle_sql() -> str:
    cols = ", ".join(
        f"SUM(CASE WHEN event_type = '{t}' THEN CAST(ROUND(value * 100) AS BIGINT) ELSE 0 END) AS x_{t}"
        for t in _CM_TYPES
    )
    selects = []
    for i, a in enumerate(_CM_TYPES):
        for b in _CM_TYPES[i:]:
            selects.append(
                f"SELECT '{a}' AS series_a, '{b}' AS series_b, "
                f"CAST(COUNT(*) AS BIGINT) AS n_days, "
                f"CAST(SUM(x_{a}) AS BIGINT) AS sum_a, "
                f"CAST(SUM(x_{b}) AS BIGINT) AS sum_b, "
                f"CAST(SUM(x_{a} * x_{b}) AS BIGINT) AS sum_ab FROM daily"
            )
    return (
        "WITH daily AS (\n  SELECT CAST(ts AS DATE) AS day, "
        + cols
        + "\n  FROM events GROUP BY 1\n)\n"
        + "\nUNION ALL\n".join(selects)
        + "\nORDER BY series_a, series_b"
    )


QUERIES["daily_type_comoments"] = Q(
    daily_type_comoments,
    _comoments_oracle_sql(),
    "pairwise co-moments of the five daily revenue series (correlation precursor)",
)
