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
