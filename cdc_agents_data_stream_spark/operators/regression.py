"""Grouped model fitting via normal equations — train on the cluster,
never collect the data.

The canonical "fit a model on 100 TB" shape: sufficient statistics
(n, Σx, Σy, Σx², Σxy) are ONE partially-aggregated groupBy — shuffle rows
bounded by the number of groups, map-side combine does almost all the
work — and the closed-form OLS solution is derived per group from those
five numbers. Nothing is collected; at a billion rows per group the plan
is identical.

Cross-engine exactness: x and y enter on integer grids (caller scales —
epoch seconds / micro-units), sums accumulate in DECIMAL(38,0) (order-free,
unlike float sums), and the slope/intercept are each ONE decimal→double
cast per term followed by IEEE double division — deterministic on both
engines. The reference has no model fitting at all (SURVEY §2 ends at
aggregation); this is lake-scale surface the prompt's training-data
pipeline needs (e.g. drift trends per source / per event type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_D = "decimal(38,0)"


def grouped_ols(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_scale: int = 9,
) -> DataFrame:
    """Per-group simple linear regression y ≈ intercept + slope·x.

    ``x_col`` and ``y_col`` must already be integer-grid columns (BIGINT).
    Returns (group, n_pts, slope, intercept, slope_num, slope_den) where
    slope_num/slope_den are the exact integer numerator/denominator
    (DOUBLE-cast) — the hard signal the float slope derives from.
    Degenerate groups (all x equal → zero denominator) yield null
    slope/intercept rather than a division error.
    """
    x = F.col(x_col).cast(_D)
    y = F.col(y_col).cast(_D)
    stats = df.groupBy(group_col).agg(
        F.count("*").cast(_D).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    derived = stats.select(
        F.col(group_col),
        F.col("n").cast("bigint").alias("n_pts"),
        num.cast("double").alias("slope_num"),
        den.cast("double").alias("slope_den"),
        inum.cast("double").alias("icept_num"),
    )
    zero = F.col("slope_den") == F.lit(0.0)
    return derived.select(
        group_col,
        "n_pts",
        "slope_num",
        "slope_den",
        F.when(zero, F.lit(None)).otherwise(
            F.round(F.col("slope_num") / F.col("slope_den"), round_scale)
        ).alias("slope"),
        F.when(zero, F.lit(None)).otherwise(
            F.round(F.col("icept_num") / F.col("slope_den"), round_scale)
        ).alias("intercept"),
    )


def grouped_normal_equations(
    df: DataFrame,
    group_col: str,
    x_cols: list[str],
    y_col: str,
) -> DataFrame:
    """Per-group multi-feature sufficient statistics for OLS/ridge: the
    upper triangle of XᵀX (with an implicit intercept column of ones) and
    Xᵀy, all as exact DECIMAL(38,0) sums cast to double. One partially
    aggregated groupBy — the d(d+3)/2 statistics per group are the ONLY
    thing that crosses the wire; the solve is an O(d³) driver/test-side
    step on a bounded artifact. Columns: n, s_<xi>, s_<xi>_<xj> (i≤j),
    sy, s_<xi>_y.
    """
    aggs = [F.count("*").cast(_D).cast("double").alias("n")]
    for i, xi in enumerate(x_cols):
        aggs.append(F.sum(F.col(xi).cast(_D)).cast("double").alias(f"s_{xi}"))
    for i, xi in enumerate(x_cols):
        for xj in x_cols[i:]:
            aggs.append(
                F.sum(F.col(xi).cast(_D) * F.col(xj).cast(_D))
                .cast("double")
                .alias(f"s_{xi}_{xj}")
            )
    aggs.append(F.sum(F.col(y_col).cast(_D)).cast("double").alias("sy"))
    for xi in x_cols:
        aggs.append(
            F.sum(F.col(xi).cast(_D) * F.col(y_col).cast(_D))
            .cast("double")
            .alias(f"s_{xi}_y")
        )
    return df.groupBy(group_col).agg(*aggs)


def normal_equations_oracle_sql(
    table_expr: str,
    group_col: str,
    x_exprs: dict,
    y_expr: str,
) -> str:
    """DuckDB oracle for :func:`grouped_normal_equations`; ``x_exprs``
    maps column name → SQL expression."""
    names = list(x_exprs)
    sel = [
        f"CAST({e} AS DECIMAL(38,0)) AS {n}" for n, e in x_exprs.items()
    ] + [f"CAST({y_expr} AS DECIMAL(38,0)) AS yv"]
    aggs = ["CAST(CAST(COUNT(*) AS DECIMAL(38,0)) AS DOUBLE) AS n"]
    for xi in names:
        aggs.append(f"CAST(SUM({xi}) AS DOUBLE) AS s_{xi}")
    for i, xi in enumerate(names):
        for xj in names[i:]:
            aggs.append(f"CAST(SUM({xi}*{xj}) AS DOUBLE) AS s_{xi}_{xj}")
    aggs.append("CAST(SUM(yv) AS DOUBLE) AS sy")
    for xi in names:
        aggs.append(f"CAST(SUM({xi}*yv) AS DOUBLE) AS s_{xi}_y")
    agg_sql = ",\n       ".join(aggs)
    return f"""
WITH pts AS (
  SELECT {group_col} AS g, {", ".join(sel)}
  FROM {table_expr}
)
SELECT g AS {group_col},
       {agg_sql}
FROM pts GROUP BY g
"""


def solve_normal_equations(row: dict, x_cols: list[str]) -> list:
    """Driver-side closed-form solve for one group's coefficients
    [intercept, b_1..b_d] from a :func:`grouped_normal_equations` row —
    an O(d³) numpy solve on the bounded sufficient-statistic artifact."""
    import numpy as np

    d = len(x_cols)
    A = np.zeros((d + 1, d + 1))
    b = np.zeros(d + 1)
    A[0, 0] = row["n"]
    b[0] = row["sy"]
    for i, xi in enumerate(x_cols):
        A[0, i + 1] = A[i + 1, 0] = row[f"s_{xi}"]
        b[i + 1] = row[f"s_{xi}_y"]
        for j in range(i, d):
            xj = x_cols[j]
            A[i + 1, j + 1] = A[j + 1, i + 1] = row[f"s_{xi}_{xj}"]
    return np.linalg.solve(A, b).tolist()


def ols_oracle_sql(
    table_expr: str,
    group_col: str,
    x_expr: str,
    y_expr: str,
    round_scale: int = 9,
) -> str:
    """DuckDB oracle for :func:`grouped_ols` — same decimal sufficient
    statistics, same one-cast-then-divide derivation."""
    return f"""
WITH pts AS (
  SELECT {group_col} AS g,
         CAST({x_expr} AS DECIMAL(38,0)) AS x,
         CAST({y_expr} AS DECIMAL(38,0)) AS y
  FROM {table_expr}
),
stats AS (
  SELECT g, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx, SUM(x*y) AS sxy
  FROM pts GROUP BY g
),
d AS (
  SELECT g, CAST(n AS BIGINT) AS n_pts,
         CAST(n*sxy - sx*sy AS DOUBLE) AS slope_num,
         CAST(n*sxx - sx*sx AS DOUBLE) AS slope_den,
         CAST(sy*sxx - sx*sxy AS DOUBLE) AS icept_num
  FROM stats
)
SELECT g AS {group_col}, n_pts, slope_num, slope_den,
       CASE WHEN slope_den = 0 THEN NULL
            ELSE ROUND(slope_num / slope_den, {round_scale}) END AS slope,
       CASE WHEN slope_den = 0 THEN NULL
            ELSE ROUND(icept_num / slope_den, {round_scale}) END AS intercept
FROM d
"""
