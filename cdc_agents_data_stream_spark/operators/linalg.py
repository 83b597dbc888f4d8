"""Distributed linear algebra over embedding columns.

Two lake-scale building blocks the reference lacks entirely (its surface
stops at scalar aggregation — SURVEY §2) but a 100 TB training-data
pipeline needs:

- **Second-moment / covariance matrix** (`embedding_moments`): the PCA /
  whitening / dataset-cartography precursor. Shape: per-Arrow-batch
  partial outer products computed by numpy inside ``mapInPandas`` (the
  treeAggregate shape — each task emits d(d+1)/2 partial rows, i.e. a few
  KB regardless of row count), then ONE tiny grouped sum. The data never
  shuffles; only d²-sized partials do. At 1000 executors the reduction
  is the same 2080-row aggregation.
- **Johnson-Lindenstrauss random projection** (`rp_project`): dimension
  reduction with a deterministic ±1 sign matrix (md5-derived, shared with
  the oracle as literals). Map-only, JVM-side higher-order functions —
  no Python, no shuffle; the classic cheap first stage before ANN at
  scale (project 100 TB once, then index the 4× smaller vectors).

Cross-engine exactness: components enter on the 1e6 integer grid
(JVM ``round`` half-up, the engine's established convention —
`similarity_queries.py` uses the same grid), products/sums stay integer
(int64 within a batch — |v|≤~2e6 ⇒ |v·v|≤4e12, ×10k batch rows ≈ 4e16 ≪
2^63 — DECIMAL(38,0) across batches), and floats are derived from the
exact integers by one shared division chain.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRID = 1_000_000  # component micro-grid, matches similarity_queries
_D = "decimal(38,0)"


def _micro(vec_col: str):
    """array<bigint> micro-grid view of a float-array column (JVM-side)."""
    return F.expr(
        f"transform({vec_col}, v -> CAST(round(CAST(v AS DOUBLE) * {GRID}) AS BIGINT))"
    )


# ---------------------------------------------------------------------------
# second moments / covariance
# ---------------------------------------------------------------------------

def embedding_moments(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Exact second-moment sums over an embedding column.

    Returns one row per (i, j), i ≤ j: ``n_vecs``, ``sum_prod`` (Σ vᵢ·vⱼ on
    the micro grid), ``sum_i``, ``sum_j`` (first moments), and the derived
    ``cov`` in original units (ROUND(…, 12) of the exact rational).
    """
    micro = df.select(_micro(vec_col).alias("m"))

    iu, ju = [], []
    for i in range(dim):
        for j in range(i, dim):
            iu.append(i)
            ju.append(j)

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            if pdf.empty:
                continue
            V = np.stack(pdf["m"].to_numpy()).astype("int64")  # (n, dim)
            S = V.T @ V  # int64 exact within a batch (see module doc)
            cs = V.sum(axis=0)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "i": iu,
                    "j": ju,
                    "spp": [int(S[a, b]) for a, b in zip(iu, ju)],
                    "si": [int(cs[a]) for a in iu],
                    "sj": [int(cs[b]) for b in ju],
                    "pn": n,
                }
            )

    part = micro.mapInPandas(
        partials, "i int, j int, spp long, si long, sj long, pn long"
    )
    tot = part.groupBy("i", "j").agg(
        F.sum(F.col("pn").cast(_D)).alias("n"),
        F.sum(F.col("spp").cast(_D)).alias("spp"),
        F.sum(F.col("si").cast(_D)).alias("si"),
        F.sum(F.col("sj").cast(_D)).alias("sj"),
    )
    num = F.col("n") * F.col("spp") - F.col("si") * F.col("sj")
    nn = F.col("n") * F.col("n")
    return tot.select(
        "i",
        "j",
        F.col("n").cast("bigint").alias("n_vecs"),
        F.col("spp").cast("double").alias("sum_prod"),
        F.col("si").cast("double").alias("sum_i"),
        F.col("sj").cast("double").alias("sum_j"),
        F.round(
            num.cast("double") / nn.cast("double") / F.lit(float(GRID) * GRID), 12
        ).alias("cov"),
    )


def moments_oracle_sql(table: str, vec_col: str) -> str:
    """DuckDB oracle for :func:`embedding_moments` — the naive quadratic
    self-join form (fine at oracle scale; the engine's partial-outer-product
    form is the one that scales)."""
    return f"""
WITH comp AS (
  SELECT vec_id,
         generate_subscripts({vec_col}, 1) - 1 AS i,
         CAST(ROUND(CAST(unnest({vec_col}) AS DOUBLE) * {GRID}) AS BIGINT) AS v
  FROM {table}
),
pairs AS (
  SELECT a.i AS i, b.i AS j,
         CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
         SUM(CAST(a.v AS DECIMAL(38,0)) * b.v) AS spp,
         SUM(CAST(a.v AS DECIMAL(38,0))) AS si,
         SUM(CAST(b.v AS DECIMAL(38,0))) AS sj
  FROM comp a JOIN comp b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT i, j,
       CAST(n AS BIGINT) AS n_vecs,
       CAST(spp AS DOUBLE) AS sum_prod,
       CAST(si AS DOUBLE) AS sum_i,
       CAST(sj AS DOUBLE) AS sum_j,
       ROUND(CAST(n*spp - si*sj AS DOUBLE) / CAST(n*n AS DOUBLE)
             / {float(GRID) * GRID}, 12) AS cov
FROM pairs
"""


def covariance_matrix(moments_rows: list) -> "object":
    """Driver-side: assemble the dense symmetric covariance matrix from
    collected :func:`embedding_moments` rows (a bounded d² artifact — this
    is the ONLY collect, and it is d²-sized, not data-sized)."""
    import numpy as np

    dim = max(r["j"] for r in moments_rows) + 1
    C = np.zeros((dim, dim))
    for r in moments_rows:
        C[r["i"], r["j"]] = C[r["j"], r["i"]] = r["cov"]
    return C


def pca_topk(moments_rows: list, k: int) -> tuple:
    """Driver-side PCA from the distributed moments: (eigenvalues desc,
    eigenvectors column-stacked). The data-sized work already happened on
    the cluster; this is an O(d³) numpy eigh on a 64×64 matrix."""
    import numpy as np

    C = covariance_matrix(moments_rows)
    w, v = np.linalg.eigh(C)
    order = np.argsort(w)[::-1][:k]
    return w[order], v[:, order]


# ---------------------------------------------------------------------------
# Johnson-Lindenstrauss ±1 random projection
# ---------------------------------------------------------------------------

def rp_signs(in_dim: int, out_dim: int, seed: str = "rp") -> list:
    """Deterministic ±1 sign matrix: sign[i][k] from md5 parity. Shared
    constant between engine and oracle (like HLL_ALPHA) — both sides embed
    the same literals."""
    signs = []
    for i in range(in_dim):
        row = []
        for k in range(out_dim):
            h = hashlib.md5(f"{seed}:{i}:{k}".encode()).hexdigest()
            row.append(1 if int(h[0], 16) % 2 == 0 else -1)
        signs.append(row)
    return signs


def rp_project(
    df: DataFrame,
    vec_col: str,
    in_dim: int,
    out_dim: int,
    id_col: str = "vec_id",
    seed: str = "rp",
) -> DataFrame:
    """Project ``vec_col`` to ``out_dim`` ±1-sign components — exact int64
    per output (|p| ≤ in_dim·GRID·max|v|), map-only, whole-stage codegen
    (zip_with + aggregate higher-order functions, no Python)."""
    signs = rp_signs(in_dim, out_dim, seed)
    m = _micro(vec_col)
    cols = [F.col(id_col)]
    for k in range(out_dim):
        arr = ", ".join(str(signs[i][k]) + "L" for i in range(in_dim))
        cols.append(
            F.expr(
                f"aggregate(zip_with("
                f"transform({vec_col}, v -> CAST(round(CAST(v AS DOUBLE) * {GRID}) AS BIGINT)),"
                f" array({arr}), (x, s) -> x * s), 0L, (a, x) -> a + x)"
            ).alias(f"p{k}")
        )
    _ = m  # micro view inlined per-column above to stay in codegen
    return df.select(*cols)


def rp_oracle_sql(
    table: str, vec_col: str, in_dim: int, out_dim: int,
    id_col: str = "vec_id", seed: str = "rp",
) -> str:
    """DuckDB oracle for :func:`rp_project`: same literal sign matrix,
    list_dot_product on the micro grid (values ≪ 2^53, so the double dot
    is exact), cast back to BIGINT."""
    signs = rp_signs(in_dim, out_dim, seed)
    proj_cols = []
    for k in range(out_dim):
        arr = ", ".join(str(signs[i][k]) for i in range(in_dim))
        proj_cols.append(
            f"CAST(list_dot_product(m, [{arr}]) AS BIGINT) AS p{k}"
        )
    proj = ",\n       ".join(proj_cols)
    return f"""
WITH micro AS (
  SELECT {id_col},
         list_transform({vec_col},
                        v -> CAST(ROUND(CAST(v AS DOUBLE) * {GRID}) AS BIGINT)) AS m
  FROM {table}
)
SELECT {id_col},
       {proj}
FROM micro
"""
