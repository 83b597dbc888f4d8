"""Declared similarity-search queries over ``embeddings`` with DuckDB
oracles replicating the exact same algorithm (same plane literals, same
cosine formula ``dot / (norm_a * norm_b)``)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import similarity as S
from .base import Q, load


def _sql_list(vals) -> str:
    return "[" + ", ".join(repr(float(v)) for v in vals) + "]"


_BUCKET_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(v, {_sql_list(p)}) >= 0 THEN {1 << j} ELSE 0 END)"
    for j, p in enumerate(S.PLANES)
)

_BASE_CTE = """
base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS norm
  FROM embeddings
)
"""


def ann_cosine_topk(spark, sf_dir):
    return S.cosine_topk(load(spark, sf_dir, "embeddings"), query_ids_below=5, k=10)


ANN_COSINE_TOPK_SQL = f"""
WITH {_BASE_CTE},
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM base WHERE vec_id < 5),
sims AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) AS sim
  FROM base b CROSS JOIN q WHERE b.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank, ROUND(sim, 6) AS sim_r FROM ranked WHERE rank <= 10
"""


def ann_lsh_bucketed(spark, sf_dir):
    return S.lsh_bucketed_topk(load(spark, sf_dir, "embeddings"), query_ids_below=5, k=5)


ANN_LSH_BUCKETED_SQL = f"""
WITH {_BASE_CTE},
bucketed AS (SELECT vec_id, v, norm, ({_BUCKET_SQL}) AS bucket FROM base),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket AS qbucket
      FROM bucketed WHERE vec_id < 5),
sims AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) AS sim
  FROM bucketed b JOIN q ON b.bucket = q.qbucket AND b.vec_id != q.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank, ROUND(sim, 6) AS sim_r FROM ranked WHERE rank <= 5
"""


def embedding_neardup(spark, sf_dir):
    return S.embedding_neardup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.45)


def _band_sig_sql(band: int) -> str:
    size = S.N_PLANES // S.N_BANDS
    return " + ".join(
        f"(CASE WHEN list_dot_product(v, {_sql_list(S.PLANES[j])}) >= 0 THEN {1 << (j % size)} ELSE 0 END)"
        for j in range(band * size, (band + 1) * size)
    )


_BAND_COLS = ", ".join(f"({_band_sig_sql(b)}) AS b{b}" for b in range(S.N_BANDS))
_BAND_MATCH = " OR ".join(f"a.b{b} = b.b{b}" for b in range(S.N_BANDS))

EMBEDDING_NEARDUP_SQL = f"""
WITH {_BASE_CTE},
banded AS (
  SELECT vec_id, v, norm, {_BAND_COLS}
  FROM base
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       ROUND(list_dot_product(a.v, b.v) / (a.norm * b.norm), 6) AS sim_r
FROM banded a JOIN banded b
  ON a.vec_id < b.vec_id AND ({_BAND_MATCH})
WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.45
"""


QUERIES = {
    "ann_cosine_topk": Q(ann_cosine_topk, ANN_COSINE_TOPK_SQL, "brute-force cosine top-k"),
    "ann_lsh_bucketed": Q(ann_lsh_bucketed, ANN_LSH_BUCKETED_SQL, "hyperplane-LSH bucketed top-k"),
    "embedding_neardup": Q(embedding_neardup, EMBEDDING_NEARDUP_SQL, "cosine near-dup pairs"),
}


def ann_ivf_probe(spark, sf_dir):
    return S.ivf_topk(load(spark, sf_dir, "embeddings"), query_ids_below=5, k=5, nprobe=2)


ANN_IVF_PROBE_SQL = f"""
WITH {_BASE_CTE},
cents AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
assigned AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM assigned WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
    SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cvec) / (q.qnorm * c.cnorm) DESC,
                      c.centroid_id ASC) AS probe_rank
    FROM q CROSS JOIN cents c
  ) WHERE probe_rank <= 2
),
sims AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) AS sim
  FROM assigned a JOIN probes p ON a.cluster = p.cluster AND a.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank, ROUND(sim, 6) AS sim_r FROM ranked WHERE rank <= 5
"""

QUERIES["ann_ivf_probe"] = Q(ann_ivf_probe, ANN_IVF_PROBE_SQL, "IVF probe-rerank ANN")


TRAIN_SAMPLE_MOD = 4  # Lloyd iterations train on vec_id % 4 == 0 — the
# 100 TB shape: quantizer training cost scales with the sample, the final
# corpus assignment stays the single linear pass (operators/similarity.py
# ::kmeans_centroids). Deterministic, so the oracle replays it exactly.


def ann_ivf_kmeans(spark, sf_dir):
    """IVF with a TRAINED coarse quantizer: 2 spherical k-means Lloyd
    iterations (deterministic init, 6-decimal-rounded means) over the
    deterministic 1-in-4 training sample before the probe-rerank. The
    oracle reproduces the training loop exactly."""
    return S.ivf_topk(
        load(spark, sf_dir, "embeddings"),
        query_ids_below=5,
        k=5,
        nprobe=2,
        train_iters=2,
        train_sample_mod=TRAIN_SAMPLE_MOD,
    )


def _kmeans_iter_sql(k: int, dim: int = 64, sample_mod: int = 1) -> str:
    """One Lloyd iteration: assignment under cents{k-1} -> cents{k}."""
    train_pred = f"WHERE b.vec_id % {sample_mod} = 0" if sample_mod > 1 else ""
    return f"""
a{k} AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents{k - 1} c {train_pred}
  ) WHERE rn = 1
),
m{k} AS (
  SELECT cluster, g.i AS pos, ROUND(AVG(v[g.i + 1]), 6) AS mval
  FROM a{k}, UNNEST(range(0, {dim})) AS g(i)
  GROUP BY cluster, g.i
),
cents{k} AS (
  SELECT centroid_id, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnorm FROM (
    SELECT cluster AS centroid_id, list(mval ORDER BY pos) AS cvec
    FROM m{k} GROUP BY cluster
  )
)"""


ANN_IVF_KMEANS_SQL = f"""
WITH {_BASE_CTE},
cents0 AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
{_kmeans_iter_sql(1, sample_mod=TRAIN_SAMPLE_MOD)},
{_kmeans_iter_sql(2, sample_mod=TRAIN_SAMPLE_MOD)},
assigned AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents2 c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM assigned WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
    SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cvec) / (q.qnorm * c.cnorm) DESC,
                      c.centroid_id ASC) AS probe_rank
    FROM q CROSS JOIN cents2 c
  ) WHERE probe_rank <= 2
),
sims AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) AS sim
  FROM assigned a JOIN probes p ON a.cluster = p.cluster AND a.vec_id != p.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM sims
)
SELECT query_id, neighbor_id, rank, ROUND(sim, 6) AS sim_r FROM ranked WHERE rank <= 5
"""

QUERIES["ann_ivf_kmeans"] = Q(
    ann_ivf_kmeans, ANN_IVF_KMEANS_SQL, "IVF ANN with trained k-means quantizer"
)


def ann_pq_adc(spark, sf_dir):
    """PQ/ADC scan (operators/similarity.py::pq_adc_topk): corpus encoded
    to 4 subspace codes against a deterministic-sample codebook, queries
    scored by broadcast distance-table lookups + exact integer sums. The
    micro-integer distance grid (1e-6 units, BIGINT) is what makes the
    approximate distances cross-engine comparable."""
    return S.pq_adc_topk(load(spark, sf_dir, "embeddings"), query_ids_below=5, k=10)


_PQ_SUB_LEN = S._DIM // S.PQ_M
_PQ_SLICES = ", ".join(
    f"({s}, v[{s * _PQ_SUB_LEN + 1}:{(s + 1) * _PQ_SUB_LEN}])" for s in range(S.PQ_M)
)

ANN_PQ_ADC_SQL = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), sub AS (
  SELECT vec_id, t.s, t.sv
  FROM base, (VALUES {", ".join(f"({s})" for s in range(S.PQ_M))}) AS m(s),
  LATERAL (SELECT m.s AS s,
                  v[m.s * {_PQ_SUB_LEN} + 1 : (m.s + 1) * {_PQ_SUB_LEN}] AS sv) AS t
), codes AS (
  SELECT vec_id AS code_id, s, sv AS cv FROM sub
  WHERE vec_id % {S.PQ_CODE_MOD} = 0 AND vec_id < {S.PQ_CODE_MOD * S.PQ_MAX_CODES}
), assigned AS (
  SELECT vec_id, s, code_id AS code FROM (
    SELECT a.vec_id, a.s, c.code_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY CAST(ROUND((list_dot_product(a.sv, a.sv)
                      - 2 * list_dot_product(a.sv, c.cv)
                      + list_dot_product(c.cv, c.cv)) * 1e6) AS BIGINT),
                      c.code_id) AS rn
    FROM sub a JOIN codes c USING (s)
  ) WHERE rn = 1
), dtable AS (
  SELECT q.vec_id AS query_id, c.s, c.code_id AS code,
         CAST(ROUND((list_dot_product(q.sv, q.sv)
              - 2 * list_dot_product(q.sv, c.cv)
              + list_dot_product(c.cv, c.cv)) * 1e6) AS BIGINT) AS dt
  FROM sub q JOIN codes c USING (s)
  WHERE q.vec_id < 5
), approx AS (
  SELECT d.query_id, a.vec_id AS neighbor_id, CAST(SUM(d.dt) AS BIGINT) AS approx_d2
  FROM assigned a JOIN dtable d ON d.s = a.s AND d.code = a.code
  WHERE a.vec_id <> d.query_id
  GROUP BY d.query_id, a.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, approx_d2 FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rank
  FROM approx
) WHERE rank <= 10
"""

QUERIES["ann_pq_adc"] = Q(ann_pq_adc, ANN_PQ_ADC_SQL, "PQ-encoded ADC top-k scan")


def ann_pq_trained(spark, sf_dir):
    """PQ/ADC with TRAINED codebooks: one per-subspace k-means Lloyd
    iteration (operators/similarity.py::pq_train_codebooks — deterministic
    init, integer-grid assignment, 6-decimal-rounded means) before the
    encode + ADC scan. The oracle reproduces training exactly."""
    return S.pq_adc_topk(
        load(spark, sf_dir, "embeddings"), query_ids_below=5, k=10, train_iters=1
    )


_PQ_D2_INT = (
    "CAST(ROUND((list_dot_product({a}, {a}) - 2 * list_dot_product({a}, {b}) "
    "+ list_dot_product({b}, {b})) * 1e6) AS BIGINT)"
)

ANN_PQ_TRAINED_SQL = f"""
WITH base AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
), sub AS (
  SELECT vec_id, t.s, t.sv
  FROM base, (VALUES {", ".join(f"({s})" for s in range(S.PQ_M))}) AS m(s),
  LATERAL (SELECT m.s AS s,
                  v[m.s * {_PQ_SUB_LEN} + 1 : (m.s + 1) * {_PQ_SUB_LEN}] AS sv) AS t
), codes0 AS (
  SELECT vec_id AS code_id, s, sv AS cv FROM sub
  WHERE vec_id % {S.PQ_CODE_MOD} = 0 AND vec_id < {S.PQ_CODE_MOD * S.PQ_MAX_CODES}
), pa1 AS (
  SELECT vec_id, s, code_id AS code, sv FROM (
    SELECT a.vec_id, a.s, c.code_id, a.sv,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY {_PQ_D2_INT.format(a="a.sv", b="c.cv")}, c.code_id) AS rn
    FROM sub a JOIN codes0 c USING (s)
  ) WHERE rn = 1
), pm1 AS (
  SELECT s, code, g.i AS pos, ROUND(AVG(sv[g.i + 1]), 6) AS mval
  FROM pa1, UNNEST(range(0, {_PQ_SUB_LEN})) AS g(i)
  GROUP BY s, code, g.i
), codes AS (
  SELECT code AS code_id, s, list(mval ORDER BY pos) AS cv
  FROM pm1 GROUP BY s, code
), assigned AS (
  SELECT vec_id, s, code_id AS code FROM (
    SELECT a.vec_id, a.s, c.code_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY {_PQ_D2_INT.format(a="a.sv", b="c.cv")}, c.code_id) AS rn
    FROM sub a JOIN codes c USING (s)
  ) WHERE rn = 1
), dtable AS (
  SELECT q.vec_id AS query_id, c.s, c.code_id AS code,
         {_PQ_D2_INT.format(a="q.sv", b="c.cv")} AS dt
  FROM sub q JOIN codes c USING (s)
  WHERE q.vec_id < 5
), approx AS (
  SELECT d.query_id, a.vec_id AS neighbor_id, CAST(SUM(d.dt) AS BIGINT) AS approx_d2
  FROM assigned a JOIN dtable d ON d.s = a.s AND d.code = a.code
  WHERE a.vec_id <> d.query_id
  GROUP BY d.query_id, a.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, approx_d2 FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rank
  FROM approx
) WHERE rank <= 10
"""

QUERIES["ann_pq_trained"] = Q(
    ann_pq_trained, ANN_PQ_TRAINED_SQL, "PQ/ADC scan with k-means-trained codebooks"
)


def ann_ivf_append(spark, sf_dir):
    """Incremental IVF maintenance (operators/similarity.py::ivf_append):
    quantizer trained (1 Lloyd iteration) on the even-id HISTORY half and
    frozen; odd-id vectors are APPENDED by assignment only. The oracle
    trains on the same history and assigns everything — proving the
    append path equals a from-scratch assignment under the same frozen
    quantizer."""
    emb = load(spark, sf_dir, "embeddings")
    hist = emb.filter(F.col("vec_id") % 2 == 0)
    new = emb.filter(F.col("vec_id") % 2 == 1)
    _, assigned = S.ivf_append(hist, new, train_iters=1)
    return assigned.select(
        "vec_id", F.col("cluster").cast("long").alias("cluster"),
        F.col("is_new").cast("long").alias("is_new"),
    )


ANN_IVF_APPEND_SQL = f"""
WITH {_BASE_CTE},
hist AS (SELECT * FROM base WHERE vec_id % 2 = 0),
cents0 AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM hist
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
a1 AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM hist b CROSS JOIN cents0 c
  ) WHERE rn = 1
),
m1 AS (
  SELECT cluster, g.i AS pos, ROUND(AVG(v[g.i + 1]), 6) AS mval
  FROM a1, UNNEST(range(0, 64)) AS g(i)
  GROUP BY cluster, g.i
),
cents1 AS (
  SELECT centroid_id, cvec, sqrt(list_dot_product(cvec, cvec)) AS cnorm FROM (
    SELECT cluster AS centroid_id, list(mval ORDER BY pos) AS cvec
    FROM m1 GROUP BY cluster
  )
)
SELECT vec_id, CAST(centroid_id AS BIGINT) AS cluster,
       CAST(vec_id % 2 AS BIGINT) AS is_new
FROM (
  SELECT b.vec_id, c.centroid_id,
         ROW_NUMBER() OVER (
           PARTITION BY b.vec_id
           ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                    c.centroid_id ASC) AS rn
  FROM base b CROSS JOIN cents1 c
) WHERE rn = 1
"""

QUERIES["ann_ivf_append"] = Q(
    ann_ivf_append, ANN_IVF_APPEND_SQL, "incremental IVF index append (frozen quantizer)"
)


def embedding_group_centroids(spark, sf_dir):
    """Per-label mean embedding (operators/similarity.py::group_centroids):
    exact 6-decimal-rounded component means — the oracle reproduces the
    centroid array bit-for-bit, serialized as a CSV string for portable
    hashing."""
    out = S.group_centroids(load(spark, sf_dir, "embeddings"), group_col="label")
    # serialize components as 1e-6-unit integers: double→string rendering
    # differs across engines (scientific vs decimal for small values), but
    # integers render identically everywhere
    return out.select(
        F.col("label").cast("long").alias("label"),
        "n_vectors",
        F.concat_ws(
            ",",
            F.transform(
                "centroid", lambda x: F.round(x * 1e6).cast("long").cast("string")
            ),
        ).alias("centroid_csv"),
        "centroid_norm",
    )


EMBEDDING_GROUP_CENTROIDS_SQL = """
WITH per_pos AS (
  SELECT label, g.i AS pos, AVG(v[g.i + 1]) AS m, COUNT(*) AS n
  FROM (SELECT label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       UNNEST(range(0, 64)) AS g(i)
  GROUP BY label, g.i
),
cent AS (
  SELECT label, CAST(MAX(n) AS BIGINT) AS n_vectors,
         list(ROUND(m, 6) ORDER BY pos) AS c
  FROM per_pos GROUP BY label
)
SELECT CAST(label AS BIGINT) AS label, n_vectors,
       array_to_string(list_transform(c, x -> CAST(CAST(ROUND(x * 1e6) AS BIGINT) AS VARCHAR)), ',') AS centroid_csv,
       ROUND(sqrt(list_dot_product(c, c)), 6) AS centroid_norm
FROM cent
"""

QUERIES["embedding_group_centroids"] = Q(
    embedding_group_centroids,
    EMBEDDING_GROUP_CENTROIDS_SQL,
    "per-label mean embedding (dataset cartography)",
)


def ann_ivfpq(spark, sf_dir):
    """Composed IVF-PQ with residual encoding
    (operators/similarity.py::ivfpq_topk): coarse quantizer routes, PQ
    codes the residuals, queries scan only their nprobe probed clusters
    with per-(query, cluster) ADC tables over the query residual — the
    billion-scale index composition (FAISS IVFx,PQy)."""
    return S.ivfpq_topk(load(spark, sf_dir, "embeddings"), query_ids_below=5, k=10, nprobe=2)


ANN_IVFPQ_SQL = f"""
WITH {_BASE_CTE},
cents AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
assigned AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
),
res AS (
  SELECT a.vec_id, a.cluster,
         list_transform(range(1, {S._DIM} + 1), i -> a.v[i] - c.cvec[i]) AS rvec
  FROM assigned a JOIN cents c ON c.centroid_id = a.cluster
),
rsub AS (
  SELECT vec_id, cluster, m.s,
         rvec[m.s * {_PQ_SUB_LEN} + 1 : (m.s + 1) * {_PQ_SUB_LEN}] AS sv
  FROM res, (VALUES {", ".join(f"({s})" for s in range(S.PQ_M))}) AS m(s)
),
codes AS (
  SELECT vec_id AS code_id, s, sv AS cv FROM rsub
  WHERE vec_id % {S.PQ_CODE_MOD} = 0 AND vec_id < {S.PQ_CODE_MOD * S.PQ_MAX_CODES}
),
enc AS (
  SELECT vec_id, cluster, s, code_id AS code FROM (
    SELECT a.vec_id, a.cluster, a.s, c.code_id,
           ROW_NUMBER() OVER (
             PARTITION BY a.vec_id, a.s
             ORDER BY {_PQ_D2_INT.format(a="a.sv", b="c.cv")}, c.code_id) AS rn
    FROM rsub a JOIN codes c USING (s)
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, a.v AS qvec, a.norm AS qnorm
      FROM assigned a WHERE vec_id < 5),
probes AS (
  SELECT query_id, cluster, qres FROM (
    SELECT q.query_id, c.centroid_id AS cluster,
           list_transform(range(1, {S._DIM} + 1), i -> q.qvec[i] - c.cvec[i]) AS qres,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qvec, c.cvec) / (q.qnorm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM q CROSS JOIN cents c
  ) WHERE rn <= 2
),
dtable AS (
  SELECT p.query_id, p.cluster, c.s, c.code_id AS code,
         {_PQ_D2_INT.format(a="p.qres[c.s * " + str(_PQ_SUB_LEN) + " + 1 : (c.s + 1) * " + str(_PQ_SUB_LEN) + "]", b="c.cv")} AS dt
  FROM probes p CROSS JOIN codes c
),
approx AS (
  SELECT d.query_id, e.vec_id AS neighbor_id, CAST(SUM(d.dt) AS BIGINT) AS approx_d2
  FROM enc e JOIN dtable d
    ON d.cluster = e.cluster AND d.s = e.s AND d.code = e.code
  WHERE e.vec_id <> d.query_id
  GROUP BY d.query_id, e.vec_id
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, approx_d2 FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rank
  FROM approx
) WHERE rank <= 10
"""

QUERIES["ann_ivfpq"] = Q(
    ann_ivfpq, ANN_IVFPQ_SQL, "composed IVF-PQ residual index (FAISS IVFx,PQy shape)"
)


def ann_ivf_recall(spark, sf_dir):
    """Measured recall@5 of the IVF probe path against the exact
    brute-force ranking — the quality/efficiency trade quantified as a
    first-class query (what an index owner monitors in production). Hard
    signal is the integer hit count per query; the oracle recomputes both
    rankings and the same intersection."""
    emb = load(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, query_ids_below=5, k=5).select(
        "query_id", "neighbor_id"
    )
    approx = S.ivf_topk(emb, query_ids_below=5, k=5, nprobe=2).select(
        "query_id", "neighbor_id"
    )
    hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_hit")
    )
    n_exact = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    return (
        n_exact.join(hits, "query_id", "left")
        .select(
            "query_id",
            "n_exact",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
        )
        .withColumn(
            "recall_pct",
            F.round(F.col("n_hit") * 100 / F.col("n_exact"), 6),
        )
        .orderBy("query_id")
    )


ANN_IVF_RECALL_SQL = f"""
WITH exact10 AS ({ANN_COSINE_TOPK_SQL}),
exact AS (SELECT * FROM exact10 WHERE rank <= 5),
approx AS ({ANN_IVF_PROBE_SQL}),
hits AS (
  SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
  FROM exact e JOIN approx a
    ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
  GROUP BY e.query_id
),
ne AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
       FROM exact GROUP BY query_id)
SELECT ne.query_id, ne.n_exact,
       CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
       ROUND(COALESCE(hits.n_hit, 0) * 100 / ne.n_exact, 6) AS recall_pct
FROM ne LEFT JOIN hits USING (query_id)
ORDER BY ne.query_id
"""

QUERIES["ann_ivf_recall"] = Q(
    ann_ivf_recall, ANN_IVF_RECALL_SQL, "measured recall@5 of IVF vs brute force"
)


def ann_sq8_stats(spark, sf_dir):
    """Scalar quantization SQ8 (operators/similarity.py::sq8_encode_stats):
    per-dimension uint8 codes against one-pass min/max bounds, with the
    exact code sums and micro-grid reconstruction-error sums as the hard
    signal — completing the quantization family (IVF routes, PQ codes
    subvectors, JL projects, SQ8 compresses scalars)."""
    return S.sq8_encode_stats(load(spark, sf_dir, "embeddings"))


ANN_SQ8_STATS_SQL = """
WITH comp AS (
  SELECT vec_id, g.i AS pos, CAST(embedding[g.i + 1] AS DOUBLE) AS v
  FROM embeddings, UNNEST(range(0, 64)) AS g(i)
),
b AS (SELECT pos, MIN(v) AS vmin, MAX(v) AS vmax FROM comp GROUP BY pos),
s AS (
  SELECT c.pos, c.v, b.vmin, b.vmax,
         CASE WHEN b.vmax > b.vmin
              THEN CAST(ROUND((c.v - b.vmin) / (b.vmax - b.vmin) * 255) AS BIGINT)
              ELSE 0 END AS code
  FROM comp c JOIN b USING (pos)
),
e AS (
  SELECT pos, vmin, vmax, code,
         CAST(ROUND(ABS(v - (CASE WHEN vmax > vmin
                                  THEN vmin + code * (vmax - vmin) / 255
                                  ELSE vmin END)) * 1e6) AS BIGINT) AS err_micro
  FROM s
)
SELECT pos,
       CAST(ROUND(MIN(vmin) * 1e6) AS BIGINT) AS vmin_micro,
       CAST(ROUND(MIN(vmax) * 1e6) AS BIGINT) AS vmax_micro,
       CAST(SUM(code) AS BIGINT) AS code_sum,
       CAST(SUM(err_micro) AS BIGINT) AS abs_err_micro_sum
FROM e GROUP BY pos
ORDER BY pos
"""

QUERIES["ann_sq8_stats"] = Q(
    ann_sq8_stats, ANN_SQ8_STATS_SQL, "SQ8 scalar quantization bounds + reconstruction error"
)


def ann_knn_join_self(spark, sf_dir):
    """Batch k-NN JOIN over the whole corpus — every vector gets its 3
    nearest in-cluster neighbors (IVF blocking): the pairwise form behind
    embedding-level dedup/linking at scale, where per-query probing would
    be quadratic. The self-join never leaves the cluster (equi-join on
    the assignment), so pair volume is Σ cluster² — bounded by the
    quantizer, not the corpus²; cluster-boundary misses are the standard
    IVF recall trade, measured separately by ann_ivf_recall. Rank only
    (no float sim in the output), ties broken on neighbor id."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    base = S.with_norm(emb, "embedding").select(F.col("vec_id"), "vec", "norm")
    cents = base.filter(
        (F.col("vec_id") % S.CENTROID_MOD == 0)
        & (F.col("vec_id") < S.CENTROID_MOD * S.MAX_CENTROIDS)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    assigned = S._assign(base, cents, "vec_id").localCheckpoint()
    a = assigned.select(
        "cluster", F.col("vec_id").alias("a_id"), F.col("vec").alias("av"), F.col("norm").alias("an")
    )
    b = assigned.select(
        "cluster", F.col("vec_id").alias("b_id"), F.col("vec").alias("bv"), F.col("norm").alias("bn")
    )
    sim = S._dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    w = Window.partitionBy("a_id").orderBy(F.col("sim").desc(), F.col("b_id").asc())
    return (
        a.join(b, "cluster")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", sim.alias("sim"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select(F.col("a_id").alias("vec_id"), "rank", F.col("b_id").alias("neighbor_id"))
        .orderBy("vec_id", "rank")
    )


ANN_KNN_JOIN_SELF_SQL = f"""
WITH {_BASE_CTE},
cents AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
assigned AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
),
ranked AS (
  SELECT a.vec_id AS vec_id, b.vec_id AS neighbor_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY a.vec_id
           ORDER BY list_dot_product(a.v, b.v) / (a.norm * b.norm) DESC,
                    b.vec_id ASC) AS BIGINT) AS rank
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
)
SELECT vec_id, rank, neighbor_id
FROM ranked WHERE rank <= 3
ORDER BY vec_id, rank
"""

QUERIES["ann_knn_join_self"] = Q(
    ann_knn_join_self,
    ANN_KNN_JOIN_SELF_SQL,
    "cluster-blocked k-NN self-join: top-3 in-cluster neighbors for every vector",
)


def ann_rrf_fusion(spark, sf_dir):
    """Reciprocal-rank fusion — the hybrid-retrieval primitive (combine
    rankings from different retrievers without comparable scores): the
    exact cosine ranking and the IVF probe ranking fuse per (query,
    neighbor) as Σ 10⁶ DIV (60 + rank) — RRF with k=60 on the integer
    grid (the float 1/(k+r) sum is order-dependent; the integer sum is
    not). Full-outer on the two rank lists (a neighbor may appear in
    only one), re-ranked to a top-5 consensus."""
    from pyspark.sql import Window

    emb = load(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, query_ids_below=5, k=10).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_exact")
    )
    approx = S.ivf_topk(emb, query_ids_below=5, k=10, nprobe=2).select(
        "query_id", "neighbor_id", F.col("rank").alias("r_ivf")
    )
    fused = (
        exact.join(approx, ["query_id", "neighbor_id"], "full_outer")
        .select(
            "query_id",
            "neighbor_id",
            (
                F.coalesce(F.expr("1000000 DIV (60 + r_exact)"), F.lit(0))
                + F.coalesce(F.expr("1000000 DIV (60 + r_ivf)"), F.lit(0))
            ).cast("long").alias("rrf_ppm"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_ppm").desc(), F.col("neighbor_id").asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "rank", "neighbor_id", "rrf_ppm")
        .orderBy("query_id", "rank")
    )


ANN_RRF_FUSION_SQL = f"""
WITH {_BASE_CTE},
q0 AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM base WHERE vec_id < 5),
simsE AS (
  SELECT q.query_id, b.vec_id AS neighbor_id,
         list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) AS sim
  FROM base b CROSS JOIN q0 q WHERE b.vec_id != q.query_id
),
rankedE AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS r_exact
  FROM simsE
),
cents AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
assigned AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
),
qp AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM assigned WHERE vec_id < 5),
probes AS (
  SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
    SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cvec) / (q.qnorm * c.cnorm) DESC,
                      c.centroid_id ASC) AS probe_rank
    FROM qp q CROSS JOIN cents c
  ) WHERE probe_rank <= 2
),
simsI AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) AS sim
  FROM assigned a JOIN probes p ON a.cluster = p.cluster AND a.vec_id != p.query_id
),
rankedI AS (
  SELECT query_id, neighbor_id,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id ASC) AS r_ivf
  FROM simsI
),
fused AS (
  SELECT COALESCE(e.query_id, i.query_id) AS query_id,
         COALESCE(e.neighbor_id, i.neighbor_id) AS neighbor_id,
         CAST(COALESCE(1000000 // (60 + e.r_exact), 0)
              + COALESCE(1000000 // (60 + i.r_ivf), 0) AS BIGINT) AS rrf_ppm
  FROM (SELECT * FROM rankedE WHERE r_exact <= 10) e
  FULL OUTER JOIN (SELECT * FROM rankedI WHERE r_ivf <= 10) i
    ON e.query_id = i.query_id AND e.neighbor_id = i.neighbor_id
)
SELECT query_id, rank, neighbor_id, rrf_ppm FROM (
  SELECT query_id, neighbor_id, rrf_ppm,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY rrf_ppm DESC, neighbor_id ASC) AS BIGINT) AS rank
  FROM fused
) WHERE rank <= 5
ORDER BY query_id, rank
"""

QUERIES["ann_rrf_fusion"] = Q(
    ann_rrf_fusion,
    ANN_RRF_FUSION_SQL,
    "reciprocal-rank fusion of exact and IVF rankings (integer RRF, k=60)",
)


def semdedup_prune(spark, sf_dir):
    """SemDeDup (Abbas et al., 2023) — semantic dedup by embedding: cluster
    the corpus with the deterministic-sample quantizer, then inside each
    cluster prune every vector that has a LOWER-ID neighbor at cosine
    ≥ 0.4 (a deterministic keeper policy: the minimum id in every similar
    group always survives; both engines apply the identical rule). The
    synthetic corpus has no true near-duplicates (max pairwise cosine
    ≈ 0.51), so the gate threshold sits in the observed tail to keep the
    prune path exercised; a production run would use ~0.9. The
    pairwise compare never leaves the cluster — pair volume is Σ cluster²,
    bounded by the quantizer fan-out, not corpus² — and the pruned-id set
    is a DISTINCT semi-side, so the corpus itself is touched exactly
    twice (assign + flag join). The keep flag per vector is the exact
    artifact a curation pipeline materializes before training."""
    emb = load(spark, sf_dir, "embeddings")
    base = S.with_norm(emb, "embedding").select(F.col("vec_id"), "vec", "norm")
    cents = base.filter(
        (F.col("vec_id") % S.CENTROID_MOD == 0)
        & (F.col("vec_id") < S.CENTROID_MOD * S.MAX_CENTROIDS)
    ).select(
        F.col("vec_id").alias("centroid_id"),
        F.col("vec").alias("cvec"),
        F.col("norm").alias("cnorm"),
    )
    assigned = S._assign(base, cents, "vec_id").localCheckpoint()
    a = assigned.select(
        "cluster", F.col("vec_id").alias("a_id"), F.col("vec").alias("av"), F.col("norm").alias("an")
    )
    b = assigned.select(
        "cluster", F.col("vec_id").alias("b_id"), F.col("vec").alias("bv"), F.col("norm").alias("bn")
    )
    sim = S._dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn"))
    pruned = (
        a.join(b, "cluster")
        .filter(F.col("a_id") < F.col("b_id"))
        .select(F.col("b_id"), sim.alias("sim"))
        .filter(F.col("sim") >= 0.4)
        .select(F.col("b_id").alias("pruned_id"))
        .distinct()
    )
    return (
        assigned.join(pruned, assigned.vec_id == F.col("pruned_id"), "left_outer")
        .select(
            "vec_id",
            F.col("cluster").cast("bigint").alias("cluster"),
            F.col("pruned_id").isNull().cast("int").alias("keep"),
        )
    )


SEMDEDUP_PRUNE_SQL = f"""
WITH {_BASE_CTE},
cents AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
assigned AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents c
  ) WHERE rn = 1
),
pruned AS (
  SELECT DISTINCT b.vec_id AS pruned_id
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.v, b.v) / (a.norm * b.norm) >= 0.4
)
SELECT s.vec_id, CAST(s.cluster AS BIGINT) AS cluster,
       CAST(CASE WHEN p.pruned_id IS NULL THEN 1 ELSE 0 END AS INT) AS keep
FROM assigned s LEFT OUTER JOIN pruned p ON s.vec_id = p.pruned_id
"""

QUERIES["semdedup_prune"] = Q(
    semdedup_prune,
    SEMDEDUP_PRUNE_SQL,
    "SemDeDup: cluster-blocked semantic prune, min-id keeper per similar group",
)


def ann_dim_truncation_eval(spark, sf_dir):
    """Dimension-truncation retrieval eval (the matryoshka question: how
    much ranking survives if we keep only the first 16 of 64 dims?):
    exact cosine top-10 under the full vectors vs the truncated prefix
    for the first 5 query vectors, joined per (query, neighbor) —
    overlap membership and the integer squared rank displacement. All
    ranks are integers, so the quality signal is hash-exact; at scale
    each ranking is the brute-force baseline path (corpus never
    shuffles, queries broadcast)."""
    emb = load(spark, sf_dir, "embeddings")
    full = S.cosine_topk(emb, query_ids_below=5, k=10).select(
        F.col("query_id"), F.col("neighbor_id"), F.col("rank").alias("rank_full")
    )
    trunc_emb = emb.select(
        "vec_id", F.slice(F.col("embedding"), 1, 16).alias("embedding")
    )
    trunc = S.cosine_topk(trunc_emb, query_ids_below=5, k=10).select(
        F.col("query_id"), F.col("neighbor_id"), F.col("rank").alias("rank_trunc")
    )
    j = full.join(trunc, ["query_id", "neighbor_id"], "full_outer")
    return j.groupBy("query_id").agg(
        F.sum((F.col("rank_full").isNotNull() & F.col("rank_trunc").isNotNull()).cast("long"))
        .cast("long")
        .alias("overlap_at_10"),
        F.sum(
            F.when(
                F.col("rank_full").isNotNull() & F.col("rank_trunc").isNotNull(),
                (F.col("rank_full") - F.col("rank_trunc"))
                * (F.col("rank_full") - F.col("rank_trunc")),
            ).otherwise(0)
        )
        .cast("long")
        .alias("sq_rank_disp"),
    )


ANN_DIM_TRUNCATION_EVAL_SQL = f"""
WITH {_BASE_CTE},
q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM base WHERE vec_id < 5),
full_rank AS (
  SELECT query_id, neighbor_id, rank_full FROM (
    SELECT q.query_id, b.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) DESC,
                      b.vec_id ASC) AS BIGINT) AS rank_full
    FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id
  ) WHERE rank_full <= 10
),
tbase AS (
  SELECT vec_id, v[1:16] AS v,
         sqrt(list_dot_product(v[1:16], v[1:16])) AS norm
  FROM base
),
tq AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM tbase WHERE vec_id < 5),
trunc_rank AS (
  SELECT query_id, neighbor_id, rank_trunc FROM (
    SELECT tq.query_id, b.vec_id AS neighbor_id,
           CAST(ROW_NUMBER() OVER (PARTITION BY tq.query_id
             ORDER BY list_dot_product(b.v, tq.qv) / (b.norm * tq.qnorm) DESC,
                      b.vec_id ASC) AS BIGINT) AS rank_trunc
    FROM tbase b CROSS JOIN tq WHERE b.vec_id <> tq.query_id
  ) WHERE rank_trunc <= 10
)
SELECT COALESCE(f.query_id, t.query_id) AS query_id,
       CAST(SUM(CASE WHEN f.rank_full IS NOT NULL AND t.rank_trunc IS NOT NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS overlap_at_10,
       CAST(SUM(CASE WHEN f.rank_full IS NOT NULL AND t.rank_trunc IS NOT NULL
                     THEN (f.rank_full - t.rank_trunc) * (f.rank_full - t.rank_trunc)
                     ELSE 0 END) AS BIGINT) AS sq_rank_disp
FROM full_rank f
FULL OUTER JOIN trunc_rank t
  ON f.query_id = t.query_id AND f.neighbor_id = t.neighbor_id
GROUP BY COALESCE(f.query_id, t.query_id)
"""

QUERIES["ann_dim_truncation_eval"] = Q(
    ann_dim_truncation_eval,
    ANN_DIM_TRUNCATION_EVAL_SQL,
    "matryoshka truncation eval: top-10 overlap + integer rank displacement",
)


def _ivf_probe_cte(nprobe: int) -> str:
    """Parameterized rendering of the IVF probe ranking (the
    ANN_IVF_PROBE_SQL pipeline) for the nprobe sweep."""
    return f"""
cents_{nprobe} AS (
  SELECT vec_id AS centroid_id, v AS cvec, norm AS cnorm FROM base
  WHERE vec_id % {S.CENTROID_MOD} = 0 AND vec_id < {S.CENTROID_MOD * S.MAX_CENTROIDS}
),
assigned_{nprobe} AS (
  SELECT vec_id, v, norm, centroid_id AS cluster FROM (
    SELECT b.vec_id, b.v, b.norm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY list_dot_product(b.v, c.cvec) / (b.norm * c.cnorm) DESC,
                      c.centroid_id ASC) AS rn
    FROM base b CROSS JOIN cents_{nprobe} c
  ) WHERE rn = 1
),
q_{nprobe} AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm
               FROM assigned_{nprobe} WHERE vec_id < 5),
probes_{nprobe} AS (
  SELECT query_id, qv, qnorm, centroid_id AS cluster FROM (
    SELECT q.query_id, q.qv, q.qnorm, c.centroid_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY list_dot_product(q.qv, c.cvec) / (q.qnorm * c.cnorm) DESC,
                      c.centroid_id ASC) AS probe_rank
    FROM q_{nprobe} q CROSS JOIN cents_{nprobe} c
  ) WHERE probe_rank <= {nprobe}
),
approx_{nprobe} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY p.query_id
             ORDER BY list_dot_product(a.v, p.qv) / (a.norm * p.qnorm) DESC,
                      a.vec_id ASC) AS rank
    FROM assigned_{nprobe} a
    JOIN probes_{nprobe} p ON a.cluster = p.cluster AND a.vec_id != p.query_id
  ) WHERE rank <= 5
),
recall_{nprobe} AS (
  SELECT CAST({nprobe} AS BIGINT) AS nprobe, ne.query_id, ne.n_exact,
         CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit
  FROM (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_exact
        FROM exact5 GROUP BY query_id) ne
  LEFT JOIN (
    SELECT e.query_id, CAST(COUNT(*) AS BIGINT) AS n_hit
    FROM exact5 e JOIN approx_{nprobe} a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
  ) h USING (query_id)
)"""


def ann_nprobe_recall_sweep(spark, sf_dir):
    """The IVF tuning curve as one query: recall@5 vs the exact ranking
    at nprobe ∈ {1, 2, 4} — the cost/quality trade an index owner reads
    before picking a production probe width (more probed clusters →
    more rerank work → higher recall). Integer hit counts per (nprobe,
    query); everything reuses the shared quantizer machinery."""
    emb = load(spark, sf_dir, "embeddings")
    exact = S.cosine_topk(emb, query_ids_below=5, k=5).select(
        "query_id", "neighbor_id"
    ).localCheckpoint()
    n_exact = exact.groupBy("query_id").agg(
        F.count("*").cast("long").alias("n_exact")
    )
    parts = []
    for nprobe in (1, 2, 4):
        approx = S.ivf_topk(emb, query_ids_below=5, k=5, nprobe=nprobe).select(
            "query_id", "neighbor_id"
        )
        hits = exact.join(approx, ["query_id", "neighbor_id"]).groupBy(
            "query_id"
        ).agg(F.count("*").cast("long").alias("n_hit"))
        parts.append(
            n_exact.join(hits, "query_id", "left").select(
                F.lit(nprobe).cast("long").alias("nprobe"),
                "query_id",
                "n_exact",
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


ANN_NPROBE_RECALL_SWEEP_SQL = f"""
WITH {_BASE_CTE},
exact10 AS ({ANN_COSINE_TOPK_SQL}),
exact5 AS (SELECT query_id, neighbor_id FROM exact10 WHERE rank <= 5),
{_ivf_probe_cte(1).lstrip()},
{_ivf_probe_cte(2).lstrip()},
{_ivf_probe_cte(4).lstrip()}
SELECT * FROM recall_1
UNION ALL SELECT * FROM recall_2
UNION ALL SELECT * FROM recall_4
"""

QUERIES["ann_nprobe_recall_sweep"] = Q(
    ann_nprobe_recall_sweep,
    ANN_NPROBE_RECALL_SWEEP_SQL,
    "IVF tuning curve: recall@5 at nprobe 1/2/4 in one query",
)


def embedding_norm_qc(spark, sf_dir):
    """Vector-lake quality control — the screen an embedding corpus runs
    before indexing: per-vector squared L2 norm on the exact micro grid
    (Σ of integer squares via one codegen AGGREGATE over the array — no
    Python, no shuffle), log2-bucketed into a ≤~50-row histogram, plus
    the census of degenerate vectors (zero norm) and norm outliers
    (norm² beyond 4× the unit grid — ‖v‖ > 2). Map-side everything;
    one bounded partial agg."""
    emb = load(spark, sf_dir, "embeddings")
    GRID2 = 1_000_000 * 1_000_000  # micro-grid squared == unit norm²
    m = emb.select(
        F.expr(
            "aggregate(transform(embedding, v -> CAST(round(CAST(v AS DOUBLE) * 1000000) AS BIGINT)), "
            "CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"
        ).alias("n2")
    )
    return (
        m.select(
            F.when(F.col("n2") == 0, F.lit(-1))
            .otherwise(F.length(F.bin(F.col("n2"))) - 1)
            .alias("bucket"),
            F.col("n2"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("n2") > 4 * F.lit(GRID2), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("bucket")
    )


EMBEDDING_NORM_QC_SQL = """
WITH m AS (
  SELECT list_sum(list_transform(embedding,
           v -> CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT)
                * CAST(ROUND(CAST(v AS DOUBLE) * 1000000) AS BIGINT))) AS n2
  FROM embeddings
)
SELECT CASE WHEN n2 = 0 THEN -1 ELSE length(to_base(CAST(n2 AS BIGINT), 2)) - 1 END AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(CASE WHEN n2 > 4 * 1000000000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM m GROUP BY 1 ORDER BY bucket
"""

QUERIES["embedding_norm_qc"] = Q(
    embedding_norm_qc,
    EMBEDDING_NORM_QC_SQL,
    "embedding QC: exact micro-grid norm histogram + degenerate/outlier census",
)
