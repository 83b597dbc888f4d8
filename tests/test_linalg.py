"""Distributed linear algebra + grouped OLS: the moments pipeline must
agree with straight numpy on collected data, PCA must come out of the
d²-bounded artifact alone, and the JL projection must roughly preserve
pairwise distances (deterministic sign matrix ⇒ pinned bound)."""

from __future__ import annotations

import numpy as np
import pytest

from cdc_agents_data_stream_spark.operators import linalg as L
from cdc_agents_data_stream_spark.operators import regression as R
from cdc_agents_data_stream_spark.queries.base import load

SF = "/root/testdata/sf0.001"
DIM = 64


@pytest.fixture(scope="module")
def emb(spark):
    return load(spark, SF, "embeddings").cache()


def _numpy_micro(emb_df):
    rows = emb_df.select("vec_id", "embedding").orderBy("vec_id").collect()
    V = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    # same half-up grid the engine uses (values here never land on ties,
    # verified by the oracle gate at sf0.01 — np.floor(x+0.5) is half-up)
    return np.floor(V * L.GRID + 0.5).astype("int64")


def test_moments_match_numpy(spark, emb):
    got = {
        (r["i"], r["j"]): r
        for r in L.embedding_moments(emb, "embedding", DIM).collect()
    }
    M = _numpy_micro(emb)
    S = M.T @ M
    cs = M.sum(axis=0)
    n = M.shape[0]
    assert len(got) == DIM * (DIM + 1) // 2
    for (i, j), r in got.items():
        assert r["n_vecs"] == n
        assert r["sum_prod"] == float(S[i, j])
        assert r["sum_i"] == float(cs[i])
        assert r["sum_j"] == float(cs[j])
        expect_cov = (n * S[i, j] - cs[i] * cs[j]) / (n * n) / (L.GRID**2)
        assert r["cov"] == pytest.approx(expect_cov, abs=1e-9)


def test_moments_partition_invariant(spark, emb):
    """The partial-outer-product reduction is associative: 1 partition and
    7 partitions must give byte-identical integer sums."""
    one = L.embedding_moments(emb.coalesce(1), "embedding", DIM)
    many = L.embedding_moments(emb.repartition(7), "embedding", DIM)
    a = sorted((r["i"], r["j"], r["sum_prod"], r["sum_i"]) for r in one.collect())
    b = sorted((r["i"], r["j"], r["sum_prod"], r["sum_i"]) for r in many.collect())
    assert a == b


def test_pca_from_moments(spark, emb):
    """PCA computed from the collected d² artifact matches numpy PCA on
    the raw (micro-grid) data to float tolerance."""
    rows = [r.asDict() for r in L.embedding_moments(emb, "embedding", DIM).collect()]
    w, v = L.pca_topk(rows, 4)
    M = _numpy_micro(emb).astype(np.float64) / L.GRID
    C = np.cov(M, rowvar=False, bias=True)
    w_ref = np.sort(np.linalg.eigvalsh(C))[::-1][:4]
    # moments round cov to 12 decimals, so loose-ish tolerance
    assert np.allclose(w, w_ref, atol=1e-6)
    assert w[0] >= w[1] >= w[2] >= w[3] >= 0
    # eigenvectors are orthonormal
    assert np.allclose(v.T @ v, np.eye(4), atol=1e-8)


def test_rp_preserves_distances(spark, emb):
    """JL with k=16 ±1 signs: squared distances scaled by in/out ratio
    stay within a small constant factor for the great majority of pairs.
    Deterministic inputs + deterministic signs ⇒ this is a pinned fact,
    not a flaky probabilistic assertion."""
    proj = L.rp_project(emb, "embedding", DIM, 16).orderBy("vec_id").collect()
    P = np.array([[r[f"p{k}"] for k in range(16)] for r in proj], dtype=np.float64)
    M = _numpy_micro(emb).astype(np.float64)
    rng = np.random.RandomState(7)
    idx = rng.choice(len(M), size=(200, 2))
    ratios = []
    for a, b in idx:
        if a == b:
            continue
        d_true = np.sum((M[a] - M[b]) ** 2)
        d_proj = np.sum((P[a] - P[b]) ** 2) / 16.0  # E[d_proj/k] = d_true
        if d_true > 0:
            ratios.append(d_proj / d_true)
    ratios = np.array(ratios)
    assert np.median(ratios) == pytest.approx(1.0, rel=0.35)
    assert (np.abs(np.log(ratios)) < np.log(4)).mean() > 0.9


def test_rp_exact_int_and_signs():
    signs = L.rp_signs(4, 3)
    assert all(s in (-1, 1) for row in signs for s in row)
    assert signs == L.rp_signs(4, 3)  # deterministic


def test_normal_equations_solve_matches_lstsq(spark):
    """The driver-side solve of the distributed sufficient statistics must
    equal numpy lstsq run on the raw collected points."""
    from pyspark.sql import functions as F

    ev = load(spark, SF, "events").select(
        "event_type",
        ((F.unix_millis(F.col("ts").cast("timestamp")) / F.lit(1000)).cast("bigint")
         - F.lit(1_704_067_200)).alias("x1"),
        F.hour(F.col("ts").cast("timestamp")).cast("bigint").alias("x2"),
        F.round(F.col("value") * 1e6).cast("bigint").alias("y"),
    ).cache()
    stats = {
        r["event_type"]: r.asDict()
        for r in R.grouped_normal_equations(ev, "event_type", ["x1", "x2"], "y").collect()
    }
    raw = ev.collect()
    for etype, row in stats.items():
        coef = R.solve_normal_equations(row, ["x1", "x2"])
        pts = [(r["x1"], r["x2"], r["y"]) for r in raw if r["event_type"] == etype]
        X = np.array([[1.0, p[0], p[1]] for p in pts])
        y = np.array([p[2] for p in pts], dtype=np.float64)
        ref, *_ = np.linalg.lstsq(X, y, rcond=None)
        assert np.allclose(coef, ref, rtol=1e-6, atol=1e-3), (etype, coef, ref)


def test_grouped_ols_exact_and_degenerate(spark):
    data = [
        # g=a: y = 3x + 10 exactly
        ("a", 0, 10), ("a", 1, 13), ("a", 2, 16), ("a", 3, 19),
        # g=b: all x equal -> zero denominator -> null fit
        ("b", 5, 1), ("b", 5, 2), ("b", 5, 3),
    ]
    df = spark.createDataFrame(data, "g string, x long, y long")
    rows = {r["g"]: r for r in R.grouped_ols(df, "g", "x", "y").collect()}
    assert rows["a"]["slope"] == pytest.approx(3.0)
    assert rows["a"]["intercept"] == pytest.approx(10.0)
    assert rows["a"]["n_pts"] == 4
    assert rows["b"]["slope"] is None and rows["b"]["intercept"] is None
    assert rows["b"]["slope_den"] == 0.0
