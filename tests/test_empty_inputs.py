"""Empty-input behavior: every operator must return an EMPTY result with
the right schema — not raise — when its input has no rows (the
first-micro-batch / fresh-lake case every production job hits)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame(
        [], "doc_id long, text string, lang string, source string, n_chars long"
    )


@pytest.fixture(scope="module")
def empty_events(spark):
    return spark.createDataFrame(
        [], "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_dedup_ops_on_empty(spark, empty_docs):
    from cdc_agents_data_stream_spark.operators import dedup as D

    assert D.exact_dup_groups(empty_docs).count() == 0
    assert D.minhash_lsh_pairs(empty_docs).count() == 0
    assert D.dup_spans(empty_docs).count() == 0
    packed = D.bloom_build(empty_docs)
    assert all(w == 0 for w in packed)
    assert D.bloom_probe(empty_docs, packed).count() == 0


def test_text_ops_on_empty(spark, empty_docs):
    from cdc_agents_data_stream_spark.operators import textops as T

    assert T.quality_classifier_score(empty_docs).count() == 0
    assert T.chunk_documents(empty_docs).count() == 0
    assert T.normalize_text(empty_docs).count() == 0


def test_sampling_ops_on_empty(spark, empty_docs):
    from cdc_agents_data_stream_spark.operators import sampling as S

    assert S.temperature_rates(empty_docs, strata_col="lang").count() == 0
    assert S.temperature_mix(empty_docs, strata_col="lang").count() == 0


def test_sketches_on_empty(spark, empty_events):
    from cdc_agents_data_stream_spark.operators import sketches as K

    assert K.hll_distinct(empty_events, "event_type", "event_id").count() == 0
    sketch = K.cms_build(empty_events, "user_id")
    assert sketch.count() == 0
    assert K.cms_estimate(sketch, empty_events.select("user_id"), "user_id").count() == 0


def test_windows_and_joins_on_empty(spark, empty_events):
    from cdc_agents_data_stream_spark.operators.asof import asof_join, interval_join
    from cdc_agents_data_stream_spark.operators.windows import time_gapfill

    ev = empty_events.select("user_id", F.unix_millis("ts").alias("t_ms"), "event_id")
    iv = empty_events.select(
        "user_id",
        F.unix_millis("ts").alias("start_ms"),
        (F.unix_millis("ts") + 1000).alias("end_ms"),
    )
    assert interval_join(ev, iv, "user_id", "t_ms", "start_ms", "end_ms").count() == 0
    assert time_gapfill(ev, "user_id", "t_ms", "event_id").count() == 0
    left = empty_events.select("user_id", F.unix_millis("ts").alias("l_ms"), "event_id")
    right = empty_events.select("user_id", F.unix_millis("ts").alias("r_ms"), "value")
    assert (
        asof_join(
            left, right, on="user_id", left_ts="l_ms", right_ts="r_ms",
            right_payload=["value"],
        ).count()
        == 0
    )


def test_similarity_on_empty(spark):
    from cdc_agents_data_stream_spark.operators import similarity as S

    emb = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert S.cosine_topk(emb).count() == 0
    # trained paths must tolerate an empty training corpus too
    cents, assigned = S.ivf_index(emb, train_iters=1)
    assert assigned.count() == 0


def test_regression_and_linalg_on_empty(spark):
    from cdc_agents_data_stream_spark.operators import linalg as L
    from cdc_agents_data_stream_spark.operators import regression as R

    empty_pts = spark.createDataFrame([], "g string, x long, y long")
    assert R.grouped_ols(empty_pts, "g", "x", "y").count() == 0
    assert (
        R.grouped_normal_equations(empty_pts, "g", ["x"], "y").count() == 0
    )
    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert L.embedding_moments(empty_emb, "embedding", 4).count() == 0
    assert L.rp_project(empty_emb, "embedding", 4, 2).count() == 0


def test_zorder_and_retrieval_on_empty(spark, empty_docs):
    from cdc_agents_data_stream_spark.operators import textops as T
    from cdc_agents_data_stream_spark.operators import zorder as Z

    empty_norm = spark.createDataFrame([], "event_id long, ux long, vy long")
    keyed = Z.with_zorder_key(empty_norm, ["ux", "vy"], 8)
    assert keyed.count() == 0 and "zval" in keyed.columns
    assert Z.zorder_layout(empty_norm, ["ux", "vy"], 8, num_files=2).count() == 0
    got = T.tfidf_retrieve(empty_docs, ["a", "b"], k=5)
    assert got.count() == 0 and got.columns == ["doc_id", "score"]


def test_graph_ops_on_empty(spark, empty_docs):
    from cdc_agents_data_stream_spark.operators import graph as G
    from cdc_agents_data_stream_spark.operators import sampling as S

    empty_nodes = spark.createDataFrame([], "node long")
    empty_edges = spark.createDataFrame([], "src long, dst long")
    # pagerank over an empty vertex set: no rows, rank schema intact
    pr = G.pagerank(empty_nodes, empty_edges, iterations=1)
    assert pr.count() == 0 and pr.columns == ["node", "rank_ppm"]
    lp = G.label_propagation(empty_nodes, empty_edges, iterations=1)
    assert lp.count() == 0 and lp.columns == ["node", "label"]
    empty_pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    tc = G.triangle_counts(empty_pairs)
    assert tc.count() == 0 and tc.columns == ["node", "n_triangles"]
    ns = S.negative_samples(empty_docs, k=2, payload_cols=("n_chars",))
    assert ns.count() == 0 and ns.columns == ["anchor_id", "slot", "neg_id", "neg_n_chars"]
