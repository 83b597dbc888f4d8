"""Unit + plan-shape tests for the corpus-assembly operators
(operators/sampling.py): packing invariants, sampling determinism,
decontamination broadcast shape, shuffle permutation properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_agents_data_stream_spark.operators.sampling import (
    ngram_decontaminate,
    pack_sequences,
    shuffle_order,
    stratified_sample,
)

SF_DIR = "/root/testdata/sf0.001"


def _physical_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_pack_sequences_invariants(docs):
    packed = pack_sequences(docs, max_tokens=256, n_shards=4).cache()
    # every doc lands in exactly one pack
    assert packed.count() == docs.count()
    # pack ids are dense from 0 within each shard
    per_shard = packed.groupBy("shard").agg(
        F.min("pack_id").alias("lo"), F.max("pack_id").alias("hi"),
        F.countDistinct("pack_id").alias("n"),
    )
    for r in per_shard.collect():
        assert r.lo == 0 and r.n == r.hi + 1
    # contiguous fill: a pack's token total before its last doc is < cap
    # (only the final doc may overflow the boundary)
    stats = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("tot"), F.max("n_tokens").alias("biggest")
    )
    assert stats.filter((F.col("tot") - F.col("biggest")) >= 256).count() == 0


def test_stratified_sample_deterministic_and_bounded(docs):
    kept1 = stratified_sample(docs, rates={"en": 0.5}, default_rate=0.0)
    kept2 = stratified_sample(docs, rates={"en": 0.5}, default_rate=0.0)
    ids1 = {r.doc_id for r in kept1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in kept2.select("doc_id").collect()}
    assert ids1 == ids2  # same salt -> identical sample
    assert all(
        r.lang == "en"
        for r in kept1.select("lang").distinct().collect()
    )
    n_en = docs.filter(F.col("lang") == "en").count()
    # md5 buckets are ~uniform; 50% rate keeps roughly half
    assert 0.3 * n_en <= len(ids1) <= 0.7 * n_en
    # a different salt draws a different (but same-rate) sample
    kept3 = stratified_sample(docs, rates={"en": 0.5}, salt="s2")
    ids3 = {r.doc_id for r in kept3.select("doc_id").collect()}
    assert ids3 != ids1


def test_decontaminate_broadcasts_and_self_flags(docs):
    bench = docs.limit(5)
    flagged = ngram_decontaminate(docs, bench, n=8)
    plan = _physical_plan(flagged)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # benchmark docs trivially share all their 8-grams with themselves
    bench_ids = [r.doc_id for r in bench.select("doc_id").collect()]
    got = {
        r.doc_id: r.contaminated
        for r in flagged.filter(F.col("doc_id").isin(bench_ids)).collect()
    }
    long_enough = {
        r.doc_id
        for r in bench.filter(F.size(F.split(F.col("text"), " ")) >= 8)
        .select("doc_id").collect()
    }
    for did in long_enough:
        assert got[did] == 1


def test_shuffle_order_is_permutation_and_seed_sensitive(docs):
    o1 = shuffle_order(docs, seed="e0").select("doc_id").collect()
    o2 = shuffle_order(docs, seed="e0").select("doc_id").collect()
    o3 = shuffle_order(docs, seed="e1").select("doc_id").collect()
    seq1 = [r.doc_id for r in o1]
    assert seq1 == [r.doc_id for r in o2]  # deterministic
    assert sorted(seq1) == sorted(r.doc_id for r in o3)  # same multiset
    assert seq1 != [r.doc_id for r in o3]  # different order per seed
