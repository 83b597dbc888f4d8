"""Pin the df.observe()/Observation instrumentation surface: metrics
ride the existing action (no second job over the data) and must equal
the directly-aggregated values. This is the mechanism a production
pipeline uses for row-count/invariant telemetry on 100 TB scans —
counting via a separate .count() would double the I/O."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_observation_metrics_match_direct_aggregates(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    obs = Observation("ingest-metrics")
    cents = F.round(F.col("value") * 100).cast("long")
    observed = ev.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.approx_count_distinct(F.col("user_id")).alias("n_users_approx"),
    )
    # one action drives both the pipeline result and the metrics
    out_rows = observed.filter(F.col("event_type") == "purchase").count()
    direct = ev.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(cents).alias("sum_cents"),
        F.approx_count_distinct(F.col("user_id")).alias("n_users_approx"),
    ).collect()[0]
    got = obs.get
    assert got["n_rows"] == direct["n_rows"]
    assert got["sum_cents"] == direct["sum_cents"]
    # DISTINCT aggregates are rejected inside observe() (AnalysisException
    # INVALID_OBSERVED_METRICS) — the HLL approximation is the sanctioned
    # form, and it is deterministic for a fixed input
    assert got["n_users_approx"] == direct["n_users_approx"]
    # the observation sees pre-filter traffic: the filtered count is smaller
    assert out_rows < got["n_rows"]


def test_observation_on_streaming_microbatch(spark, tmp_path):
    """observe() also instruments streaming micro-batches (the listener
    carries metrics per batch); here the batch path is exercised through
    availableNow + memory sink, metric read from the last progress."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").limit(100)
    src = str(tmp_path / "in")
    ev.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(src)
        .observe("batch-metrics", F.count(F.lit(1)).alias("n_rows"))
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("obs_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(timeout=120)
        progresses = [p for p in q.recentProgress if p["observedMetrics"]]
        total = sum(
            p["observedMetrics"]["batch-metrics"]["n_rows"] for p in progresses
        )
        assert total == 100
    finally:
        q.stop()
        spark.catalog.dropTempView("obs_sink")
