"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose every declared operator from SURVEY.md §2 (plus the
beyond-reference training-data operators) with DuckDB oracles where the
semantics are SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_agents_data_stream_spark.queries.registry import all_queries

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: W1 dedup-to-latest — the reference's load-bearing query
    shape (dao/CdcCheckpointDao.java:63-79) over the events table."""
    from cdc_agents_data_stream_spark.queries.relational import latest_event_per_user

    return latest_event_per_user(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
