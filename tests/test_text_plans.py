"""Plan-shape tests for the text operators' scale paths."""

from __future__ import annotations

import pytest

from cdc_agents_data_stream_spark.operators.textops import vocab_doc_freq

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_vocab_doc_freq_has_salted_first_stage(docs):
    """The doc-frequency count must run as the two-level (token, salt)
    aggregation: a first exchange keyed on (token, salt), a second on
    token alone, and no distinct-aggregate Expand anywhere."""
    plan = vocab_doc_freq(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Expand" not in plan  # countDistinct would plan an expand
    # the salt is planned as a grouping expression: pmod(xxhash64(doc_id))
    assert "pmod(xxhash64(doc_id" in plan
    exchanges = [ln for ln in plan.splitlines() if "Exchange hashpartitioning" in ln]
    assert len(exchanges) == 2
    salted = [ln for ln in exchanges if "token" in ln and "_groupingexpression" in ln]
    token_only = [ln for ln in exchanges if "token" in ln and "_groupingexpression" not in ln]
    assert len(salted) == 1, plan
    assert len(token_only) == 1, plan
