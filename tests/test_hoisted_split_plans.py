"""Plan-shape pins for the hoisted-tokenization fix (round 7).

Higher-order functions (transform/filter/aggregate) run interpreted
(CodegenFallback), and a lambda body re-walks its closure's expression
tree PER ELEMENT — so an indexed gram/pair transform whose lambda slices
an INLINE ``split(text)`` re-tokenizes the document once per output
element: O(tokens²) per doc (measured 12× at 2k tokens, unbounded on
long docs). The fix materializes the token array as its own projection
and lets the lambda slice a bound column.

These tests pin the shape that makes it work: in the optimized plan the
split must appear exactly once, in a Project OUTSIDE the higher-order
expression — i.e. CollapseProject must NOT have inlined the alias back
into the lambda (it keeps the projection because the array is non-cheap
and referenced more than once; if a Spark upgrade changes that rule,
these tests catch the silent O(n²) re-introduction)."""

from __future__ import annotations

import re

import pytest

from cdc_agents_data_stream_spark.operators.dedup import dup_spans, shingles
from cdc_agents_data_stream_spark.operators.textops import bpe_merge_pair_counts

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def _optimized_plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def _hof_lines(plan: str) -> list[str]:
    """Plan lines holding a higher-order expression (one line per
    Project/Generate in the single-line tree rendering)."""
    return [
        ln
        for ln in plan.splitlines()
        if re.search(r"\btransform\(|\bfilter\(|\baggregate\(", ln)
    ]


def _assert_split_hoisted(plan: str) -> None:
    hof = _hof_lines(plan)
    assert hof, f"expected a higher-order expression in:\n{plan}"
    for ln in hof:
        assert "split(" not in ln, (
            "tokenization leaked back inside the higher-order expression "
            f"(per-element re-evaluation, O(tokens²)/doc):\n{ln}"
        )
    assert "split(" in plan, f"split vanished entirely from:\n{plan}"


def test_shingles_split_is_hoisted(docs):
    _assert_split_hoisted(_optimized_plan(shingles(docs, n=3)))


def test_dup_spans_gram_split_is_hoisted(docs):
    # dup_spans' downstream windows/joins add more operators; the gram
    # subtree is the only one holding both split and transform
    _assert_split_hoisted(_optimized_plan(dup_spans(docs)))


def test_bpe_pair_split_is_hoisted(docs):
    _assert_split_hoisted(_optimized_plan(bpe_merge_pair_counts(docs)))
