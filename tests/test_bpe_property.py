"""BPE training kernel vs an independent pure-Python reference.

The declarative plan in `queries/text_queries.py::bpe_train_merges`
derives merges through Spark aggregations + delimiter replaces; this
reference re-implements the SAME contract (weighted adjacent-pair
counts, argmax by (count desc, pair asc), non-overlapping left-to-right
delimiter merge) directly on Python dicts, so a bug in the distributed
formulation (pair windowing, tie-break, replace semantics) cannot hide
behind the DuckDB oracle sharing its SQL shape."""

from __future__ import annotations

from collections import Counter

import pandas as pd
import pytest


def _py_bpe(words: dict[str, int], n_merges: int):
    vocab = {" ".join(w): f for w, f in words.items() if w}
    merges = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for s, f in vocab.items():
            toks = s.split(" ")
            for a, b in zip(toks, toks[1:]):
                pairs[f"{a} {b}"] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((best[0], best[0].replace(" ", ""), best[1]))
        pat, rep = f" {best[0]} ", f" {best[0].replace(' ', '')} "
        vocab = {
            (" " + s + " ").replace(pat, rep).strip(): f for s, f in vocab.items()
        }
        # identical spellings can collide after a merge: fold frequencies
        folded: dict[str, int] = {}
        for s, f in vocab.items():
            folded[s] = folded.get(s, 0) + f
        vocab = folded
    return merges


CORPORA = [
    {"low": 5, "lower": 2, "newest": 6, "widest": 3},
    {"aaaa": 4, "aab": 3, "ab": 7},
    {"xy": 1, "yx": 1, "xx": 1},
    {"the": 10, "then": 5, "than": 5, "that": 9, "this": 4},
]


@pytest.mark.parametrize("words", CORPORA)
def test_bpe_matches_reference(spark, words):
    from pyspark.sql import functions as F

    from cdc_agents_data_stream_spark.queries import text_queries as T

    # monkey-route the corpus through a temp "documents" table: rebuild
    # the query inline against a literal DataFrame instead of sf_dir
    rows = [(i, " ".join([w] * f)) for i, (w, f) in enumerate(sorted(words.items()))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    import cdc_agents_data_stream_spark.queries.base as B

    orig = B.load
    try:
        B.load = lambda _s, _d, _n: docs
        T.load = B.load
        got = [
            (r["pair"], r["merged"], r["cnt"])
            for r in T.bpe_train_merges(spark, "ignored", n_merges=3).collect()
        ]
    finally:
        B.load = orig
        T.load = orig
    want = _py_bpe(words, 3)
    assert got == want
