"""Prefix-filter join correctness: on randomized (seeded) corpora the
candidate pruning must be LOSSLESS — exactly the pairs the full
inverted-index Jaccard finds at the threshold, no false negatives."""

from __future__ import annotations

import random

import pytest

from cdc_agents_data_stream_spark.operators import dedup as D


def _corpus(seed: int, n_docs: int = 40) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(n_docs):
        n = rng.randint(5, 14)
        docs.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # inject guaranteed near-dups: append ONE token — a replacement can
    # kill up to 3 shingles (J drops below 0.7 on short docs), while an
    # append keeps J = s/(s+1) >= 0.75 for s >= 3 shingles
    for i in range(n_docs, n_docs + 8):
        base = list(docs[i - n_docs][1].split())
        base.append(rng.choice(vocab))
        docs.append((i, " ".join(base)))
    return docs


@pytest.mark.parametrize("seed", [11, 23, 57])
def test_prefix_filter_equals_exact_jaccard(spark, seed):
    df = spark.createDataFrame(_corpus(seed), "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.prefix_filter_pairs(df, threshold=0.7).collect()
    }
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in D.ngram_jaccard_pairs(df, threshold=0.7, exact=True).collect()
    }
    assert got == exact
    # the injected edits guarantee the comparison is not vacuous
    assert len(exact) >= 1
