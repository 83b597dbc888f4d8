"""Text-analysis operators for training-data pipelines: token stats,
language ID, quality scoring, and document fingerprinting.

All kernels are JVM-side Column expressions (split / higher-order
functions / regexp), so they stay inside whole-stage codegen — no Python in
the hot path. Language ID is the classic stopword-voting heuristic;
fingerprints are md5 of the sorted distinct token set plus a min-token-hash
(a 1-permutation MinHash), both engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "y", "que", "los", "un"],
    "de": ["der", "die", "das", "und", "zu", "ist", "ein"],
    "fr": ["le", "la", "de", "et", "les", "un", "est"],
}
LANG_ORDER = ["en", "es", "de", "fr"]  # deterministic argmax tiebreak


def _toks(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def _stop_hits(toks, lang: str):
    """Occurrence count (not distinct) of the language's stopwords."""
    arr = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))


def token_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = _toks(text_col)
    total_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("token_cnt"),
        F.size(F.array_distinct(toks)).cast("long").alias("uniq_token_cnt"),
        F.round(total_chars / F.size(toks), 4).alias("avg_token_len"),
        F.length(text_col).cast("long").alias("char_cnt"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = _toks(text_col)
    scores = {lang: _stop_hits(toks, lang).alias(f"hits_{lang}") for lang in LANG_ORDER}
    scored = df.select(F.col(id_col), F.col("lang").alias("labeled_lang"), *scores.values())
    pred = (
        F.when(
            (F.col("hits_en") >= F.col("hits_es"))
            & (F.col("hits_en") >= F.col("hits_de"))
            & (F.col("hits_en") >= F.col("hits_fr")),
            "en",
        )
        .when((F.col("hits_es") >= F.col("hits_de")) & (F.col("hits_es") >= F.col("hits_fr")), "es")
        .when(F.col("hits_de") >= F.col("hits_fr"), "de")
        .otherwise("fr")
    )
    return scored.select(
        id_col,
        "labeled_lang",
        *[F.col(f"hits_{lang}").cast("long").alias(f"hits_{lang}") for lang in LANG_ORDER],
        pred.alias("pred_lang"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = _toks(text_col)
    en = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(en, t)))
    non_alpha = F.length(F.regexp_replace(F.col(text_col), "[a-z ]", ""))
    token_cnt = F.size(toks)
    return df.select(
        F.col(id_col),
        token_cnt.cast("long").alias("token_cnt"),
        F.round(stop_cnt / token_cnt, 4).alias("stopword_ratio"),
        F.round(non_alpha / F.length(text_col), 4).alias("punct_ratio"),
        (
            (token_cnt >= 10)
            & (token_cnt <= 2000)
            & (stop_cnt / token_cnt > 0.01)
        )
        .cast("int")
        .alias("quality_ok"),
    )


def fingerprints(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    toks = _toks(text_col)
    sorted_uniq = F.array_sort(F.array_distinct(toks))
    min_tok_hash = F.array_min(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long"),
        )
    )
    return df.select(
        F.col(id_col),
        F.md5(F.array_join(sorted_uniq, " ")).alias("set_fingerprint"),
        min_tok_hash.alias("min_token_hash"),
    )


def subword_token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """BPE-ish token-count proxy: whitespace tokens + ceil(len/4) subword
    chunks per token (deterministic, engine-reproducible)."""
    toks = _toks(text_col)
    subwords = F.aggregate(
        F.transform(toks, lambda t: F.ceil(F.length(t) / 4).cast("long")),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("ws_token_cnt"),
        subwords.alias("subword_cnt"),
    )
