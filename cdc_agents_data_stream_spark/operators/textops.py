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


# PII patterns kept to syntax valid in BOTH Java regex (Spark) and RE2
# (DuckDB) so the scrub is cross-engine checkable: no backrefs, no
# lookaround, POSIX-safe classes.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    "phone": r"\+[0-9]{7,15}\b",
}


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII redaction (standard pre-training cleanup): replace emails, IPv4
    addresses, and international phone numbers with typed placeholder
    tokens, and count what was removed per document.

    Pure map of regexp kernels — whole-stage codegen, no shuffle, and the
    scan only reads ``text`` plus the id columns the caller kept. At
    100 TB this runs at IO speed; the regex set is ordered so earlier
    redactions cannot create later false positives (emails first — an
    embedded IPv4-ish host part is consumed by the email token)."""
    scrubbed = F.col(text_col)
    counts = []
    for name, pat in PII_PATTERNS.items():
        counts.append(
            F.coalesce(F.regexp_count(scrubbed, F.lit(pat)), F.lit(0))
            .cast("long")
            .alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, f"<{name.upper()}>")
    return df.select(
        "*", *counts, scrubbed.alias("scrubbed")
    )


VOCAB_N_SALTS = 16


def vocab_doc_freq(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n_salts: int = VOCAB_N_SALTS
) -> DataFrame:
    """Corpus vocabulary with document frequency and IDF — the global term
    statistics a tokenizer-training / tf-idf quality step needs.

    Two-level hot-token aggregation: the per-doc ``array_distinct`` means
    every (doc, token) pair occurs exactly once, so doc frequency is a
    plain COUNT — no distinct-aggregate expand. Level 1 counts per
    (token, salt) where the salt is a hash of the doc id (hot tokens
    spread across ``n_salts`` reducers, and map-side partial aggregation
    applies); level 2 sums the ≤``n_salts`` partials per token. The
    heaviest token can no longer pin a single reducer: its level-1 state
    is sharded, and level 2 only merges scalar partials."""
    toks = df.select(
        F.col(id_col), F.explode(F.array_distinct(_toks(text_col))).alias("token")
    ).filter(F.col("token") != "")
    n_docs = df.select(id_col).distinct().count()
    partial = toks.groupBy(
        "token", F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_salts)).alias("salt")
    ).agg(F.count(F.lit(1)).alias("partial_docs"))
    return partial.groupBy("token").agg(
        F.sum("partial_docs").cast("long").alias("doc_freq")
    ).withColumn(
        "idf", F.round(F.log(F.lit(float(n_docs)) / F.col("doc_freq")), 6)
    )


def tfidf_retrieve(
    df: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sparse lexical retrieval: rank documents against a literal term
    query by tf·idf, with idf on a log-free integer grid.

    Scale shape: the token explode is filtered to the query terms
    MAP-SIDE (a literal isin — Catalyst folds it into the scan stage), so
    only (matching doc, term) pairs ever shuffle: the classic inverted-
    index posting-list restriction. Per-term document frequencies are a
    |q|-row artifact joined back by broadcast; the final ranking is a
    TakeOrdered(k), never a full sort.

    Cross-engine exactness: idf_micro = (N·1e6) DIV df (integer division —
    the reciprocal-df surrogate for log idf; monotone in df, which is all
    ranking needs), score = Σ tf·idf_micro exact int64. Ties break on
    ``doc_id``.
    """
    terms = F.array(*[F.lit(t) for t in query_terms])
    hits = (
        df.select(F.col(id_col), F.explode(_toks(text_col)).alias("token"))
        .filter(F.array_contains(terms, F.col("token")))
    )
    tf = hits.groupBy(id_col, "token").agg(F.count(F.lit(1)).alias("tf"))
    n_docs = df.select(id_col).distinct().count()
    dfreq = (
        tf.groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
        .withColumn(
            "idf_micro",
            # true integer division (DIV) — a float divide-then-floor can
            # straddle an integer boundary after rounding
            F.expr(f"CAST({n_docs} AS BIGINT) * 1000000 DIV df"),
        )
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .groupBy(id_col)
        .agg(F.sum(F.col("tf") * F.col("idf_micro")).cast("long").alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def tfidf_retrieve_oracle_sql(
    query_terms: list[str], k: int = 20, table: str = "documents"
) -> str:
    terms = ", ".join(f"'{t}'" for t in query_terms)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM {table}
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks
  WHERE token IN ({terms}) GROUP BY doc_id, token
),
dfreq AS (
  SELECT token, COUNT(*) AS df FROM tf GROUP BY token
),
n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM {table}),
idf AS (
  SELECT token,
         (SELECT n_docs FROM n) * 1000000 // df AS idf_micro
  FROM dfreq
),
scored AS (
  SELECT tf.doc_id, CAST(SUM(tf.tf * idf.idf_micro) AS BIGINT) AS score
  FROM tf JOIN idf USING (token) GROUP BY tf.doc_id
)
SELECT doc_id, score FROM scored
ORDER BY score DESC, doc_id LIMIT {k}
"""


def corpus_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus profile — the quick look a pipeline owner takes
    before sizing a run: doc count, token/byte means and exact
    interpolated percentiles (p50/p90/p99). Single full-scan aggregation,
    partial-agg on the scalar projections; the percentile state is a
    bounded digest per partition. For truly exact percentiles at 100 TB
    swap ``percentile`` for ``percentile_approx`` and accept the epsilon
    (documented trade — profiling rarely needs the exact rank)."""
    toks = F.size(_toks(text_col))
    nbytes = F.octet_length(F.col(text_col))
    return df.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg(toks), 6).alias("mean_tokens"),
        F.round(F.percentile(toks, 0.5), 6).alias("p50_tokens"),
        F.round(F.percentile(toks, 0.9), 6).alias("p90_tokens"),
        F.round(F.percentile(toks, 0.99), 6).alias("p99_tokens"),
        F.round(F.avg(nbytes), 6).alias("mean_bytes"),
        F.round(F.percentile(nbytes, 0.99), 6).alias("p99_bytes"),
    )


def bpe_merge_pair_counts(
    df: DataFrame, top_k: int = 50, text_col: str = "text"
) -> DataFrame:
    """Adjacent-token pair frequencies — the statistic the first BPE merge
    round ranks on (word-level analog). One explode of (size-1) pairs per
    doc, then a count keyed by the pair with map-side partial aggregation;
    the global top-k is a single ordered limit over the (small) distinct
    pair set. Ties break lexicographically so the ranking is
    engine-deterministic.

    The token array is hoisted into its own projection before the indexed
    pair transform: an inline split referenced from the lambda re-runs per
    element under the interpreted HOF path — O(tokens²) per document (see
    operators/dedup._gram_array)."""
    toks = F.col("__toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, (i + 1).cast("int")).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    counted = (
        df.select(_toks(text_col).alias("__toks"))
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("pair_cnt"))
    )
    from pyspark.sql.window import Window

    w = Window.orderBy(F.col("pair_cnt").desc(), F.col("w1").asc(), F.col("w2").asc())
    return (
        counted.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_k)
        .select("rank", "w1", "w2", "pair_cnt")
    )


def collapse_repeat_tokens(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition removal: run-length-collapse consecutive
    duplicate tokens (the cheap boilerplate-scrub step crawl pipelines run
    before near-dup — repeated nav/footer tokens shrink to one).

    Pure map over the token array with an index-aware higher-order filter
    (token i survives when i == 0 or it differs from token i-1) — stays in
    codegen, no shuffle, no Python."""
    toks = _toks(text_col)
    # CASE is lazily evaluated, so element_at never sees index 0 (which is
    # an error under ANSI mode); filter's i is 0-based, element_at 1-based,
    # so element_at(toks, i) IS the previous token.
    kept = F.filter(
        toks,
        lambda x, i: F.when(i == 0, F.lit(True)).otherwise(
            x != F.element_at(toks, i)
        ),
    )
    return df.withColumn("toks_before", F.size(toks).cast("long")).withColumn(
        "toks_after", F.size(kept).cast("long")
    ).withColumn("collapsed", F.array_join(kept, " "))


# --- Model-based quality classifier (hashing trick) ---------------------------

QC_DIM = 1024  # hashed feature buckets


def _qc_weights(n: int = QC_DIM, seed: int = 97) -> list[int]:
    """Deterministic stand-in for a trained linear model: per-bucket integer
    weights in [-1000, 1000] micro-units from the same fixed LCG family the
    minhash/plane constants use. A real model drops in as the same literal
    array — the plan shape doesn't change."""
    out, x = [], seed
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % (2**63)
        out.append((x % 2001) - 1000)
    return out


QC_WEIGHTS = _qc_weights()


def quality_classifier_score(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """fasttext-style linear quality classifier over hashed bag-of-words.

    Each token hashes to one of ``QC_DIM`` buckets (md5 window, the
    engine-portable hash used throughout); the model is a literal weight
    array indexed per token — the broadcast-model shape: at 100 TB the
    weights ride the closure/plan to every executor and scoring is one
    explode + partial-aggregated SUM per doc (single shuffle keyed doc_id).
    Weights are integer micro-units so the score SUM is exact int64
    arithmetic — order-free, hence cross-engine hashable; the normalized
    mean divides two exact integers (IEEE division is deterministic) and
    rounds to 6 decimals. Docs with no tokens score 0 via the left join
    (both engines spell the same COALESCE)."""
    # explicit repartition before the explode+md5 kernel (the `shingles`
    # serialization fix: a 1-partition scan would run it on one core)
    df = df.repartition(
        df.sparkSession.sparkContext.defaultParallelism, F.col(id_col)
    )
    # one ArrayType literal, not CreateArray(1024 exprs): the latter is
    # re-evaluated per row in codegen; a Literal is materialized once
    W = F.lit(QC_WEIGHTS).cast("array<bigint>")
    tok = F.explode(F.filter(_toks(text_col), lambda t: t != "")).alias("tok")
    bucket = (
        F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
        % QC_DIM
    ).cast("int")
    scored = (
        df.select(F.col(id_col), tok)
        .select(F.col(id_col), F.element_at(W, bucket + 1).alias("w"))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_toks"),
            F.sum("w").alias("score_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_toks", F.lit(0)).cast("long").alias("n_toks"),
            F.coalesce("score_micro", F.lit(0)).cast("long").alias("score_micro"),
            F.round(
                F.coalesce("score_micro", F.lit(0))
                / F.greatest(F.coalesce("n_toks", F.lit(0)), F.lit(1)),
                6,
            ).alias("mean_w"),
            (F.coalesce("score_micro", F.lit(0)) >= 0).alias("keep"),
        )
    )


# --- Context-window chunking --------------------------------------------------

CHUNK_TOKENS = 128
CHUNK_STRIDE = 96  # 32-token overlap between consecutive chunks


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-size token chunks — the
    context-window preparation step for embedding/retrieval pipelines
    (chunk k covers tokens [k*stride, k*stride + chunk_tokens)).

    Chunk starts come from a ``sequence`` over the token count, the text
    from ``slice`` + ``concat_ws`` — a pure map-side explode, no shuffle,
    no Python; total fan-out bytes ≈ chunk_tokens/stride × corpus size
    (the overlap factor). The final short chunk is kept iff it starts
    inside the document and contributes at least one new token; documents
    shorter than one chunk yield exactly one chunk."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    # number of chunks: 1 + ceil(max(n - chunk_tokens, 0) / stride), via
    # integer arithmetic shared with the oracle
    n_chunks = (
        F.lit(1)
        + F.floor(
            (F.greatest(n - chunk_tokens, F.lit(0)) + (stride - 1)) / stride
        ).cast("int")
    )
    starts = F.sequence(F.lit(0), n_chunks - 1)
    return (
        df.select(
            F.col(id_col),
            n.cast("long").alias("n_tokens"),
            F.explode(starts).alias("chunk_idx"),
            toks.alias("_toks"),
        )
        .select(
            F.col(id_col),
            "n_tokens",
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            (F.col("chunk_idx") * stride).cast("long").alias("start_tok"),
            F.concat_ws(
                " ",
                F.slice(F.col("_toks"), F.col("chunk_idx") * stride + 1, chunk_tokens),
            ).alias("chunk_text"),
        )
        .withColumn(
            "chunk_tokens",
            F.least(
                F.lit(chunk_tokens).cast("long"),
                F.col("n_tokens") - F.col("start_tok"),
            ),
        )
    )


# --- Text normalization / cleaning -------------------------------------------

# Shared Java-regex ∩ RE2 subset (same discipline as PII_PATTERNS) so the
# DuckDB oracle can run the IDENTICAL patterns.
NORMALIZE_STEPS = (
    # control characters (C0 minus \t\n\r) -> drop
    (r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]", ""),
    # any whitespace run (incl. tabs/newlines) -> single space
    (r"[ \t\r\n]+", " "),
    # leading/trailing space
    (r"^ +| +$", ""),
)


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Canonical text cleanup (the first stage of every crawl pipeline):
    strip control characters, collapse whitespace runs, trim. Chained
    ``regexp_replace`` — codegen map, no shuffle; adds ``clean_text`` and
    ``changed`` (whether cleaning modified the doc)."""
    out = F.col(text_col)
    for pat, rep in NORMALIZE_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return df.withColumn("clean_text", out).withColumn(
        "changed", (F.col("clean_text") != F.col(text_col)).cast("int")
    )
