"""Declared text-analysis queries over ``documents`` with DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import textops as T
from .base import Q, load


def _sql_set(lang: str) -> str:
    return "[" + ", ".join(f"'{w}'" for w in T.STOPWORDS[lang]) + "]"


def text_token_stats(spark, sf_dir):
    return T.token_stats(load(spark, sf_dir, "documents"))


TEXT_TOKEN_STATS_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks, text FROM documents)
SELECT doc_id,
       len(toks) AS token_cnt,
       len(list_distinct(toks)) AS uniq_token_cnt,
       ROUND(list_sum(list_transform(toks, x -> length(x))) / len(toks), 4) AS avg_token_len,
       length(text) AS char_cnt
FROM t
"""


def text_lang_id(spark, sf_dir):
    return T.lang_id(load(spark, sf_dir, "documents"))


TEXT_LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang AS labeled_lang,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('en')}, x))) AS hits_en,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('es')}, x))) AS hits_es,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('de')}, x))) AS hits_de,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('fr')}, x))) AS hits_fr
  FROM documents
)
SELECT doc_id, labeled_lang, hits_en, hits_es, hits_de, hits_fr,
       CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
            WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
            WHEN hits_de >= hits_fr THEN 'de'
            ELSE 'fr' END AS pred_lang
FROM t
"""


def text_quality_score(spark, sf_dir):
    return T.quality_score(load(spark, sf_dir, "documents"))


TEXT_QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('en')}, x))) AS stop_cnt,
         length(regexp_replace(text, '[a-z ]', '', 'g')) AS non_alpha
  FROM documents
)
SELECT doc_id,
       len(toks) AS token_cnt,
       ROUND(stop_cnt / len(toks), 4) AS stopword_ratio,
       ROUND(non_alpha / length(text), 4) AS punct_ratio,
       CAST(len(toks) >= 10 AND len(toks) <= 2000 AND stop_cnt / len(toks) > 0.01 AS INT) AS quality_ok
FROM t
"""


def doc_fingerprint(spark, sf_dir):
    return T.fingerprints(load(spark, sf_dir, "documents"))


DOC_FINGERPRINT_SQL = """
WITH t AS (SELECT doc_id, list_distinct(string_split(text, ' ')) AS uniq FROM documents)
SELECT doc_id,
       md5(array_to_string(list_sort(uniq), ' ')) AS set_fingerprint,
       list_min(list_transform(uniq, x -> CAST('0x' || substr(md5(x), 1, 15) AS BIGINT))) AS min_token_hash
FROM t
"""


def token_count_bpe(spark, sf_dir):
    return T.subword_token_count(load(spark, sf_dir, "documents"))


TOKEN_COUNT_BPE_SQL = """
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
SELECT doc_id,
       len(toks) AS ws_token_cnt,
       CAST(list_sum(list_transform(toks, x -> CAST(ceil(length(x) / 4.0) AS BIGINT))) AS BIGINT) AS subword_cnt
FROM t
"""


def training_prep_pipeline(spark, sf_dir):
    """Composite end-to-end training-data prep, the shape a 100 TB corpus
    job runs: exact-dedup keeper selection → quality gate → per-language
    corpus stats, composed as ONE declarative plan (dedup agg + semi-join
    + quality exprs + final agg; Catalyst fuses the scalar work into the
    scans). The headline ratio derives from integer sums, so float
    summation order cannot break cross-engine parity."""
    from pyspark.sql import functions as F

    from ..operators import dedup as D

    docs = load(spark, sf_dir, "documents")
    keepers = D.exact_dup_groups(docs).select(F.col("keeper_doc_id").alias("doc_id"))
    kept = docs.join(keepers, "doc_id", "left_semi")
    # Quality columns fused into ONE projection over kept. The previous
    # composition joined quality_score(kept) back onto a SECOND derivation
    # of kept on doc_id — a corpus-scale self-join (two extra scans of the
    # corpus and a full shuffle of every kept row) that computed exactly
    # these expressions: token_cnt/stop_cnt/quality_ok below are literally
    # quality_score's formulas (_toks == split(text, ' ') — the stop set and
    # the 10..2000 ∧ ratio>0.01 gate are shared), so the fused plan is
    # value-identical while the scan count drops 4 -> 2 and the doc_id
    # exchange disappears.
    stop_set = F.array(*[F.lit(w) for w in T.STOPWORDS["en"]])
    toks = F.split(F.col("text"), " ")
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop_set, t)))
    token_cnt = F.size(toks)
    quality_ok = (
        (token_cnt >= 10)
        & (token_cnt <= 2000)
        & (stop_cnt / token_cnt > 0.01)
    ).cast("int")
    enriched = kept.select(
        "lang",
        token_cnt.cast("long").alias("token_cnt"),
        stop_cnt.cast("long").alias("stop_cnt"),
        quality_ok.alias("quality_ok"),
    )
    return (
        enriched.filter(F.col("quality_ok") == 1)
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("token_cnt").cast("bigint").alias("total_tokens"),
            F.sum("stop_cnt").cast("bigint").alias("total_stopwords"),
            F.round(F.sum("stop_cnt") / F.sum("token_cnt"), 6).alias("stopword_ratio"),
        )
    )


TRAINING_PREP_PIPELINE_SQL = f"""
WITH keepers AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
),
kept AS (SELECT d.* FROM documents d JOIN keepers k USING (doc_id)),
q AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS token_cnt,
         len(list_filter(string_split(text, ' '), x -> list_contains({_sql_set('en')}, x))) AS stop_cnt
  FROM kept
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(token_cnt) AS BIGINT) AS total_tokens,
       CAST(SUM(stop_cnt) AS BIGINT) AS total_stopwords,
       ROUND(CAST(SUM(stop_cnt) AS DOUBLE) / SUM(token_cnt), 6) AS stopword_ratio
FROM q
WHERE token_cnt BETWEEN 10 AND 2000 AND stop_cnt / CAST(token_cnt AS DOUBLE) > 0.01
GROUP BY lang
"""


def pii_scrub_stats(spark, sf_dir):
    """PII redaction under the gate (operators/textops.py::scrub_pii): the
    corpus text is salted with deterministic synthetic PII — every doc an
    email, every 3rd an IPv4, every 5th an international phone — then the
    scrubber runs and per-language totals are emitted, including the
    residual count of '@' in the scrubbed text (must be 0). The oracle
    runs the SAME patterns through DuckDB's RE2, which is why the pattern
    set is restricted to dialect-shared syntax (see PII_PATTERNS)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    did = F.col("doc_id")
    salted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit(" u"), did.cast("string"), F.lit("@example.com"),
            F.when(
                did % 3 == 0,
                F.concat(F.lit(" 10.0."), (did % 200).cast("string"), F.lit(".7")),
            ).otherwise(F.lit("")),
            F.when(
                did % 5 == 0,
                F.concat(F.lit(" +14155550"), F.lpad((did % 100).cast("string"), 2, "0")),
            ).otherwise(F.lit("")),
        ),
    )
    scrubbed = T.scrub_pii(salted)
    return scrubbed.groupBy("lang").agg(
        F.sum("n_email").cast("long").alias("emails"),
        F.sum("n_ipv4").cast("long").alias("ips"),
        F.sum("n_phone").cast("long").alias("phones"),
        F.sum(F.col("scrubbed").contains("@").cast("int")).cast("long").alias("residual_at"),
        F.sum((F.col("n_email") > 0).cast("int")).cast("long").alias("docs_hit"),
    )


PII_SCRUB_STATS_SQL = r"""
WITH salted AS (
  SELECT lang,
         text || ' u' || CAST(doc_id AS VARCHAR) || '@example.com'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' 10.0.' || CAST(doc_id % 200 AS VARCHAR) || '.7'
                      ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                      THEN ' +14155550' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                      ELSE '' END AS text
  FROM documents
), counted AS (
  SELECT lang,
         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email,
         len(regexp_extract_all(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ipv4,
         len(regexp_extract_all(
             regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\+[0-9]{7,15}\b')) AS n_phone
  FROM salted
)
SELECT lang,
       CAST(SUM(n_email) AS BIGINT) AS emails,
       CAST(SUM(n_ipv4) AS BIGINT) AS ips,
       CAST(SUM(n_phone) AS BIGINT) AS phones,
       CAST(0 AS BIGINT) AS residual_at,
       CAST(SUM(CASE WHEN n_email > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_hit
FROM counted
GROUP BY lang
"""


def repeat_collapse_stats(spark, sf_dir):
    """Boilerplate collapse under the gate
    (operators/textops.py::collapse_repeat_tokens): every doc is salted
    with a run of ``doc_id % 4 + 2`` copies of a marker token; the
    collapse must shrink each run to one survivor (plus any natural
    consecutive repeats, which the oracle reproduces by running the same
    run-length rule in SQL)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    reps = (F.col("doc_id") % 4 + 2).cast("int")
    salted = docs.withColumn(
        "text",
        F.concat(
            F.col("text"), F.lit(" "), F.array_join(F.array_repeat(F.lit("rep"), reps), " ")
        ),
    )
    out = T.collapse_repeat_tokens(salted)
    return out.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("toks_before").cast("long").alias("before"),
        F.sum("toks_after").cast("long").alias("after"),
        F.sum((F.col("collapsed").endswith(" rep") | (F.col("collapsed") == "rep")).cast("int"))
        .cast("long")
        .alias("n_tail_ok"),
    )


REPEAT_COLLAPSE_STATS_SQL = """
WITH salted AS (
  SELECT lang,
         string_split(text || ' ' ||
             array_to_string(list_transform(range(1, CAST(doc_id % 4 + 2 AS INT) + 1),
                                            i -> 'rep'), ' '),
             ' ') AS t
  FROM documents
), collapsed AS (
  SELECT lang, len(t) AS toks_before,
         list_filter(list_transform(range(1, len(t) + 1),
                                    i -> CASE WHEN i = 1 OR t[i] <> t[i-1]
                                              THEN t[i] END),
                     x -> x IS NOT NULL) AS kept
  FROM salted
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(toks_before) AS BIGINT) AS before,
       CAST(SUM(len(kept)) AS BIGINT) AS after,
       CAST(SUM(CASE WHEN kept[len(kept)] = 'rep' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_tail_ok
FROM collapsed
GROUP BY lang
"""


def vocab_idf_topk(spark, sf_dir):
    """Corpus vocabulary head (operators/textops.py::vocab_doc_freq): the
    100 highest-document-frequency tokens with their IDF — the global
    term-statistics step of tokenizer training / tf-idf quality scoring.
    The limit runs as TakeOrdered (per-partition top-100 + driver merge)."""
    from pyspark.sql import functions as F

    vocab = T.vocab_doc_freq(load(spark, sf_dir, "documents"))
    return (
        vocab.orderBy(F.col("doc_freq").desc(), F.col("token"))
        .limit(100)
        .select("token", "doc_freq", "idf")
    )


VOCAB_IDF_TOPK_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
df AS (
  SELECT token, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS doc_freq
  FROM toks WHERE token <> '' GROUP BY token
)
SELECT token, doc_freq,
       ROUND(LN(CAST((SELECT n_docs FROM n) AS DOUBLE) / doc_freq), 6) AS idf
FROM df
ORDER BY doc_freq DESC, token
LIMIT 100
"""


def corpus_profile_stats(spark, sf_dir):
    """One-row corpus profile (operators/textops.py::corpus_profile):
    count, token/byte means, exact interpolated percentiles."""
    return T.corpus_profile(load(spark, sf_dir, "documents"))


CORPUS_PROFILE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(len(string_split(text, ' '))), 6) AS mean_tokens,
       ROUND(quantile_cont(len(string_split(text, ' ')), 0.5), 6) AS p50_tokens,
       ROUND(quantile_cont(len(string_split(text, ' ')), 0.9), 6) AS p90_tokens,
       ROUND(quantile_cont(len(string_split(text, ' ')), 0.99), 6) AS p99_tokens,
       ROUND(AVG(strlen(text)), 6) AS mean_bytes,
       ROUND(quantile_cont(strlen(text), 0.99), 6) AS p99_bytes
FROM documents
"""


def bpe_pair_counts(spark, sf_dir):
    """Top-50 adjacent-token pair frequencies
    (operators/textops.py::bpe_merge_pair_counts) — the first BPE merge
    round's ranking statistic."""
    return T.bpe_merge_pair_counts(load(spark, sf_dir, "documents"), top_k=50)


BPE_PAIR_COUNTS_SQL = """
WITH t AS (SELECT string_split(text, ' ') AS t FROM documents),
p AS (
  SELECT t[g.i] AS w1, t[g.i + 1] AS w2
  FROM t, UNNEST(range(1, len(t))) AS g(i)
),
c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS pair_cnt FROM p GROUP BY w1, w2)
SELECT * FROM (
  SELECT CAST(ROW_NUMBER() OVER (ORDER BY pair_cnt DESC, w1, w2) AS BIGINT) AS rank,
         w1, w2, pair_cnt
  FROM c
) WHERE rank <= 50
"""


def quality_classifier(spark, sf_dir):
    """Model-based quality scoring (operators/textops.py::
    quality_classifier_score): hashed bag-of-words, literal broadcast
    weight array, exact integer score sums."""
    return T.quality_classifier_score(load(spark, sf_dir, "documents"))


_QC_WLIST = "[" + ", ".join(str(w) for w in T.QC_WEIGHTS) + "]::BIGINT[]"

QUALITY_CLASSIFIER_SQL = f"""
WITH wl AS (SELECT {_QC_WLIST} AS w),
toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tw AS (
  SELECT doc_id,
         w[CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {T.QC_DIM} AS INT) + 1] AS wt
  FROM toks, wl WHERE tok <> ''
),
sc AS (
  SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM(wt) AS BIGINT) AS score_micro
  FROM tw GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(n_toks, 0) AS n_toks,
       COALESCE(score_micro, 0) AS score_micro,
       ROUND(COALESCE(score_micro, 0) / GREATEST(COALESCE(n_toks, 0), 1), 6) AS mean_w,
       COALESCE(score_micro, 0) >= 0 AS keep
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def chunk_documents_q(spark, sf_dir):
    """Context-window chunking (operators/textops.py::chunk_documents):
    128-token chunks at stride 96 (32-token overlap), pure map-side
    explode."""
    return T.chunk_documents(load(spark, sf_dir, "documents"))


CHUNK_DOCUMENTS_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
base AS (SELECT doc_id, len(t) AS n, t FROM toks),
chunks AS (
  SELECT doc_id, CAST(n AS BIGINT) AS n_tokens, t,
         unnest(range(0, 1 + CAST(floor((greatest(n - {T.CHUNK_TOKENS}, 0)
                                         + {T.CHUNK_STRIDE - 1})
                                        / {T.CHUNK_STRIDE}) AS INT))) AS chunk_idx
  FROM base
)
SELECT doc_id, n_tokens,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(chunk_idx * {T.CHUNK_STRIDE} AS BIGINT) AS start_tok,
       array_to_string(t[chunk_idx * {T.CHUNK_STRIDE} + 1
                         : chunk_idx * {T.CHUNK_STRIDE} + {T.CHUNK_TOKENS}],
                       ' ') AS chunk_text,
       LEAST({T.CHUNK_TOKENS}, n_tokens - chunk_idx * {T.CHUNK_STRIDE})
         AS chunk_tokens
FROM chunks
"""


def text_normalize_q(spark, sf_dir):
    """Cleaning normalization (operators/textops.py::normalize_text). The
    lake docs are already clean, so the gate ALSO runs the cleaner over a
    deliberately dirtied copy (leading space, double space, trailing tab +
    BEL control char) — verifying idempotence on clean input and every
    rule on dirty input."""
    docs = load(spark, sf_dir, "documents")
    clean = T.normalize_text(docs).select(
        "doc_id",
        F.md5("clean_text").alias("clean_md5"),
        F.col("changed").alias("changed_raw"),
    )
    dirty = T.normalize_text(
        docs.withColumn("text", F.concat(F.lit(" "), F.col("text"), F.lit("  tail\t\x07"))),
    ).select(
        "doc_id",
        F.md5("clean_text").alias("dirty_clean_md5"),
        F.col("changed").alias("changed_dirty"),
    )
    return clean.join(dirty, "doc_id")


TEXT_NORMALIZE_SQL = """
WITH cleaned AS (
  SELECT doc_id, text,
         regexp_replace(regexp_replace(regexp_replace(text,
             '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
             '[ \\t\\r\\n]+', ' ', 'g'),
             '^ +| +$', '', 'g') AS clean_text
  FROM documents
),
dirtied AS (
  SELECT doc_id, d_text,
         regexp_replace(regexp_replace(regexp_replace(d_text,
             '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
             '[ \\t\\r\\n]+', ' ', 'g'),
             '^ +| +$', '', 'g') AS clean_text
  FROM (SELECT doc_id, ' ' || text || '  tail' || chr(9) || chr(7) AS d_text
        FROM documents)
)
SELECT c.doc_id,
       md5(c.clean_text) AS clean_md5,
       CAST(c.clean_text <> c.text AS INT) AS changed_raw,
       md5(d.clean_text) AS dirty_clean_md5,
       CAST(d.clean_text <> d.d_text AS INT) AS changed_dirty
FROM cleaned c JOIN dirtied d USING (doc_id)
"""


def quality_percentile_filter(spark, sf_dir):
    """Relative quality filtering: keep docs scoring at or above their
    language's P25 of the classifier mean — thresholds adapt per domain
    instead of one global cutoff (the practice for multilingual corpora,
    where absolute score scales differ by language). Exact interpolated
    percentile (Spark ``percentile`` ≡ DuckDB ``quantile_cont``), rounded
    before the comparison so the keep decision is engine-stable."""
    docs = load(spark, sf_dir, "documents")
    scored = T.quality_classifier_score(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    thr = scored.groupBy("lang").agg(
        F.round(F.expr("percentile(mean_w, 0.25)"), 5).alias("lang_p25")
    )
    return scored.join(F.broadcast(thr), "lang").select(
        "doc_id",
        "lang",
        "mean_w",
        "lang_p25",
        (F.col("mean_w") >= F.col("lang_p25")).alias("kept"),
    )


QUALITY_PERCENTILE_FILTER_SQL = f"""
WITH sc AS (SELECT * FROM ({QUALITY_CLASSIFIER_SQL}) q),
jl AS (
  SELECT s.doc_id, d.lang, s.mean_w FROM sc s JOIN documents d USING (doc_id)
),
thr AS (
  SELECT lang, ROUND(quantile_cont(mean_w, 0.25), 5) AS lang_p25
  FROM jl GROUP BY lang
)
SELECT j.doc_id, j.lang, j.mean_w, t.lang_p25,
       j.mean_w >= t.lang_p25 AS kept
FROM jl j JOIN thr t USING (lang)
"""


def corpus_build_pipeline(spark, sf_dir):
    """Round-3 capstone composition — the corpus build a training run
    actually executes, as ONE declarative chain: normalize → exact-dedup
    keepers → model-based quality gate → temperature domain mixing →
    per-language funnel counts. Every stage is an already-gated operator;
    this query pins that they COMPOSE (column contracts, no stage breaks
    another's determinism)."""
    from ..operators import dedup as D
    from ..operators import sampling as SA

    docs = load(spark, sf_dir, "documents")
    cleaned = T.normalize_text(docs).select(
        "doc_id", "lang", F.col("clean_text").alias("text")
    )
    keepers = D.exact_dup_groups(cleaned).select(
        F.col("keeper_doc_id").alias("doc_id")
    )
    kept = cleaned.join(keepers, "doc_id", "left_semi")
    scored = T.quality_classifier_score(kept).select("doc_id", "score_micro")
    quality = kept.join(scored, "doc_id").filter(F.col("score_micro") >= 0)
    mixed = SA.temperature_mix(
        quality.select("doc_id", "lang"), alpha=0.5, strata_col="lang", salt="t1"
    )

    def per_lang(df, name):
        return df.groupBy("lang").agg(F.count("*").cast("long").alias(name))

    return (
        per_lang(docs, "n_docs")
        .join(per_lang(kept, "n_unique"), "lang", "left")
        .join(per_lang(quality, "n_quality"), "lang", "left")
        .join(per_lang(mixed, "n_mixed"), "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
            F.coalesce("n_mixed", F.lit(0)).cast("long").alias("n_mixed"),
        )
    )


_CLEAN_EXPR = (
    "regexp_replace(regexp_replace(regexp_replace(text,"
    " '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),"
    " '[ \\t\\r\\n]+', ' ', 'g'),"
    " '^ +| +$', '', 'g')"
)

CORPUS_BUILD_PIPELINE_SQL = f"""
WITH cleaned AS (
  SELECT doc_id, lang, {_CLEAN_EXPR} AS ct FROM documents
),
keepers AS (SELECT MIN(doc_id) AS doc_id FROM cleaned GROUP BY md5(ct)),
kept AS (SELECT c.* FROM cleaned c JOIN keepers k USING (doc_id)),
wl AS (SELECT {_QC_WLIST} AS w),
toks AS (SELECT doc_id, unnest(string_split(ct, ' ')) AS tok FROM kept),
tw AS (
  SELECT doc_id,
         w[CAST(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) % {T.QC_DIM} AS INT) + 1] AS wt
  FROM toks, wl WHERE tok <> ''
),
sc AS (SELECT doc_id, CAST(SUM(wt) AS BIGINT) AS score FROM tw GROUP BY doc_id),
quality AS (
  SELECT k.doc_id, k.lang FROM kept k LEFT JOIN sc USING (doc_id)
  WHERE COALESCE(sc.score, 0) >= 0
),
qc AS (SELECT lang, COUNT(*) AS n_dom FROM quality GROUP BY lang),
qt AS (
  SELECT lang, n_dom, SUM(n_dom) OVER () AS n_total,
         CAST(ROUND(sqrt(n_dom / (SUM(n_dom) OVER ())) * 1e6) AS BIGINT) AS w_micro
  FROM qc
),
qr AS (
  SELECT lang, n_dom,
         LEAST(CAST(ROUND((w_micro / (SUM(w_micro) OVER ())) * n_total / n_dom * 1e6)
                    AS BIGINT), 1000000) AS rate_micro
  FROM qt
),
mixed AS (
  SELECT q.doc_id, q.lang
  FROM quality q JOIN qr USING (lang)
  WHERE CAST('0x' || substr(md5(CAST(q.doc_id AS VARCHAR) || ':t1'), 1, 15) AS BIGINT)
          % 1000000 < qr.rate_micro
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(COALESCE(ku.n, 0) AS BIGINT) AS n_unique,
       CAST(COALESCE(qu.n, 0) AS BIGINT) AS n_quality,
       CAST(COALESCE(mx.n, 0) AS BIGINT) AS n_mixed
FROM documents d
LEFT JOIN (SELECT lang, COUNT(*) AS n FROM kept GROUP BY lang) ku USING (lang)
LEFT JOIN (SELECT lang, COUNT(*) AS n FROM quality GROUP BY lang) qu USING (lang)
LEFT JOIN (SELECT lang, COUNT(*) AS n FROM mixed GROUP BY lang) mx USING (lang)
GROUP BY d.lang, ku.n, qu.n, mx.n
"""


QUERIES = {
    "text_token_stats": Q(text_token_stats, TEXT_TOKEN_STATS_SQL, "token statistics"),
    "corpus_build_pipeline": Q(
        corpus_build_pipeline,
        CORPUS_BUILD_PIPELINE_SQL,
        "normalize→dedup→quality→mix corpus funnel",
    ),
    "chunk_documents": Q(
        chunk_documents_q, CHUNK_DOCUMENTS_SQL, "overlapping context-window chunking"
    ),
    "text_normalize": Q(
        text_normalize_q, TEXT_NORMALIZE_SQL, "control-char/whitespace normalization"
    ),
    "quality_classifier": Q(
        quality_classifier,
        QUALITY_CLASSIFIER_SQL,
        "hashed bag-of-words linear quality classifier",
    ),
    "quality_percentile_filter": Q(
        quality_percentile_filter,
        QUALITY_PERCENTILE_FILTER_SQL,
        "per-language P25 relative quality filter",
    ),
    "corpus_profile_stats": Q(
        corpus_profile_stats, CORPUS_PROFILE_SQL, "corpus length/token percentiles profile"
    ),
    "bpe_pair_counts": Q(
        bpe_pair_counts, BPE_PAIR_COUNTS_SQL, "adjacent-pair counts (BPE merge round 1)"
    ),
    "pii_scrub_stats": Q(pii_scrub_stats, PII_SCRUB_STATS_SQL, "PII redaction counts"),
    "repeat_collapse_stats": Q(
        repeat_collapse_stats, REPEAT_COLLAPSE_STATS_SQL, "run-length boilerplate collapse"
    ),
    "vocab_idf_topk": Q(vocab_idf_topk, VOCAB_IDF_TOPK_SQL, "corpus vocabulary head + IDF"),
    "training_prep_pipeline": Q(
        training_prep_pipeline, TRAINING_PREP_PIPELINE_SQL, "dedup+quality+stats composite"
    ),
    "text_lang_id": Q(text_lang_id, TEXT_LANG_ID_SQL, "stopword-voting language ID"),
    "text_quality_score": Q(text_quality_score, TEXT_QUALITY_SCORE_SQL, "quality flags"),
    "doc_fingerprint": Q(doc_fingerprint, DOC_FINGERPRINT_SQL, "set fingerprint + min-hash"),
    "token_count_bpe": Q(token_count_bpe, TOKEN_COUNT_BPE_SQL, "BPE-ish token count"),
}


def tfidf_retrieval_topk(spark, sf_dir):
    """Sparse lexical retrieval (operators/textops.py::tfidf_retrieve):
    rank documents against a 4-term query by tf·idf with the log-free
    integer-grid idf. The explode is filtered to the query terms map-side
    — only posting-list rows shuffle, the inverted-index restriction that
    makes lexical retrieval tractable at lake scale."""
    docs = load(spark, sf_dir, "documents")
    return T.tfidf_retrieve(docs, ["vector", "merge", "stream", "window"], k=20)


TFIDF_RETRIEVAL_TOPK_SQL = T.tfidf_retrieve_oracle_sql(
    ["vector", "merge", "stream", "window"], k=20
)

QUERIES["tfidf_retrieval_topk"] = Q(
    tfidf_retrieval_topk,
    TFIDF_RETRIEVAL_TOPK_SQL,
    "sparse tf-idf ranked retrieval with integer-grid idf",
)


def ngram_lm_topnext(spark, sf_dir):
    """Distributed bigram language-model estimation — the counting side
    of LM-based corpus scoring: per-context next-token counts, maximum-
    likelihood conditional probability on the ppm integer grid
    (p = cnt·10⁶ DIV ctx — no float division), and the top-3 next tokens
    per context (row_number over cnt DESC, token ASC). Bigrams are built
    map-side by zipping each doc's token array with its own tail (no
    self-join, no python); one partial-agg groupBy does the counting, so
    shuffle volume is bounded by the distinct-bigram vocabulary, not the
    corpus."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select(F.split("text", " ").alias("toks"))
    z = d.select(
        F.explode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks)-1)").alias("w1"),
                F.expr("slice(toks, 2, size(toks)-1)").alias("w2"),
            )
        ).alias("p")
    ).select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = z.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("cnt"))
    ctx = bg.groupBy("w1").agg(F.sum("cnt").cast("long").alias("ctx_cnt"))
    from pyspark.sql import Window

    w = Window.partitionBy("w1").orderBy(F.col("cnt").desc(), F.col("w2"))
    return (
        bg.join(ctx, "w1")
        .filter(F.col("ctx_cnt") >= 20)
        .withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select(
            "w1",
            "w2",
            "cnt",
            "ctx_cnt",
            F.expr("(cnt * 1000000) DIV ctx_cnt").cast("long").alias("p_ppm"),
            "rnk",
        )
        .orderBy("w1", "rnk")
    )


NGRAM_LM_TOPNEXT_SQL = """
WITH d AS (SELECT string_split(text, ' ') AS toks FROM documents),
idx AS (SELECT toks, unnest(range(1, len(toks))) AS i FROM d),
bg0 AS (SELECT toks[i] AS w1, toks[i+1] AS w2 FROM idx),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM bg0 GROUP BY w1, w2),
cx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt FROM bg GROUP BY w1),
r AS (
  SELECT bg.w1, bg.w2, bg.cnt, cx.ctx_cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY bg.w1
                                 ORDER BY bg.cnt DESC, bg.w2) AS BIGINT) AS rnk
  FROM bg JOIN cx USING (w1) WHERE cx.ctx_cnt >= 20
)
SELECT w1, w2, cnt, ctx_cnt,
       CAST((cnt * 1000000) // ctx_cnt AS BIGINT) AS p_ppm, rnk
FROM r WHERE rnk <= 3 ORDER BY w1, rnk
"""

QUERIES["ngram_lm_topnext"] = Q(
    ngram_lm_topnext,
    NGRAM_LM_TOPNEXT_SQL,
    "bigram LM counts: ppm conditional probabilities and top-3 next tokens per context",
)


def token_cooccurrence_pmi(spark, sf_dir):
    """Document-level token co-occurrence with a PMI-style association
    ratio on the ppm integer grid: ratio = P(a,b)/(P(a)P(b)) computed as
    (c_ab·N·10⁶) DIV (c_a·c_b) over presence counts — log-free (libm is
    not cross-engine deterministic), order-free, exact. Pair generation
    is a per-doc self-join of the DISTINCT-token table, so fan-out is
    bounded by vocabulary² per doc, not tokens²; counting is one
    partial-agg groupBy. The association signal behind phrase mining and
    stopword-pair screening."""
    docs = load(spark, sf_dir, "documents")
    toks = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
        .localCheckpoint()  # consumed by the pair join (twice) + unigrams
    )
    n_docs = docs.count()
    uni = toks.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    a, b = toks.alias("a"), toks.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.tok") < F.col("b.tok")),
        )
        .groupBy(F.col("a.tok").alias("tok_a"), F.col("b.tok").alias("tok_b"))
        .agg(F.count("*").cast("long").alias("c_ab"))
        .filter(F.col("c_ab") >= 20)
    )
    return (
        pairs.join(uni.select(F.col("tok").alias("tok_a"), F.col("df").alias("c_a")), "tok_a")
        .join(uni.select(F.col("tok").alias("tok_b"), F.col("df").alias("c_b")), "tok_b")
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            F.expr(f"(c_ab * {n_docs}L * 1000000L) DIV (c_a * c_b)")
            .cast("long")
            .alias("assoc_ppm"),
        )
        .orderBy("tok_a", "tok_b")
    )


TOKEN_COOCCURRENCE_PMI_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
n AS (SELECT COUNT(*) AS n FROM documents),
uni AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM toks GROUP BY tok),
pairs AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM toks a JOIN toks b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY a.tok, b.tok
  HAVING COUNT(*) >= 20
)
SELECT p.tok_a, p.tok_b, p.c_ab,
       ua.df AS c_a, ub.df AS c_b,
       CAST((p.c_ab * (SELECT n FROM n) * 1000000) // (ua.df * ub.df) AS BIGINT) AS assoc_ppm
FROM pairs p
JOIN uni ua ON ua.tok = p.tok_a
JOIN uni ub ON ub.tok = p.tok_b
ORDER BY p.tok_a, p.tok_b
"""

QUERIES["token_cooccurrence_pmi"] = Q(
    token_cooccurrence_pmi,
    TOKEN_COOCCURRENCE_PMI_SQL,
    "doc-level token co-occurrence with ppm PMI-style association ratio",
)


def trending_tokens_daily(spark, sf_dir):
    """Per-day trending terms over event types — the daily top-k rank
    shape every content dashboard runs: events bucketed to epoch days,
    counted per (day, type), top-3 per day by (count DESC, type ASC). The
    rank is a per-day window over an already partially-aggregated input,
    so the sort operand is days × types, not raw events."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select(
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).cast("long").alias("day"),
        "event_type",
    )
    counts = ev.groupBy("day", "event_type").agg(
        F.count("*").cast("long").alias("n")
    )
    w = Window.partitionBy("day").orderBy(F.col("n").desc(), F.col("event_type"))
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("day", "rnk", "event_type", "n")
        .orderBy("day", "rnk")
    )


TRENDING_TOKENS_DAILY_SQL = """
WITH c AS (
  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
         event_type, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
)
SELECT day, rnk, event_type, n FROM (
  SELECT day, event_type, n,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY day ORDER BY n DESC, event_type ASC) AS BIGINT) AS rnk
  FROM c
) WHERE rnk <= 3
ORDER BY day, rnk
"""

QUERIES["trending_tokens_daily"] = Q(
    trending_tokens_daily,
    TRENDING_TOKENS_DAILY_SQL,
    "per-day top-3 trending types over pre-aggregated counts",
)


def doc_keywords_tfidf(spark, sf_dir):
    """Per-document keyword extraction: top-3 tokens by tf·idf on the
    integer grid (tf = in-doc count; idf_micro = N·10⁶ DIV df, the same
    log-free grid the retrieval gate uses) — the metadata-tagging step
    of corpus curation. Score = tf·idf_micro, rank ties to the token
    string; one explode + two partial-agg shuffles, rank over the
    (doc, token) aggregate, never raw positions."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    n_docs = docs.count()
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("long").alias("tf"))
        .localCheckpoint()  # df and the rank both consume this
    )
    df_ = tf.groupBy("tok").agg(F.count("*").cast("long").alias("df"))
    scored = tf.join(df_, "tok").select(
        "doc_id",
        "tok",
        "tf",
        F.expr(f"tf * (({n_docs}L * 1000000) DIV df)").cast("long").alias("score_micro"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_micro").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "rnk", "tok", "tf", "score_micro")
        .orderBy("doc_id", "rnk")
    )


DOC_KEYWORDS_TFIDF_SQL = """
WITH tf AS (
  SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
  ) GROUP BY doc_id, tok
),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf,
         CAST(tf.tf * (((SELECT n FROM n) * 1000000) // d.df) AS BIGINT) AS score_micro
  FROM tf JOIN dfreq d USING (tok)
)
SELECT doc_id, rnk, tok, tf, score_micro FROM (
  SELECT doc_id, tok, tf, score_micro,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id ORDER BY score_micro DESC, tok ASC) AS BIGINT) AS rnk
  FROM scored
) WHERE rnk <= 3
ORDER BY doc_id, rnk
"""

QUERIES["doc_keywords_tfidf"] = Q(
    doc_keywords_tfidf,
    DOC_KEYWORDS_TFIDF_SQL,
    "top-3 tf-idf keywords per document on the integer grid",
)


def doc_lm_score(spark, sf_dir):
    """LM-based corpus filtering (the CCNet shape, log-free): every
    document scored by the mean conditional probability of its own
    bigrams under the corpus bigram LM — fluent/common text scores high,
    aberrant text low. Per-bigram p_ppm = cnt·10⁶ DIV ctx (the
    ngram_lm_topnext grid); the doc score is the integer mean over the
    doc's bigram INSTANCES (repeats count), joined from the broadcast-
    sized LM table. A perplexity threshold becomes a p_ppm threshold —
    no log, no float, fully oracle-checkable."""
    docs = load(spark, sf_dir, "documents")
    d = docs.select("doc_id", F.split("text", " ").alias("toks"))
    inst = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(toks, 1, size(toks)-1)").alias("w1"),
                F.expr("slice(toks, 2, size(toks)-1)").alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
    bg = inst.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("cnt"))
    ctx = bg.groupBy("w1").agg(F.sum("cnt").cast("long").alias("ctx_cnt"))
    lm = bg.join(ctx, "w1").select(
        "w1", "w2", F.expr("(cnt * 1000000) DIV ctx_cnt").cast("long").alias("p_ppm")
    )
    return (
        inst.join(lm, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.expr("CAST(SUM(p_ppm) DIV COUNT(*) AS BIGINT)").alias("mean_p_ppm"),
        )
        .orderBy("doc_id")
    )


DOC_LM_SCORE_SQL = """
WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
idx AS (SELECT doc_id, toks, unnest(range(1, len(toks))) AS i FROM d),
inst AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2 FROM idx),
bg AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS cnt FROM inst GROUP BY w1, w2),
cx AS (SELECT w1, CAST(SUM(cnt) AS BIGINT) AS ctx_cnt FROM bg GROUP BY w1),
lm AS (
  SELECT bg.w1, bg.w2, CAST((bg.cnt * 1000000) // cx.ctx_cnt AS BIGINT) AS p_ppm
  FROM bg JOIN cx USING (w1)
)
SELECT i.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(l.p_ppm) // COUNT(*) AS BIGINT) AS mean_p_ppm
FROM inst i JOIN lm l ON i.w1 = l.w1 AND i.w2 = l.w2
GROUP BY i.doc_id
ORDER BY i.doc_id
"""

QUERIES["doc_lm_score"] = Q(
    doc_lm_score,
    DOC_LM_SCORE_SQL,
    "CCNet-style LM doc scoring: mean bigram p_ppm under the corpus LM (log-free)",
)


def phrase_search(spark, sf_dir):
    """Exact phrase lookup through the inverted shingle index — the
    search-side payoff of the dedup machinery: the corpus's most common
    3-gram phrase (df DESC, text ASC — a deterministic probe derived
    in-query, no hard-coded literal that could rot with the data) is
    looked up in the index, and each hit is re-verified against the raw
    text with a substring containment check (index hit => contains, the
    sanity invariant). Returns the hit list with per-doc occurrence
    counts of the phrase's first word as a payload signal."""
    docs = load(spark, sf_dir, "documents")
    from ..operators.dedup import shingles

    sh = shingles(docs).localCheckpoint()
    probe = (
        sh.groupBy("shingle")
        .agg(F.count("*").cast("long").alias("df"))
        .orderBy(F.col("df").desc(), F.col("shingle").asc())
        .limit(1)
        .select(F.col("shingle").alias("phrase"), "df")
    )
    hits = sh.join(F.broadcast(probe), sh["shingle"] == probe["phrase"]).select(
        "doc_id", "phrase", "df"
    )
    return (
        hits.join(docs.select("doc_id", "text"), "doc_id")
        .select(
            "doc_id",
            "phrase",
            "df",
            F.col("text").contains(F.col("phrase")).alias("verified"),
        )
        .orderBy("doc_id")
    )


PHRASE_SEARCH_SQL = """
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                 i -> array_to_string(t[i:i+2], ' '))) AS shingle
    FROM toks
  )
),
probe AS (
  SELECT shingle AS phrase, CAST(COUNT(*) AS BIGINT) AS df
  FROM sh GROUP BY shingle
  ORDER BY df DESC, shingle ASC LIMIT 1
)
SELECT s.doc_id, p.phrase, p.df,
       contains(d.text, p.phrase) AS verified
FROM sh s
JOIN probe p ON s.shingle = p.phrase
JOIN documents d ON d.doc_id = s.doc_id
ORDER BY s.doc_id
"""

QUERIES["phrase_search"] = Q(
    phrase_search,
    PHRASE_SEARCH_SQL,
    "inverted-index phrase lookup with raw-text verification",
)


def gopher_repetition_signals(spark, sf_dir):
    """Gopher-style repetition/quality signals (Rae et al., 2021 §A1.1)
    adapted to the single-line documents: per-doc top-token fraction,
    top-bigram fraction, type-token ratio, and mean word length, all on
    the integer ppm/micro grid (x·10⁶ DIV n — no float division, so the
    DuckDB oracle matches bit-for-bit). Two partial-agg shuffles, both
    keyed by (doc_id, gram): shuffle volume is bounded by per-doc
    distinct grams, never corpus². The ``gopher_ok`` flag applies the
    paper's repetition screens (top token ≤20%, top bigram ≤18%) plus a
    TTR floor — the composite keep/drop signal a training-data filter
    would consume."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tok_counts = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    uni = tok_counts.groupBy("doc_id").agg(
        F.sum("n").cast("long").alias("token_cnt"),
        F.max("n").cast("long").alias("top_n"),
        F.count("*").cast("long").alias("distinct_toks"),
        F.sum(F.col("n") * F.length("tok")).cast("long").alias("char_sum"),
    )
    d = docs.select("doc_id", F.split("text", " ").alias("t"))
    bg = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t)-1)").alias("w1"),
                F.expr("slice(t, 2, size(t)-1)").alias("w2"),
            )
        ).alias("p"),
    ).select("doc_id", F.concat_ws(" ", "p.w1", "p.w2").alias("bigram"))
    bi = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("bn"))
        .groupBy("doc_id")
        .agg(F.max("bn").cast("long").alias("top_bn"), F.sum("bn").cast("long").alias("bigram_cnt"))
    )
    j = uni.join(bi, "doc_id", "left_outer")
    top_token_ppm = F.expr("(top_n * 1000000) DIV token_cnt")
    top_bigram_ppm = F.coalesce(F.expr("(top_bn * 1000000) DIV bigram_cnt"), F.lit(0))
    ttr_ppm = F.expr("(distinct_toks * 1000000) DIV token_cnt")
    return j.select(
        "doc_id",
        "token_cnt",
        top_token_ppm.cast("long").alias("top_token_ppm"),
        top_bigram_ppm.cast("long").alias("top_bigram_ppm"),
        ttr_ppm.cast("long").alias("ttr_ppm"),
        F.expr("(char_sum * 1000000) DIV token_cnt").cast("long").alias("mean_word_len_micro"),
        (
            (top_token_ppm <= 200000)
            & (top_bigram_ppm <= 180000)
            & (ttr_ppm >= 100000)
        )
        .cast("int")
        .alias("gopher_ok"),
    )


GOPHER_REPETITION_SIGNALS_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
tok_counts AS (
  SELECT doc_id, tok, COUNT(*) AS n FROM toks GROUP BY doc_id, tok
),
uni AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS token_cnt,
         CAST(MAX(n) AS BIGINT) AS top_n,
         CAST(COUNT(*) AS BIGINT) AS distinct_toks,
         CAST(SUM(n * length(tok)) AS BIGINT) AS char_sum
  FROM tok_counts GROUP BY doc_id
),
d AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
idx AS (SELECT doc_id, t, unnest(range(1, len(t))) AS i FROM d),
bg AS (SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram FROM idx),
bi AS (
  SELECT doc_id, CAST(MAX(bn) AS BIGINT) AS top_bn, CAST(SUM(bn) AS BIGINT) AS bigram_cnt
  FROM (SELECT doc_id, bigram, COUNT(*) AS bn FROM bg GROUP BY doc_id, bigram)
  GROUP BY doc_id
)
SELECT u.doc_id, u.token_cnt,
       CAST((u.top_n * 1000000) // u.token_cnt AS BIGINT) AS top_token_ppm,
       CAST(COALESCE((b.top_bn * 1000000) // b.bigram_cnt, 0) AS BIGINT) AS top_bigram_ppm,
       CAST((u.distinct_toks * 1000000) // u.token_cnt AS BIGINT) AS ttr_ppm,
       CAST((u.char_sum * 1000000) // u.token_cnt AS BIGINT) AS mean_word_len_micro,
       CAST(CASE WHEN (u.top_n * 1000000) // u.token_cnt <= 200000
                  AND COALESCE((b.top_bn * 1000000) // b.bigram_cnt, 0) <= 180000
                  AND (u.distinct_toks * 1000000) // u.token_cnt >= 100000
             THEN 1 ELSE 0 END AS INT) AS gopher_ok
FROM uni u LEFT OUTER JOIN bi b ON u.doc_id = b.doc_id
"""

QUERIES["gopher_repetition_signals"] = Q(
    gopher_repetition_signals,
    GOPHER_REPETITION_SIGNALS_SQL,
    "Gopher-style repetition screens: top-token/bigram fractions, TTR, mean word length",
)


def higher_order_sampler(spark, sf_dir):
    """Array higher-order-function surface pin — F.filter / F.exists /
    F.forall / F.aggregate (fold) / F.zip_with in one pass, all inside
    codegen (no explode, no shuffle: the per-row fold replaces a
    row-fan-out + groupBy at any scale). The oracle reproduces each
    value through DuckDB list lambdas or scalar identities (Σlen ==
    length minus spaces; the position-weighted fold via the indexed
    range join)."""
    toks = F.split(F.col("text"), " ")
    lit0 = F.lit(0).cast("long")
    pos_weighted = F.aggregate(
        F.zip_with(
            toks,
            F.sequence(F.lit(1), F.size(toks)),
            lambda t, i: F.length(t).cast("long") * i,
        ),
        lit0,
        lambda acc, x: acc + x,
    )
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 5)).cast("long").alias("n_long_toks"),
        F.exists(toks, lambda t: t == F.lit("spark")).cast("int").alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) > 0).cast("int").alias("all_nonempty"),
        F.aggregate(toks, lit0, lambda acc, t: acc + F.length(t).cast("long")).alias("char_sum"),
        pos_weighted.alias("pos_weighted"),
    )


HIGHER_ORDER_SAMPLER_SQL = """
WITH d AS (SELECT doc_id, text, string_split(text, ' ') AS t FROM documents),
pw AS (
  SELECT doc_id, CAST(SUM(i * length(t[i])) AS BIGINT) AS pos_weighted
  FROM (SELECT doc_id, t, unnest(range(1, len(t) + 1)) AS i FROM d)
  GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(len(list_filter(t, x -> length(x) > 5)) AS BIGINT) AS n_long_toks,
       CAST(list_contains(t, 'spark') AS INT) AS has_spark,
       CAST(len(list_filter(t, x -> length(x) > 0)) = len(t) AS INT) AS all_nonempty,
       CAST(length(replace(text, ' ', '')) AS BIGINT) AS char_sum,
       pw.pos_weighted
FROM d JOIN pw ON d.doc_id = pw.doc_id
"""

QUERIES["higher_order_sampler"] = Q(
    higher_order_sampler,
    HIGHER_ORDER_SAMPLER_SQL,
    "higher-order array functions (filter/exists/forall/fold/zip_with) in one codegen pass",
)


def regexp_battery(spark, sf_dir):
    """Regex surface parity: regexp_count (via extract_all length in the
    oracle), first-match extraction, and regexp_replace length delta —
    the same RE2-compatible pattern class both engines JIT; all codegen,
    no shuffle beyond the final rollup-free projection."""
    docs = load(spark, sf_dir, "documents")
    pat = r"\bst[a-z]+"
    return docs.select(
        "doc_id",
        F.expr(f"regexp_count(text, r'{pat}')").cast("long").alias("n_st_words"),
        F.regexp_extract(F.col("text"), pat, 0).alias("first_st_word"),
        (
            F.length("text")
            - F.length(F.regexp_replace(F.col("text"), r"[aeiou]", ""))
        ).cast("long").alias("n_vowels"),
    )


REGEXP_BATTERY_SQL = r"""
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\bst[a-z]+')) AS BIGINT) AS n_st_words,
       COALESCE(regexp_extract(text, '\bst[a-z]+', 0), '') AS first_st_word,
       CAST(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g')) AS BIGINT) AS n_vowels
FROM documents
"""

QUERIES["regexp_battery"] = Q(
    regexp_battery,
    REGEXP_BATTERY_SQL,
    "regexp count/extract/replace parity on the shared RE2-safe pattern class",
)


def map_higher_order_ops(spark, sf_dir):
    """MAP-typed column surface: per-doc token-count map built with
    map_from_entries, values doubled through transform_values, filtered
    with map_filter (count ≥ 2), then exploded back to sorted rows —
    maps never reach the output (map equality/hash is order-undefined
    cross-engine; exploding to rows restores a canonical form). The
    oracle computes the same rows straight from grouped counts."""
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    counted = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))
    as_map = counted.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("tok", "n")))
        ).alias("m")
    )
    transformed = as_map.select(
        "doc_id",
        F.map_filter(
            F.transform_values(F.col("m"), lambda k, v: v * 2),
            lambda k, v: v >= 4,
        ).alias("m2"),
    )
    return (
        transformed.select("doc_id", F.explode("m2").alias("tok", "n2"))
        .select("doc_id", "tok", F.col("n2").cast("long").alias("n2"))
    )


MAP_HIGHER_ORDER_OPS_SQL = """
SELECT doc_id, tok, CAST(COUNT(*) * 2 AS BIGINT) AS n2
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
GROUP BY doc_id, tok
HAVING COUNT(*) * 2 >= 4
"""

QUERIES["map_higher_order_ops"] = Q(
    map_higher_order_ops,
    MAP_HIGHER_ORDER_OPS_SQL,
    "map_from_entries / transform_values / map_filter round-trip to canonical rows",
)


def struct_json_roundtrip(spark, sf_dir):
    """Schema-ful struct⇄JSON round-trip: named_struct → to_json →
    from_json(schema) must reproduce the original fields exactly (the
    serialization boundary every lake/queue hop crosses); a parse
    failure nulls the row and would break the count. Oracle reads the
    fields directly — the round-trip must be invisible."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_id") % 23 == 0)
    packed = ev.select(
        "event_id",
        F.to_json(
            F.struct(
                F.col("user_id"),
                F.col("event_type"),
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            )
        ).alias("payload"),
    )
    unpacked = packed.select(
        "event_id",
        F.from_json(
            "payload", "user_id bigint, event_type string, cents bigint"
        ).alias("s"),
    )
    return unpacked.select(
        "event_id",
        F.col("s.user_id").alias("user_id"),
        F.col("s.event_type").alias("event_type"),
        F.col("s.cents").alias("cents"),
    )


STRUCT_JSON_ROUNDTRIP_SQL = """
SELECT event_id, user_id, event_type,
       CAST(ROUND(value * 100) AS BIGINT) AS cents
FROM events WHERE event_id % 23 = 0
"""

QUERIES["struct_json_roundtrip"] = Q(
    struct_json_roundtrip,
    STRUCT_JSON_ROUNDTRIP_SQL,
    "named_struct -> to_json -> from_json(schema) must be lossless",
)


def explode_outer_semantics(spark, sf_dir):
    """explode vs explode_outer null-preservation pin: docs whose
    long-token array is EMPTY vanish under explode but survive as a
    NULL row under explode_outer — the row-accounting difference that
    silently drops entities from a fan-out join. The oracle emulates
    outer-unnest with a LEFT JOIN (DuckDB's unnest drops empties)."""
    docs = load(spark, sf_dir, "documents")
    long_toks = F.filter(F.split("text", " "), lambda t: F.length(t) >= 9)
    inner = (
        docs.select(F.explode(long_toks).alias("tok"))
        .agg(F.count("*").cast("long").alias("n_inner_rows"))
    )
    outer = docs.select("doc_id", F.explode_outer(long_toks).alias("tok"))
    return outer.groupBy().agg(
        F.count("*").cast("long").alias("n_outer_rows"),
        F.sum(F.col("tok").isNull().cast("long")).cast("long").alias("n_null_rows"),
    ).crossJoin(F.broadcast(inner))


EXPLODE_OUTER_SEMANTICS_SQL = """
WITH d AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> length(x) >= 9) AS lt
  FROM documents
),
inner_rows AS (
  SELECT doc_id, unnest(lt) AS tok FROM d
),
outer_rows AS (
  SELECT d.doc_id, i.tok
  FROM d LEFT JOIN inner_rows i ON d.doc_id = i.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_outer_rows,
       CAST(SUM(CASE WHEN tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_rows,
       CAST((SELECT COUNT(*) FROM inner_rows) AS BIGINT) AS n_inner_rows
FROM outer_rows
"""

QUERIES["explode_outer_semantics"] = Q(
    explode_outer_semantics,
    EXPLODE_OUTER_SEMANTICS_SQL,
    "explode vs explode_outer row accounting (empty arrays survive as NULL rows)",
)


def seq_length_distribution(spark, sf_dir):
    """Pre-training sequence-length report: docs per (source,
    256-subword-token bucket) with per-bucket token mass — the
    distribution a packing/truncation policy is tuned against. Subword
    counts reuse the BPE-ish proxy (whitespace tokens + ceil(len/4)
    capped pieces) so the bucket edges are integer-exact."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sub = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.least(F.ceil(F.length(t) / 4), F.lit(8)),
    )
    d = docs.select("source", sub.alias("n_sub"))
    bucket = F.expr("n_sub DIV 256")
    return d.groupBy("source", bucket.cast("long").alias("len_bucket")).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_sub").cast("long").alias("token_mass"),
    )


SEQ_LENGTH_DISTRIBUTION_SQL = """
WITH d AS (
  SELECT source,
         (SELECT SUM(LEAST(CAST(CEIL(length(t) / 4.0) AS BIGINT), 8))
          FROM unnest(string_split(text, ' ')) AS u(t)) AS n_sub
  FROM documents
)
SELECT source, CAST(n_sub // 256 AS BIGINT) AS len_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sub) AS BIGINT) AS token_mass
FROM d GROUP BY source, n_sub // 256
"""

QUERIES["seq_length_distribution"] = Q(
    seq_length_distribution,
    SEQ_LENGTH_DISTRIBUTION_SQL,
    "docs and token mass per (source, 256-token length bucket)",
)


def tokenizer_fertility(spark, sf_dir):
    """Tokenizer fertility per language — subword pieces per whitespace
    word on the ppm grid (the multilingual-pipeline health metric: a
    tokenizer that fragments one language inflates its effective
    sequence lengths and training cost). Integer sums, one partial-agg
    shuffle keyed by the language dimension."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    sub = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc + F.least(F.ceil(F.length(t) / 4), F.lit(8)),
    )
    d = docs.select("lang", F.size(toks).cast("long").alias("n_words"), sub.alias("n_sub"))
    return d.groupBy("lang").agg(
        F.sum("n_words").cast("long").alias("words"),
        F.sum("n_sub").cast("long").alias("subwords"),
        F.expr("(SUM(n_sub) * 1000000) DIV SUM(n_words)").cast("long").alias("fertility_ppm"),
    )


TOKENIZER_FERTILITY_SQL = """
WITH d AS (
  SELECT lang, len(string_split(text, ' ')) AS n_words,
         (SELECT SUM(LEAST(CAST(CEIL(length(t) / 4.0) AS BIGINT), 8))
          FROM unnest(string_split(text, ' ')) AS u(t)) AS n_sub
  FROM documents
)
SELECT lang, CAST(SUM(n_words) AS BIGINT) AS words,
       CAST(SUM(n_sub) AS BIGINT) AS subwords,
       CAST((SUM(n_sub) * 1000000) // SUM(n_words) AS BIGINT) AS fertility_ppm
FROM d GROUP BY lang
"""

QUERIES["tokenizer_fertility"] = Q(
    tokenizer_fertility,
    TOKENIZER_FERTILITY_SQL,
    "subword-per-word fertility ppm per language",
)


def _bpe_spell(col):
    """space-joined character spelling of a token column ('abc' -> 'a b c')."""
    return F.trim(F.regexp_replace(col, "(.)", "$1 "))


def bpe_train_merges(spark, sf_dir, n_merges: int = 5):
    """BPE tokenizer training — the first ``n_merges`` merge rules learned
    from the corpus word-frequency table, as ONE declarative plan (no
    driver loop, no collect): each round counts adjacent symbol pairs
    weighted by word frequency (a bounded aggregation over the distinct-
    word vocabulary, NOT the corpus — the corpus is scanned once into the
    word table), takes the global argmax (count desc, pair asc — a 1-row
    TakeOrdered), and applies the winning merge to every vocabulary
    spelling via a broadcast-crossJoin + delimiter-guarded replace. The
    per-round argmax rides the lineage as a broadcast, so the whole
    training is laziness-preserving and cluster-executable.

    Merge application uses non-overlapping left-to-right delimiter
    replace (' a b '→' ab ' on the space-joined spelling): for runs like
    'a a a' this merges alternate pairs, which both engines implement
    identically — the convention is pinned, like the engine's other
    order-sensitive kernels.

    The (tiny, distinct-word-bounded) vocabulary is localCheckpoint-ed
    between rounds — the 100 TB shape the original docstring promised:
    without the cut, round r's argmax subtree nests every earlier
    round's, so the 5-round training executed ~15 vocabulary passes and
    5 corpus scans (a 176-Exchange plan) instead of 1 corpus scan + 5
    vocabulary aggregations. Values are unchanged (checkpointing only
    severs lineage); paired warm A/B at sf0.1 in OPTIMIZATION_r07.md."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # one corpus scan, materialized: every round's pair count and merge
    # application reads this table, never the corpus
    v = words.select(_bpe_spell(F.col("w")).alias("s"), "freq").localCheckpoint()
    bests = []
    for r in range(n_merges):
        # spelling tokenized into a REAL column before the pair transform:
        # an inline split in the lambda closure re-evaluates per element
        # under the interpreted HOF path (O(symbols²) per word — see
        # operators/dedup._gram_array)
        t = F.col("_t")
        pairs = (
            v.withColumn("_t", F.split("s", " "))
            .filter(F.size(t) >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(t, i), F.element_at(t, i + 1)
                        ),
                    )
                ).alias("pair"),
                "freq",
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
        )
        bests.append(
            best.select(
                F.lit(r + 1).cast("int").alias("rnk"),
                "pair",
                F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("merged"),
                "cnt",
            )
        )
        if r == n_merges - 1:
            continue  # the last round's merged vocabulary has no consumer
        v = v.crossJoin(F.broadcast(best.select(F.col("pair").alias("_p")))).select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("_p"), F.lit(" ")),
                    F.concat(
                        F.lit(" "),
                        F.replace(F.col("_p"), F.lit(" "), F.lit("")),
                        F.lit(" "),
                    ),
                )
            ).alias("s"),
            "freq",
        ).localCheckpoint()
    out = bests[0]
    for b in bests[1:]:
        out = out.unionAll(b)
    return out.orderBy("rnk")


def _bpe_oracle_sql(n_merges: int = 5) -> str:
    parts = [
        """WITH words AS (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
),
v0 AS (SELECT trim(regexp_replace(w, '(.)', '\\1 ', 'g')) AS s, freq FROM words)"""
    ]
    for r in range(n_merges):
        parts.append(
            f""",
p{r} AS (
  SELECT pair, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS pair,
           freq
    FROM (SELECT string_split(s, ' ') AS t, freq FROM v{r})
    WHERE len(t) >= 2
  ) GROUP BY pair
),
b{r} AS (SELECT pair, cnt FROM p{r} ORDER BY cnt DESC, pair ASC LIMIT 1),
v{r + 1} AS (
  SELECT trim(replace(' ' || s || ' ',
                      ' ' || (SELECT pair FROM b{r}) || ' ',
                      ' ' || replace((SELECT pair FROM b{r}), ' ', '') || ' ')) AS s,
         freq
  FROM v{r}
)"""
        )
    selects = [
        f"SELECT CAST({r + 1} AS INT) AS rnk, pair, replace(pair, ' ', '') AS merged, cnt FROM b{r}"
        for r in range(n_merges)
    ]
    parts.append("\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY rnk")
    return "".join(parts)


QUERIES["bpe_train_merges"] = Q(
    bpe_train_merges,
    _bpe_oracle_sql(),
    "BPE tokenizer training: first 5 merge rules by iterative weighted pair aggregation",
)


def bpe_vocab_compression(spark, sf_dir, n_merges: int = 5):
    """The measurement half of BPE training: weighted corpus token count
    after each merge round (round 0 = characters), i.e. how much each
    learned rule compresses the corpus. Re-derives the same vocabulary
    chain as `bpe_train_merges` (one declarative plan; the per-round
    argmax rides a broadcast) and reduces each round's vocabulary to ONE
    row: Σ freq · |tokens|. Output (rnk, total_tokens) is 6 rows; the
    compression must be monotone non-increasing — each merge can only
    shrink spellings.

    NOTE on merge convention (affects the reported counts): merge
    application is the delimiter-guarded replace pinned in
    ``bpe_train_merges`` — on a repeated run like 'a a a a' the shared
    delimiter between adjacent matches is consumed, so one pass merges
    that run once, not pairwise twice as canonical left-to-right BPE
    would. Both engines (Spark and the DuckDB oracle) and the pure-
    Python reference replay implement the identical convention, so the
    curve is self-consistent, but absolute totals on highly repetitive
    tokens will differ from standard tokenizers (e.g. HF tokenizers)."""
    docs = load(spark, sf_dir, "documents")
    words = (
        docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    # one corpus scan + one vocabulary table per round, like
    # bpe_train_merges: the checkpoint severs the per-round lineage so
    # the round-r total aggregates a materialized vocabulary instead of
    # re-deriving rounds 0..r-1 (values unchanged)
    v = words.select(_bpe_spell(F.col("w")).alias("s"), "freq").localCheckpoint()
    totals = []

    def total_of(vdf, rnk):
        return vdf.agg(
            F.lit(rnk).cast("int").alias("rnk"),
            F.sum(F.size(F.split("s", " ")) * F.col("freq"))
            .cast("long")
            .alias("total_tokens"),
        )

    totals.append(total_of(v, 0))
    for r in range(n_merges):
        # hoisted token-array column — same hazard note as bpe_train_merges
        t = F.col("_t")
        pairs = (
            v.withColumn("_t", F.split("s", " "))
            .filter(F.size(t) >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size(t) - 1),
                        lambda i: F.concat_ws(
                            " ", F.element_at(t, i), F.element_at(t, i + 1)
                        ),
                    )
                ).alias("pair"),
                "freq",
            )
        )
        best = (
            pairs.groupBy("pair")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
        )
        v = v.crossJoin(F.broadcast(best.select(F.col("pair").alias("_p")))).select(
            F.trim(
                F.replace(
                    F.concat(F.lit(" "), F.col("s"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("_p"), F.lit(" ")),
                    F.concat(
                        F.lit(" "),
                        F.replace(F.col("_p"), F.lit(" "), F.lit("")),
                        F.lit(" "),
                    ),
                )
            ).alias("s"),
            "freq",
        ).localCheckpoint()
        totals.append(total_of(v, r + 1))
    out = totals[0]
    for tdf in totals[1:]:
        out = out.unionAll(tdf)
    return out.orderBy("rnk")


def _bpe_compression_oracle_sql(n_merges: int = 5) -> str:
    base = _bpe_oracle_sql(n_merges)
    # reuse the words/v0..v5 CTE chain, swap the final SELECT for totals
    head = base.rsplit("\nSELECT CAST(1", 1)[0]
    selects = [
        f"SELECT CAST({r} AS INT) AS rnk, CAST(SUM(len(string_split(s, ' ')) * freq) AS BIGINT) AS total_tokens FROM v{r}"
        for r in range(n_merges + 1)
    ]
    return head + "\n" + "\nUNION ALL\n".join(selects) + "\nORDER BY rnk"


QUERIES["bpe_vocab_compression"] = Q(
    bpe_vocab_compression,
    _bpe_compression_oracle_sql(),
    "corpus token count after each BPE merge round (compression curve)",
)


def lang_confusion_matrix(spark, sf_dir):
    """Classifier evaluation joined to ground truth: the stopword-voting
    language-ID's confusion matrix against the labeled language, with
    per-cell recall share ppm (cell count / actual-class total). The
    per-doc prediction is the existing map-side lang_id kernel; the
    matrix is one ≤16-row aggregation + a broadcast of the per-class
    totals — classifier eval never costs more than the scoring pass."""
    preds = T.lang_id(load(spark, sf_dir, "documents")).select(
        "labeled_lang", "pred_lang"
    )
    cells = preds.groupBy("labeled_lang", "pred_lang").agg(
        F.count("*").alias("n")
    )
    totals = cells.groupBy("labeled_lang").agg(F.sum("n").alias("n_actual"))
    return (
        cells.join(F.broadcast(totals), "labeled_lang")
        .select(
            "labeled_lang",
            "pred_lang",
            F.col("n").cast("bigint").alias("n"),
            F.expr("n * 1000000 DIV NULLIF(n_actual, 0)").cast("bigint").alias("recall_ppm"),
        )
        .orderBy("labeled_lang", "pred_lang")
    )


LANG_CONFUSION_MATRIX_SQL = f"""
WITH t AS (
  SELECT lang AS labeled_lang,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('en')}, x))) AS hits_en,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('es')}, x))) AS hits_es,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('de')}, x))) AS hits_de,
         len(list_filter(string_split(text,' '), x -> list_contains({_sql_set('fr')}, x))) AS hits_fr
  FROM documents
),
preds AS (
  SELECT labeled_lang,
         CASE WHEN hits_en >= hits_es AND hits_en >= hits_de AND hits_en >= hits_fr THEN 'en'
              WHEN hits_es >= hits_de AND hits_es >= hits_fr THEN 'es'
              WHEN hits_de >= hits_fr THEN 'de'
              ELSE 'fr' END AS pred_lang
  FROM t
),
cells AS (
  SELECT labeled_lang, pred_lang, COUNT(*) AS n
  FROM preds GROUP BY 1, 2
),
totals AS (SELECT labeled_lang, SUM(n) AS n_actual FROM cells GROUP BY 1)
SELECT c.labeled_lang, c.pred_lang, CAST(c.n AS BIGINT) AS n,
       CAST(c.n * 1000000 // NULLIF(t.n_actual, 0) AS BIGINT) AS recall_ppm
FROM cells c JOIN totals t USING (labeled_lang)
ORDER BY c.labeled_lang, c.pred_lang
"""

QUERIES["lang_confusion_matrix"] = Q(
    lang_confusion_matrix,
    LANG_CONFUSION_MATRIX_SQL,
    "language-ID confusion matrix vs labels with per-class recall ppm",
)


def text_readability_grid(spark, sf_dir):
    """Readability profiling per language — Flesch-shaped but exact:
    'syllables' are vowel groups (regexp count, deterministic in both
    engines), sentences are period-ish splits, and the two Flesch
    ratios (words/sentence, syllables/word) come out per-language in
    milli units. Everything is regexp + counting in one codegen pass,
    then a ≤|langs| rollup — the readability screen a corpus pipeline
    runs next to the Gopher signals."""
    docs = load(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        F.size(F.split("text", " ")).cast("bigint").alias("words"),
        (F.size(F.split("text", "[aeiouy]+")) - 1).cast("bigint").alias("syl"),
        F.greatest(
            F.lit(1), (F.size(F.split("text", "[.!?]")) - 1).cast("bigint")
        ).alias("sents"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("words").cast("bigint").alias("words"),
            F.expr("SUM(words) * 1000 DIV SUM(sents)")
            .cast("bigint")
            .alias("words_per_sent_milli"),
            F.expr("SUM(syl) * 1000 DIV SUM(words)")
            .cast("bigint")
            .alias("syl_per_word_milli"),
        )
        .orderBy("lang")
    )


TEXT_READABILITY_GRID_SQL = """
WITH per_doc AS (
  SELECT lang,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS words,
         CAST(len(string_split_regex(text, '[aeiouy]+')) - 1 AS BIGINT) AS syl,
         GREATEST(1, CAST(len(string_split_regex(text, '[.!?]')) - 1 AS BIGINT)) AS sents
  FROM documents
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(words) AS BIGINT) AS words,
       CAST(SUM(words) * 1000 // SUM(sents) AS BIGINT) AS words_per_sent_milli,
       CAST(SUM(syl) * 1000 // SUM(words) AS BIGINT) AS syl_per_word_milli
FROM per_doc GROUP BY lang ORDER BY lang
"""

QUERIES["text_readability_grid"] = Q(
    text_readability_grid,
    TEXT_READABILITY_GRID_SQL,
    "per-language readability ratios (vowel-group syllables, exact milli grid)",
)
