"""Oracle-checked queries for the corpus-assembly operators
(operators/sampling.py): sequence packing, stratified sampling,
benchmark decontamination, deterministic shuffle.

Everything deterministic (md5-keyed), so each query has a full-value
DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import sampling as S
from .base import Q, load

# 60-bit md5 prefix as BIGINT, DuckDB spelling (= dedup._text_md5_int).
_MD5_INT = "CAST('0x' || substr(md5({expr}), 1, 15) AS BIGINT)"


def pack_sequences_stats(spark, sf_dir):
    """Pack stats per (shard, pack): doc count, token total. Fixed
    ``n_shards=8`` — shard membership is part of the SEMANTICS (id % 8),
    not the physical partitioning, so the result is engine-independent."""
    packed = S.pack_sequences(
        load(spark, sf_dir, "documents"), max_tokens=512, n_shards=8
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("pack_tokens"),
    )


PACK_SEQUENCES_STATS_SQL = """
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 512
           AS BIGINT) AS pack_id
  FROM toks
)
SELECT shard, pack_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
FROM packed GROUP BY shard, pack_id
"""


def stratified_sample_counts(spark, sf_dir):
    """Data-mixing sample: keep 80% of en, 30% of de, 10% of everything
    else, decided by ``md5(doc_id:s1) % 10000``. Output: kept docs and
    mean quality proxy (chars) per language."""
    kept = S.stratified_sample(
        load(spark, sf_dir, "documents"),
        rates={"en": 0.8, "de": 0.3},
        default_rate=0.1,
    )
    return kept.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )


STRATIFIED_SAMPLE_COUNTS_SQL = f"""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM documents
WHERE {_MD5_INT.format(expr="CAST(doc_id AS VARCHAR) || ':s1'")} % 10000
      < CASE lang WHEN 'en' THEN 8000 WHEN 'de' THEN 3000 ELSE 1000 END
GROUP BY lang
"""


def decontam_overlap(spark, sf_dir):
    """Eval-contamination scrub: docs ``doc_id % 20 == 0`` stand in for the
    benchmark set; the rest is the training corpus. A corpus doc is
    contaminated when it shares any word 8-gram with a benchmark doc.
    Output: per-language corpus size and contaminated count."""
    docs = load(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    flagged = S.ngram_decontaminate(corpus, bench, n=8)
    return flagged.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("contaminated").cast("long").alias("n_contaminated"),
    )


DECONTAM_OVERLAP_SQL = """
WITH toks AS (
  SELECT doc_id, lang, doc_id % 20 = 0 AS is_bench, string_split(text, ' ') AS t
  FROM documents
), sh AS (
  SELECT DISTINCT doc_id, lang, is_bench, shingle FROM (
    SELECT doc_id, lang, is_bench,
           unnest(list_transform(range(1, greatest(len(t) - 7, 0) + 1),
                                 i -> array_to_string(t[i:i+7], ' '))) AS shingle
    FROM toks
  )
), hits AS (
  SELECT DISTINCT c.doc_id
  FROM sh c JOIN sh b ON c.shingle = b.shingle AND b.is_bench AND NOT c.is_bench
)
SELECT d.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_contaminated
FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
WHERE d.doc_id % 20 <> 0
GROUP BY d.lang
"""


def shuffle_order_sample(spark, sf_dir):
    """First 50 docs of the epoch-0 deterministic shuffle, with their
    permutation rank — the training-order stream's head. The limit runs
    FIRST (Spark plans it as TakeOrderedAndProject — per-partition top-50
    + driver merge, no global sort materialized); the rank window then
    only ever sees 50 rows, so the unpartitioned window is bounded."""
    from pyspark.sql.window import Window

    ordered = S.shuffle_order(load(spark, sf_dir, "documents"), seed="epoch0")
    head = ordered.limit(50)
    return head.withColumn(
        "rank",
        F.row_number().over(Window.orderBy("shuffle_key", "doc_id")).cast("long"),
    ).select("rank", "doc_id", "lang", "shuffle_key")


SHUFFLE_ORDER_SAMPLE_SQL = f"""
SELECT CAST(ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS BIGINT) AS rank,
       doc_id, lang, shuffle_key
FROM (
  SELECT doc_id, lang,
         {_MD5_INT.format(expr="CAST(doc_id AS VARCHAR) || ':epoch0'")} AS shuffle_key
  FROM documents
)
ORDER BY rank LIMIT 50
"""


def temperature_mix_counts(spark, sf_dir):
    """Temperature-scaled domain mixing (operators/sampling.py::
    temperature_mix, alpha=0.5 over lang): per-domain doc count, the
    integer-grid target rate, and how many docs the deterministic
    md5 keep actually retained (en is downsampled ~0.70, tail langs cap
    at rate 1 — both branches of the rule are exercised)."""
    docs = load(spark, sf_dir, "documents")
    rates = S.temperature_rates(docs, alpha=0.5, strata_col="lang")
    kept = S.temperature_mix(docs, alpha=0.5, strata_col="lang", salt="t1")
    per_kept = kept.groupBy("lang").agg(F.count("*").alias("n_kept"))
    return (
        rates.join(per_kept, "lang", "left")
        .select(
            "lang",
            F.col("n_dom").alias("n_docs"),
            "rate_micro",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        )
    )


TEMPERATURE_MIX_COUNTS_SQL = f"""
WITH c AS (SELECT lang, COUNT(*) AS n_dom FROM documents GROUP BY lang),
t AS (
  SELECT lang, n_dom,
         SUM(n_dom) OVER () AS n_total,
         CAST(ROUND(sqrt(n_dom / (SUM(n_dom) OVER ())) * 1e6) AS BIGINT) AS w_micro
  FROM c
),
r AS (
  SELECT lang, n_dom, n_total, w_micro,
         LEAST(CAST(ROUND((w_micro / (SUM(w_micro) OVER ())) * n_total / n_dom * 1e6)
                    AS BIGINT),
               1000000) AS rate_micro
  FROM t
),
kept AS (
  SELECT d.lang, COUNT(*) AS n_kept
  FROM documents d JOIN r USING (lang)
  WHERE {_MD5_INT.format(expr="CAST(doc_id AS VARCHAR) || ':t1'")} % 1000000
          < r.rate_micro
  GROUP BY d.lang
)
SELECT r.lang, CAST(r.n_dom AS BIGINT) AS n_docs, r.rate_micro,
       CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept
FROM r LEFT JOIN kept k USING (lang)
"""


QUERIES = {
    "pack_sequences_stats": Q(
        pack_sequences_stats, PACK_SEQUENCES_STATS_SQL, "sequence packing bins"
    ),
    "stratified_sample_counts": Q(
        stratified_sample_counts,
        STRATIFIED_SAMPLE_COUNTS_SQL,
        "deterministic stratified data mixing",
    ),
    "decontam_overlap": Q(
        decontam_overlap, DECONTAM_OVERLAP_SQL, "benchmark n-gram decontamination"
    ),
    "shuffle_order_sample": Q(
        shuffle_order_sample, SHUFFLE_ORDER_SAMPLE_SQL, "deterministic epoch shuffle"
    ),
    "temperature_mix_counts": Q(
        temperature_mix_counts,
        TEMPERATURE_MIX_COUNTS_SQL,
        "temperature-scaled domain mixing (alpha=0.5)",
    ),
}


def contrastive_negatives(spark, sf_dir):
    """Deterministic negative sampling for contrastive embedding training
    (operators/sampling.py::negative_samples): 4 hash-derived negatives
    per anchor document, joined back to the corpus for their payload —
    the pair-construction step between dedup/quality and the training
    run. Anchor-id collisions are dropped (accidental positives)."""
    docs = load(spark, sf_dir, "documents")
    return S.negative_samples(docs, k=4, payload_cols=("n_chars",)).orderBy(
        "anchor_id", "slot"
    )


CONTRASTIVE_NEGATIVES_SQL = f"""
WITH n AS (SELECT COUNT(*) AS n FROM documents),
slots AS (
  SELECT doc_id AS anchor_id, j.j AS slot
  FROM documents, UNNEST([0, 1, 2, 3]) AS j(j)
),
neg AS (
  SELECT anchor_id, slot,
         (anchor_id * {S.NEG_P1} + slot * {S.NEG_P2} + 17) % (SELECT n FROM n) AS neg_id
  FROM slots
)
SELECT g.anchor_id, g.slot, CAST(g.neg_id AS BIGINT) AS neg_id,
       d.n_chars AS neg_n_chars
FROM neg g JOIN documents d ON d.doc_id = g.neg_id
WHERE g.neg_id <> g.anchor_id
ORDER BY g.anchor_id, g.slot
"""

QUERIES["contrastive_negatives"] = Q(
    contrastive_negatives,
    CONTRASTIVE_NEGATIVES_SQL,
    "deterministic hash-derived contrastive negatives joined to corpus payload",
)


def group_sample_fixed_k(spark, sf_dir):
    """Per-stratum FIXED-SIZE deterministic sample — 5 events per event
    type, chosen by md5(event_id) rank (the complement of rate-based
    `stratified_sample`: k-per-group instead of fraction-per-group, the
    shape eval-set construction needs). One window over the type-keyed
    partition; the md5 sort key makes the pick a pure function of the
    ids, engine-portable."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").select("event_id", "event_type")
    key = F.md5(F.col("event_id").cast("string"))
    w = Window.partitionBy("event_type").orderBy(key.asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "rnk", "event_id")
        .orderBy("event_type", "rnk")
    )


GROUP_SAMPLE_FIXED_K_SQL = """
SELECT event_type, rnk, event_id FROM (
  SELECT event_type, event_id,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)) ASC, event_id ASC
         ) AS BIGINT) AS rnk
  FROM events
)
WHERE rnk <= 5
ORDER BY event_type, rnk
"""

QUERIES["group_sample_fixed_k"] = Q(
    group_sample_fixed_k,
    GROUP_SAMPLE_FIXED_K_SQL,
    "deterministic fixed-k per-stratum sample by md5 rank",
)


def mixture_budget_allocation(spark, sf_dir):
    """Token-budget mixture solver by the largest-remainder method:
    allocate a fixed 10,000-token budget across sources proportionally
    to their corpus char mass, exactly — floor shares first, then the
    (budget − Σfloor) leftover units go to the largest fractional
    remainders (tie: source asc). Pure integer arithmetic end-to-end;
    Σallocation == budget is structural. The per-source aggregation is
    the only corpus-scale pass; the ranking runs over the source
    dimension (tiny at any scale)."""
    from pyspark.sql import Window

    budget = F.lit(10_000)
    docs = load(spark, sf_dir, "documents")
    w_mass = docs.groupBy("source").agg(
        F.sum(F.col("n_chars").cast("long")).alias("mass")
    )
    tot = w_mass.agg(F.sum("mass").alias("total"))
    j = w_mass.crossJoin(F.broadcast(tot)).select(
        "source",
        "mass",
        (F.col("mass") * budget).alias("num"),
        "total",
    )
    j = j.select(
        "source",
        "mass",
        F.expr("num DIV total").cast("long").alias("floor_share"),
        (F.col("num") % F.col("total")).alias("rem"),
    )
    leftover = budget - F.sum("floor_share").over(Window.partitionBy())
    w_rank = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    return (
        j.withColumn("leftover", leftover)
        .withColumn("rnk", F.row_number().over(w_rank))
        .select(
            "source",
            "mass",
            (F.col("floor_share") + (F.col("rnk") <= F.col("leftover")).cast("long")).alias(
                "alloc_tokens"
            ),
        )
    )


MIXTURE_BUDGET_ALLOCATION_SQL = """
WITH m AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS mass FROM documents GROUP BY source
),
t AS (SELECT SUM(mass) AS total FROM m),
j AS (
  SELECT source, mass,
         (mass * 10000) // total AS floor_share,
         (mass * 10000) % total AS rem
  FROM m CROSS JOIN t
),
r AS (
  SELECT source, mass, floor_share, rem,
         ROW_NUMBER() OVER (ORDER BY rem DESC, source ASC) AS rnk,
         10000 - SUM(floor_share) OVER () AS leftover
  FROM j
)
SELECT source, mass,
       CAST(floor_share + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc_tokens
FROM r
"""

QUERIES["mixture_budget_allocation"] = Q(
    mixture_budget_allocation,
    MIXTURE_BUDGET_ALLOCATION_SQL,
    "largest-remainder token-budget allocation across sources (Σ == budget exactly)",
)


def quality_weighted_sample(spark, sf_dir):
    """Deterministic quality-weighted sampling (the CCNet/FineWeb-style
    soft filter): each document survives with probability proportional
    to its quality score, but the coin is md5(doc_id) — a pure row
    function, layout-invariant and replayable (see
    tests/test_api_surface_pins.py for why df.sample cannot do this).
    Quality here = bounded stopword-density ppm; keep iff
    md5_64(doc_id) mod 10⁶ < quality_ppm. Zero shuffles for the
    decision; the per-language acceptance report is one partial agg."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stop = F.array(F.lit("the"), F.lit("a"), F.lit("and"), F.lit("of"), F.lit("to"))
    stop_cnt = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    q_ppm = F.least(
        F.lit(1_000_000).cast("long"),
        (stop_cnt.cast("long") * 10_000_000 / F.size(toks).cast("long")).cast("long"),
    )
    coin = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10).cast(
        "long"
    ) % 1_000_000
    d = docs.select("doc_id", "lang", q_ppm.alias("q_ppm"), coin.alias("coin"))
    return d.groupBy("lang").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum((F.col("coin") < F.col("q_ppm")).cast("long")).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("coin") < F.col("q_ppm"), F.col("doc_id"))).cast("long").alias("kept_id_sum"),
    )


QUALITY_WEIGHTED_SAMPLE_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         LEAST(1000000,
               CAST(len(list_filter(string_split(text, ' '),
                                    x -> x IN ('the','a','and','of','to'))) * 10000000
                    / len(string_split(text, ' ')) AS BIGINT)) AS q_ppm,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % 1000000 AS coin
  FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN coin < q_ppm THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN coin < q_ppm THEN doc_id END) AS BIGINT) AS kept_id_sum
FROM d GROUP BY lang
"""

QUERIES["quality_weighted_sample"] = Q(
    quality_weighted_sample,
    QUALITY_WEIGHTED_SAMPLE_SQL,
    "deterministic soft filter: survival probability ∝ quality, md5 coin, zero-shuffle",
)


_PACK_GRID = (256, 512, 1024)


def packing_efficiency_grid(spark, sf_dir):
    """Sequence-length budget tuning: the packing kernel evaluated at
    three max-token budgets in one result — per budget, bins opened,
    docs per bin (×1000 grid), and fill ratio ppm (packed tokens ÷ bin
    capacity). Each budget reuses the identical shard/prefix-sum plan
    (the config is a literal, so Catalyst compiles three parallel
    branches over one scan lineage); the comparison is what picks
    max_len for a training run."""
    docs = load(spark, sf_dir, "documents")
    outs = []
    for budget in _PACK_GRID:
        packed = S.pack_sequences(docs, max_tokens=budget, n_shards=8)
        bins = packed.groupBy("shard", "pack_id").agg(
            F.count("*").alias("n_docs"), F.sum("n_tokens").alias("toks")
        )
        outs.append(
            bins.agg(
                F.lit(budget).cast("bigint").alias("max_tokens"),
                F.count("*").cast("bigint").alias("n_bins"),
                F.expr("SUM(n_docs) * 1000 DIV COUNT(*)")
                .cast("bigint")
                .alias("docs_per_bin_milli"),
                F.expr(f"SUM(toks) * 1000000 DIV (COUNT(*) * {budget})")
                .cast("bigint")
                .alias("fill_ppm"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out.orderBy("max_tokens")


def _packing_grid_oracle_sql() -> str:
    selects = []
    for budget in _PACK_GRID:
        selects.append(
            f"""(
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT shard, n_tokens,
         CAST(COALESCE(SUM(n_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // {budget}
           AS BIGINT) AS pack_id
  FROM toks
), bins AS (
  SELECT shard, pack_id, COUNT(*) AS n_docs, SUM(n_tokens) AS toks
  FROM packed GROUP BY shard, pack_id
)
SELECT CAST({budget} AS BIGINT) AS max_tokens,
       CAST(COUNT(*) AS BIGINT) AS n_bins,
       CAST(SUM(n_docs) * 1000 // COUNT(*) AS BIGINT) AS docs_per_bin_milli,
       CAST(SUM(toks) * 1000000 // (COUNT(*) * {budget}) AS BIGINT) AS fill_ppm
FROM bins
)"""
        )
    return "\nUNION ALL\n".join(selects) + "\nORDER BY max_tokens"


QUERIES["packing_efficiency_grid"] = Q(
    packing_efficiency_grid,
    _packing_grid_oracle_sql(),
    "packing fill/bin stats across three max-token budgets in one result",
)
