"""Training-data curation operators: sequence packing, stratified sampling,
benchmark decontamination, deterministic shuffle.

These are the corpus-assembly steps that sit AFTER dedup/quality filtering
in a large-scale LLM data pipeline (no reference counterpart — the
reference stops at per-session state; these extend the engine's
training-prep surface alongside operators/dedup.py and operators/textops.py).

Everything is expressed in built-in JVM-side functions — no Python in any
hot path — and every randomized choice is a deterministic md5 hash so runs
are reproducible and cross-engine checkable (the same property the dedup
family relies on).

100 TB notes per operator are on the docstrings; the common theme: one
shuffle each, keyed to spread uniformly (hash of id), no global ordering
except where the semantics demand it — and there it is sharded first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .dedup import _text_md5_int, shingles


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count — the packing currency (textops has the
    richer BPE-ish counter; packing only needs a monotone proxy)."""
    return df.withColumn(
        "n_tokens", F.size(F.split(F.col(text_col), " ")).cast("long")
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int = 512,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a training-sequence pack: contiguous-fill
    bin packing within deterministic shards.

    Docs are hash-sharded, ordered by id within the shard, and a doc opens
    a new pack when the running token total before it crosses a
    ``max_tokens`` boundary (``pack_id = floor(cum_before / max_tokens)``).
    Oversized docs are NOT split — their pack simply overflows (splitting
    is the tokenizer's job downstream).

    Scale: the only sequential structure is the per-shard prefix sum — a
    window over ``shard`` partitions, so parallelism = ``n_shards``; size
    ``n_shards`` to the cluster (it is a semantic parameter here: shard
    membership and therefore pack assignment is deterministic in
    ``id % n_shards``, never in the physical partitioning). One shuffle.
    """
    toks = with_token_counts(df, text_col).select(
        F.col(id_col), (F.col(id_col) % n_shards).alias("shard"), "n_tokens"
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return toks.withColumn(
        "pack_id", F.floor(cum_before / max_tokens).cast("long")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "s1",
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum downsampling with a deterministic keep decision:
    ``md5(id:salt) % 10000 < rate_of(stratum) * 10000``.

    This is the data-mixing primitive (e.g. keep 10% of low-quality web,
    100% of books): reweighting a corpus without materializing a random
    state. The hash makes the sample stable across runs/engines and
    re-salting draws an independent sample. Pure map — no shuffle at all;
    the filter pushes to the scan when the stratum column is a partition
    key of the lake table."""
    rate = None
    for stratum, r in rates.items():
        cond = F.lit(int(r * 10000))
        rate = (
            F.when(F.col(strata_col) == stratum, cond)
            if rate is None
            else rate.when(F.col(strata_col) == stratum, cond)
        )
    rate = (rate.otherwise(F.lit(int(default_rate * 10000)))
            if rate is not None else F.lit(int(default_rate * 10000)))
    bucket = (
        _text_md5_int(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        % 10000
    )
    return df.withColumn("keep_bucket", bucket).filter(F.col("keep_bucket") < rate)


def ngram_decontaminate(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training docs that share any word ``n``-gram with a benchmark
    set (eval-contamination scrubbing, the n-gram-overlap method used by
    the GPT-3/PaLM data papers).

    Shape: shingle both sides, inner-join on the shingle string, distinct
    doc ids, LEFT SEMI back onto the corpus → ``contaminated`` flag.
    Scale: the benchmark side is tiny (eval sets are KBs–MBs) so its
    shingle index broadcasts; the corpus side streams through one
    projection + broadcast-hash probe — no corpus shuffle. 8-grams keep
    the benchmark index small and false-positive rate negligible."""
    corpus_sh = shingles(df, text_col, n, id_col)
    bench_sh = F.broadcast(
        shingles(benchmark, text_col, n, id_col).select(
            F.col("shingle").alias("b_shingle")
        ).distinct()
    )
    hits = (
        corpus_sh.join(bench_sh, corpus_sh.shingle == bench_sh.b_shingle)
        .select(id_col)
        .distinct()
    )
    return df.join(
        hits.withColumn("contaminated", F.lit(1)), id_col, "left"
    ).withColumn("contaminated", F.coalesce("contaminated", F.lit(0)))


def shuffle_order(
    df: DataFrame, seed: str = "epoch0", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle for training order: rank docs by
    ``md5(id:seed)``. A new seed is a fresh permutation (epoch reshuffle).

    Scale: the order key is computed map-side; the global sort is a range
    exchange Spark executes as sample → range-partition → local sort (no
    single-node bottleneck). Downstream writers should write one file per
    partition to preserve the order lazily rather than collecting."""
    key = _text_md5_int(F.concat(F.col(id_col).cast("string"), F.lit(":" + seed)))
    return df.withColumn("shuffle_key", key).orderBy("shuffle_key", id_col)


def temperature_rates(
    df: DataFrame, alpha: float = 0.5, strata_col: str = "source"
) -> DataFrame:
    """Per-domain temperature sampling rates (see ``temperature_mix``):
    (stratum, n_dom, rate_micro). Weights snap to a 1e-6 integer grid
    before normalization so the weight sum is exact int64; every later op
    is the identical IEEE chain in both engines."""
    if alpha == 0.5:
        w_of = F.sqrt  # IEEE-exact; pow() rounding differs across libms
    else:
        w_of = lambda p: F.pow(p, F.lit(alpha))  # noqa: E731
    from pyspark.sql.window import Window

    everything = Window.partitionBy()
    counts = df.groupBy(strata_col).agg(F.count("*").alias("n_dom"))
    return (
        counts.withColumn("n_total", F.sum("n_dom").over(everything))
        .withColumn(
            "w_micro",
            F.round(w_of(F.col("n_dom") / F.col("n_total")) * 1e6).cast("long"),
        )
        .withColumn("w_sum", F.sum("w_micro").over(everything))
        .withColumn(
            "rate_micro",
            F.least(
                F.round(
                    (F.col("w_micro") / F.col("w_sum"))
                    * F.col("n_total")
                    / F.col("n_dom")
                    * 1e6
                ).cast("long"),
                F.lit(1_000_000).cast("long"),
            ),
        )
        .select(strata_col, F.col("n_dom").cast("long").alias("n_dom"), "rate_micro")
    )


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.5,
    strata_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "t1",
) -> DataFrame:
    """Temperature-scaled domain mixing: resample so domain i's share moves
    from p_i toward p_i^alpha / Σ p_j^alpha (alpha < 1 flattens the domain
    distribution — the multilingual/multi-domain sampling rule from the
    XLM-R / mT5 data recipes). Returns the kept rows plus the per-domain
    target rate in micro-units.

    Determinism across engines: domain weights land on a 1e-6 integer grid
    BEFORE normalization (the weight SUM is exact int64, so no
    float-summation-order hazard), the rate expression is the identical
    chain of IEEE ops on exact integers in both engines, and the per-row
    keep decision is the md5(id:salt) bucket rule shared with
    ``stratified_sample``. alpha=0.5 uses sqrt (correctly rounded by
    IEEE 754, unlike pow, which libms round differently).

    Scale: one count aggregation over the corpus (partial-agg, tiny
    result), rates computed on the ~|domains| row table, broadcast back,
    keep-filter is a map — the corpus shuffles zero times. Rates > 1
    (upsampled tail domains) are capped at 1 here; the caller repeats kept
    tail rows by epoch to realize upsampling (the standard practice)."""
    rates = temperature_rates(df, alpha, strata_col).select(
        strata_col, "rate_micro"
    )
    bucket = (
        _text_md5_int(F.concat(F.col(id_col).cast("string"), F.lit(":" + salt)))
        % 1_000_000
    )
    return (
        df.join(F.broadcast(rates), strata_col)
        .withColumn("keep_bucket", bucket)
        .filter(F.col("keep_bucket") < F.col("rate_micro"))
    )


NEG_P1 = 2_654_435_761  # Knuth multiplicative hash constants — shared
NEG_P2 = 40_503         # with the oracle so both engines derive the
                        # same negative ids


def negative_samples(
    df, k: int = 4, id_col: str = "doc_id", payload_cols: tuple = ()
):
    """k deterministic in-batch negatives per anchor for contrastive
    training: neg_id(a, j) = (a·P1 + j·P2 + 17) mod N over a contiguous
    id space — a pure function of the anchor id, so reruns and other
    engines agree row-for-row (the same property as the md5 split).
    Slots that collide with their own anchor are dropped, exactly as a
    real pipeline discards accidental positives.

    Scale shape: the slot fan-out is a map-side explode (k rows per
    anchor, no shuffle), the negative lookup is ONE equi-join on the
    computed id. N is a dimension-scale count (stored in table metadata
    in a real deployment). Overflow bound: (N−1)·P1 < 2⁶³ holds for
    N ≤ 2³¹."""
    from pyspark.sql import functions as F

    n = df.count()
    anchors = df.select(F.col(id_col).alias("anchor_id"))
    slots = anchors.select(
        "anchor_id", F.explode(F.array(*[F.lit(j) for j in range(k)])).alias("slot")
    )
    neg = slots.select(
        "anchor_id",
        "slot",
        F.expr(
            f"(anchor_id * {NEG_P1}L + slot * {NEG_P2}L + 17L) % {n}L"
        ).cast("long").alias("neg_id"),
    ).filter(F.col("neg_id") != F.col("anchor_id"))
    side = df.select(
        F.col(id_col).alias("neg_id"), *[F.col(c).alias(f"neg_{c}") for c in payload_cols]
    )
    return neg.join(side, "neg_id").select(
        "anchor_id", "slot", "neg_id", *[f"neg_{c}" for c in payload_cols]
    )
