"""Declared dedup queries over the ``documents`` table, with full DuckDB
oracles — including the MinHash+LSH pipeline, whose hash family
(md5-derived universal hashes mod 2^31-1) is chosen so an external engine
reproduces the signatures bit-for-bit."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup as D
from .base import Q, load

_PERM_VALUES = ", ".join(
    f"({i}, {a}::BIGINT, {b}::BIGINT)" for i, (a, b) in enumerate(zip(D.HASH_A, D.HASH_B))
)

# shared oracle CTEs: distinct 3-gram shingles + shingle-set sizes
_SHINGLE_CTES = """
toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - 2, 0) + 1),
                                 i -> array_to_string(t[i:i+2], ' '))) AS shingle
    FROM toks
  )
),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)
"""


def dedup_exact(spark, sf_dir):
    return D.exact_dup_groups(load(spark, sf_dir, "documents"))


DEDUP_EXACT_SQL = """
SELECT md5(text) AS text_md5, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS dup_cnt
FROM documents GROUP BY md5(text)
"""


def dedup_ngram_jaccard(spark, sf_dir):
    # exact=True: this is the oracle-parity variant (the DuckDB oracle
    # computes full-recall Jaccard); the operator's DEFAULT routes through
    # the LSH candidate filter, which is the declared dedup_minhash_lsh path
    return D.ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.8, exact=True)


DEDUP_NGRAM_JACCARD_SQL = f"""
WITH {_SHINGLE_CTES},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= 0.8
"""


def dedup_minhash_lsh(spark, sf_dir):
    return D.minhash_lsh_pairs(load(spark, sf_dir, "documents"), threshold=0.5)


DEDUP_MINHASH_LSH_SQL = f"""
WITH {_SHINGLE_CTES},
perms AS (SELECT * FROM (VALUES {_PERM_VALUES}) p(i, a, b)),
h0 AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {D.MERSENNE_P} AS h0
  FROM sh
),
sigs AS (
  SELECT doc_id, i, MIN((a * h0 + b) % {D.MERSENNE_P}) AS sig
  FROM h0 CROSS JOIN perms GROUP BY doc_id, i
),
buckets AS (
  SELECT doc_id, (i // {D.BAND_SIZE}) AS band,
         md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bucket
  FROM sigs GROUP BY doc_id, (i // {D.BAND_SIZE})
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b
)
SELECT i.doc_a, i.doc_b,
       ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= 0.5
"""


def dedup_simhash(spark, sf_dir):
    return D.simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=3)


DEDUP_SIMHASH_SQL = """
WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h0 FROM toks),
bits AS (
  SELECT doc_id, j, CASE WHEN (h0 >> j) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS j) jj
),
perbit AS (SELECT doc_id, j, SUM(c) AS s FROM bits GROUP BY doc_id, j),
sv AS MATERIALIZED (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS simhash
  FROM perbit GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM sv a JOIN sv b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""


def dedup_components(spark, sf_dir):
    """Near-dup CLUSTERS: simhash pairs -> connected components
    (operators/dedup.py::connected_components, iterative min-label
    propagation) -> one row per clustered doc with its canonical keeper
    (the component's min doc_id) and cluster size. The oracle computes the
    same transitive closure with a recursive CTE."""
    from pyspark.sql import functions as F

    pairs = D.simhash_pairs(load(spark, sf_dir, "documents"), max_hamming=3)
    comps = D.connected_components(pairs)
    sizes = comps.groupBy("comp").agg(F.count(F.lit(1)).cast("long").alias("cluster_size"))
    return comps.join(sizes, "comp").select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("component"),
        "cluster_size",
    )


DEDUP_COMPONENTS_SQL = """
WITH RECURSIVE toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h0 FROM toks),
bits AS (
  SELECT doc_id, j, CASE WHEN (h0 >> j) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS j) jj
),
perbit AS (SELECT doc_id, j, SUM(c) AS s FROM bits GROUP BY doc_id, j),
sv AS MATERIALIZED (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS simhash
  FROM perbit GROUP BY doc_id
),
prs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sv a JOIN sv b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM prs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM prs
),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
),
comps AS MATERIALIZED (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY node),
csizes AS (SELECT component, COUNT(*) AS cluster_size FROM comps GROUP BY component)
SELECT c.doc_id, c.component, s.cluster_size
FROM comps c JOIN csizes s USING (component)
"""


def dedup_keep_corpus(spark, sf_dir):
    """The dedup END PRODUCT: drop every clustered doc except its
    component's canonical keeper (min doc_id), keep all unclustered docs —
    one anti-join from clusters to the corpus. Returns the kept doc ids
    with a keeper flag (true = survived a cluster, false = never
    duplicated)."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    pairs = D.simhash_pairs(docs, max_hamming=3)
    comps = D.connected_components(pairs)
    drop = comps.filter(F.col("node") != F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    keepers = comps.filter(F.col("node") == F.col("comp")).select(
        F.col("node").alias("doc_id")
    )
    return (
        docs.join(drop, "doc_id", "left_anti")
        .join(keepers.withColumn("is_cluster_keeper", F.lit(True)), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("is_cluster_keeper"), F.lit(False)).alias("is_cluster_keeper"),
        )
    )


_CLOSURE_CTES = """toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
h AS (SELECT doc_id, CAST('0x' || substr(md5(tok), 1, 15) AS BIGINT) AS h0 FROM toks),
bits AS (
  SELECT doc_id, j, CASE WHEN (h0 >> j) & 1 = 1 THEN 1 ELSE -1 END AS c
  FROM h CROSS JOIN (SELECT unnest(range(0, 32)) AS j) jj
),
perbit AS (SELECT doc_id, j, SUM(c) AS s FROM bits GROUP BY doc_id, j),
sv AS MATERIALIZED (
  SELECT doc_id,
         SUM(CASE WHEN s > 0 THEN (1::BIGINT << j) ELSE 0::BIGINT END) AS simhash
  FROM perbit GROUP BY doc_id
),
prs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sv a JOIN sv b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),
edges AS MATERIALIZED (
  SELECT doc_a AS a, doc_b AS b FROM prs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM prs
),
reach(node, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
),
comps AS MATERIALIZED (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY node)"""


DEDUP_KEEP_CORPUS_SQL = f"""
WITH RECURSIVE {_CLOSURE_CTES}
SELECT d.doc_id,
       COALESCE(c.doc_id = c.component, FALSE) AS is_cluster_keeper
FROM documents d LEFT JOIN comps c USING (doc_id)
WHERE c.doc_id IS NULL OR c.doc_id = c.component
"""


def dedup_bloom_incremental(spark, sf_dir):
    """Incremental-ingest dedup (operators/dedup.py::bloom_build/bloom_probe):
    history = docs with doc_id % 3 == 0 is compressed into a fixed-size
    bloom filter (packed int64 words, a broadcast artifact); every doc is
    then probed with a map-only bit test — history never joins the probe
    side. ``true_dup`` (an exact md5 semi-join, gate-only bookkeeping)
    lets the oracle verify both guarantees: no false negatives (every
    true dup hits) and the false-positive rate the small gate filter
    forces into view."""
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    packed = D.bloom_build(hist)
    hist_md5 = hist.select(F.md5("text").alias("h")).distinct().withColumn(
        "true_dup", F.lit(True)
    )
    return (
        D.bloom_probe(docs, packed)
        .withColumn("h", F.md5("text"))
        .join(F.broadcast(hist_md5), "h", "left")
        .select(
            "doc_id",
            "bloom_hit",
            F.coalesce("true_dup", F.lit(False)).alias("true_dup"),
        )
    )


def _bloom_pos_list_sql(m: int) -> str:
    return ", ".join(
        f"CAST('0x' || substr(md5(text), {1 + 8 * j}, 8) AS BIGINT) % {m}"
        for j in range(D.BLOOM_K)
    )


DEDUP_BLOOM_SQL = f"""
WITH hist AS (SELECT text FROM documents WHERE doc_id % 3 = 0),
hpos AS (
  SELECT DISTINCT pos FROM (
    SELECT unnest([{_bloom_pos_list_sql(D.BLOOM_M_BITS)}]) AS pos FROM hist
  )
),
probes AS (
  SELECT doc_id, unnest([{_bloom_pos_list_sql(D.BLOOM_M_BITS)}]) AS pos
  FROM documents
),
hits AS (
  SELECT doc_id,
         SUM(CASE WHEN pos IN (SELECT pos FROM hpos) THEN 1 ELSE 0 END)
           = {D.BLOOM_K} AS bloom_hit
  FROM probes GROUP BY doc_id
)
SELECT d.doc_id, h.bloom_hit,
       md5(d.text) IN (SELECT md5(text) FROM hist) AS true_dup
FROM documents d JOIN hits h USING (doc_id)
"""


QUERIES = {
    "dedup_exact": Q(dedup_exact, DEDUP_EXACT_SQL, "exact hash dedup"),
    "dedup_ngram_jaccard": Q(dedup_ngram_jaccard, DEDUP_NGRAM_JACCARD_SQL, "3-gram Jaccard near-dup"),
    "dedup_minhash_lsh": Q(dedup_minhash_lsh, DEDUP_MINHASH_LSH_SQL, "MinHash+LSH near-dup"),
    "dedup_simhash": Q(dedup_simhash, DEDUP_SIMHASH_SQL, "SimHash near-dup"),
    "dedup_components": Q(
        dedup_components, DEDUP_COMPONENTS_SQL, "near-dup clusters via connected components"
    ),
    "dedup_keep_corpus": Q(
        dedup_keep_corpus, DEDUP_KEEP_CORPUS_SQL, "deduplicated corpus (cluster keepers + singles)"
    ),
    "dedup_bloom_incremental": Q(
        dedup_bloom_incremental,
        DEDUP_BLOOM_SQL,
        "bloom-filter incremental dedup vs a history corpus",
    ),
}


def dedup_span_detect(spark, sf_dir):
    """Duplicated-substring spans (operators/dedup.py::dup_spans): the
    n-gram approximation of suffix-array substring dedup — maximal runs
    of 8-token grams that occur more than once in the corpus."""
    return D.dup_spans(load(spark, sf_dir, "documents"))


DEDUP_SPAN_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id, x.pos AS pos, x.g AS g FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(t) - {D.SPAN_K - 1}, 0) + 1),
               i -> {{'pos': i, 'g': md5(array_to_string(t[i:i+{D.SPAN_K - 1}], ' '))}})) AS x
    FROM toks)
),
dupg AS (SELECT g FROM grams GROUP BY g HAVING COUNT(*) > 1),
marks AS (
  SELECT DISTINCT doc_id, pos FROM grams WHERE g IN (SELECT g FROM dupg)
),
isl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
                   <= {D.SPAN_K} THEN 0 ELSE 1 END AS brk
  FROM marks
),
sp AS (
  SELECT doc_id, pos,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS span_id
  FROM isl
)
SELECT doc_id,
       CAST(MIN(pos) AS BIGINT) AS start_pos,
       CAST(MAX(pos) + {D.SPAN_K - 1} AS BIGINT) AS end_pos,
       CAST(MAX(pos) + {D.SPAN_K - 1} - MIN(pos) + 1 AS BIGINT) AS span_tokens,
       COUNT(*) AS n_dup_grams
FROM sp GROUP BY doc_id, span_id
"""

QUERIES["dedup_span_detect"] = Q(
    dedup_span_detect,
    DEDUP_SPAN_SQL,
    "duplicated-substring spans (suffix-array approximation)",
)


def dedup_minhash_incremental(spark, sf_dir):
    """Incremental near-dup (operators/dedup.py::minhash_lsh_incremental):
    the odd-id half of the corpus arrives as a NEW batch and probes the
    even-id half's stored LSH band index — cost scales with the batch,
    never the history. Answers the incremental corpus build's question:
    is anything in this drop a near-dup of what we already have."""
    docs = load(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return D.minhash_lsh_incremental(hist, new, threshold=0.5)


DEDUP_MINHASH_INCREMENTAL_SQL = f"""
WITH {_SHINGLE_CTES},
perms AS (SELECT * FROM (VALUES {_PERM_VALUES}) p(i, a, b)),
h0 AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {D.MERSENNE_P} AS h0
  FROM sh
),
sigs AS (
  SELECT doc_id, i, MIN((a * h0 + b) % {D.MERSENNE_P}) AS sig
  FROM h0 CROSS JOIN perms GROUP BY doc_id, i
),
buckets AS (
  SELECT doc_id, (i // {D.BAND_SIZE}) AS band,
         md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bucket
  FROM sigs GROUP BY doc_id, (i // {D.BAND_SIZE})
),
cands AS (
  SELECT DISTINCT n.doc_id AS doc_new, h.doc_id AS doc_hist
  FROM buckets n JOIN buckets h
    ON n.band = h.band AND n.bucket = h.bucket
  WHERE n.doc_id % 2 = 1 AND h.doc_id % 2 = 0
),
inter AS (
  SELECT c.doc_new, c.doc_hist, COUNT(*) AS inter
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_new
  JOIN sh b ON b.doc_id = c.doc_hist AND b.shingle = a.shingle
  GROUP BY c.doc_new, c.doc_hist
)
SELECT i.doc_new, i.doc_hist,
       ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_new
JOIN sizes sb ON sb.doc_id = i.doc_hist
WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= 0.5
"""

QUERIES["dedup_minhash_incremental"] = Q(
    dedup_minhash_incremental,
    DEDUP_MINHASH_INCREMENTAL_SQL,
    "incremental MinHash probe of a new batch vs the stored LSH index",
)


def dedup_keeper_by_quality(spark, sf_dir):
    """Quality-aware canonical selection: within each near-dup cluster
    keep the LONGEST document (ties → smallest doc_id) instead of the
    min-id default — the policy real corpus builds use (the longest
    variant usually carries the most content). One grouped max_by over
    the component labels joined to the doc lengths."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.simhash_pairs(docs, max_hamming=3)
    comps = D.connected_components(pairs)
    members = comps.select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    ).join(docs.select("doc_id", "n_chars"), "doc_id")
    return (
        members.groupBy("component")
        .agg(
            F.max_by(
                F.col("doc_id"), F.struct(F.col("n_chars"), -F.col("doc_id"))
            ).cast("long").alias("keeper_doc_id"),
            F.max("n_chars").cast("long").alias("keeper_n_chars"),
            F.count("*").cast("long").alias("n_members"),
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Scale-tractable oracle variants for the three closure-based gates.
#
# The driver-gate oracles above construct ground truth by BRUTE FORCE —
# an O(N²) all-pairs simhash join — deliberately independent of the
# engine's blocking. That independence is affordable at the driver's
# sf0.01 gate scale but infeasible at the sf1 derivative (1.25B
# comparisons burned >45 CPU-min per query without completing —
# SWEEPS.md). These variants replace ONLY the pair-generation CTE with
# a LOSSLESS pigeonhole blocking: for hamming distance <= 3 on a 32-bit
# simhash, any qualifying pair agrees exactly on at least one of 4
# disjoint 8-bit blocks, so a block equi-join followed by the same
# exact bit_count verify produces the IDENTICAL pair set (proved
# equivalent against the brute-force SQL at sf0.001 and sf0.01 by
# tests/test_scale_oracles.py). Everything downstream of `prs` is the
# shared closure text. Used by beyond-driver-scale sweeps via
# SPARK_GRAFT_SCALE_ORACLES=1 (tests/driver_replica.py); the driver's
# own gates keep the brute-force construction.
SCALE_ORACLES: dict[str, str] = {}  # filled below once the gate SQL exists


DEDUP_KEEPER_BY_QUALITY_SQL = f"""
WITH RECURSIVE {_CLOSURE_CTES},
members AS (
  SELECT c.component, c.doc_id, d.n_chars
  FROM comps c JOIN documents d USING (doc_id)
),
ranked AS (
  SELECT component, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY component
                            ORDER BY n_chars DESC, doc_id ASC) AS rn
  FROM members
)
SELECT m.component,
       CAST(r.doc_id AS BIGINT) AS keeper_doc_id,
       CAST(MAX(m.n_chars) AS BIGINT) AS keeper_n_chars,
       CAST(COUNT(*) AS BIGINT) AS n_members
FROM members m JOIN ranked r ON r.component = m.component AND r.rn = 1
GROUP BY m.component, r.doc_id
ORDER BY m.component
"""

QUERIES["dedup_keeper_by_quality"] = Q(
    dedup_keeper_by_quality,
    DEDUP_KEEPER_BY_QUALITY_SQL,
    "quality-aware (longest-doc) canonical keeper per near-dup cluster",
)

_PRS_BRUTE = """prs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sv a JOIN sv b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),"""
_PRS_BLOCKED = """blk AS MATERIALIZED (
  SELECT doc_id, simhash, g.b AS blk_i,
         (simhash >> (g.b * 8)) & 255 AS blk_v
  FROM sv, UNNEST(range(0, 4)) AS g(b)
),
prs AS MATERIALIZED (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM blk a JOIN blk b
    ON a.blk_i = b.blk_i AND a.blk_v = b.blk_v AND a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
),"""
# The recursive reachability closure is the OTHER scale wall: it
# enumerates every (node, root-candidate) pair along every edge —
# O(cluster²) working set per component — and exceeds a 45-minute budget
# at sf1 even with the CTE chain materialized. The scale variant unrolls
# min-label propagation (new_label = min(own, neighbors')) for a fixed
# round budget and PROVES ITS OWN FIXPOINT in-SQL: the final `comps`
# NULLs every component unless the last round changed nothing, so an
# under-provisioned round budget poisons the value-hash loudly instead
# of silently under-merging. Independence is preserved — the oracle does
# not trust the engine's iteration count, it certifies convergence.
_REACH_RECURSIVE = """reach(node, comp) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
),
comps AS MATERIALIZED (SELECT node AS doc_id, MIN(comp) AS component FROM reach GROUP BY node)"""

_LP_ROUNDS = 20  # pointer-jumping: covers ~2^20-node chains; convergence-checked


def _unrolled_minlabel_sql(rounds: int = _LP_ROUNDS) -> str:
    # each round combines neighbor-min propagation with a pointer jump
    # (label of my label — always a node of the same component, since a
    # label is the min id seen so far over reachable nodes), the classic
    # hybrid that converges in O(log n) rounds instead of O(diameter):
    # at sf1 the ~1.4k random cross-copy simhash collisions chain
    # clusters into paths longer than any fixed plain-propagation budget
    parts = [
        "l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM edges)"
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f"""l{r} AS MATERIALIZED (
  SELECT l.node, LEAST(MIN(ll.label), MIN(nl.label)) AS label
  FROM l{r - 1} l
  JOIN l{r - 1} ll ON ll.node = l.label
  JOIN edges e ON e.a = l.node
  JOIN l{r - 1} nl ON nl.node = e.b
  GROUP BY l.node
)"""
        )
    parts.append(
        f"""conv AS (
  SELECT COUNT(*) AS n_changed
  FROM l{rounds} a JOIN l{rounds - 1} b USING (node)
  WHERE a.label <> b.label
)"""
    )
    parts.append(
        f"""comps AS MATERIALIZED (
  SELECT node AS doc_id,
         CASE WHEN (SELECT n_changed FROM conv) = 0 THEN label END AS component
  FROM l{rounds}
)"""
    )
    return ",\n".join(parts)


_REACH_UNROLLED = _unrolled_minlabel_sql()

for _name, _sql in (
    ("dedup_components", DEDUP_COMPONENTS_SQL),
    ("dedup_keep_corpus", DEDUP_KEEP_CORPUS_SQL),
    ("dedup_keeper_by_quality", DEDUP_KEEPER_BY_QUALITY_SQL),
):
    assert _PRS_BRUTE in _sql, _name
    assert _REACH_RECURSIVE in _sql, _name
    SCALE_ORACLES[_name] = _sql.replace(_PRS_BRUTE, _PRS_BLOCKED).replace(
        _REACH_RECURSIVE, _REACH_UNROLLED
    )


def dedup_lsh_recall(spark, sf_dir):
    """Measured recall of the MinHash-LSH candidate generator against the
    exact n-gram-Jaccard truth set at the gate threshold (J >= 0.5) — the
    dedup-side analogue of ann_ivf_recall: the banding scheme's recall
    claim (~1-(1-J^4)^8) quantified on real data as a hard integer
    signal. Also reports how many candidates the exact verify rejects
    (banding false positives — the work the verify stage pays for)."""
    docs = load(spark, sf_dir, "documents")
    truth = D.ngram_jaccard_pairs(docs, threshold=0.5, exact=True).select(
        "doc_a", "doc_b"
    )
    buckets = D.minhash_band_buckets(D.minhash_signatures(D.shingles(docs)))
    a, b = buckets.alias("a"), buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
        .localCheckpoint()
    )
    hit = truth.join(cands, ["doc_a", "doc_b"])
    n_true = truth.agg(F.count("*").cast("long").alias("n_true"))
    n_cand = cands.agg(F.count("*").cast("long").alias("n_candidates"))
    n_hit = hit.agg(F.count("*").cast("long").alias("n_hit"))
    return (
        n_true.crossJoin(n_cand)
        .crossJoin(n_hit)
        .select(
            "n_true",
            "n_candidates",
            "n_hit",
            (F.col("n_candidates") - F.col("n_hit")).alias("n_cand_rejected"),
            F.expr("(n_hit * 1000000) DIV NULLIF(n_true, 0)").cast("long").alias("recall_ppm"),
        )
    )


DEDUP_LSH_RECALL_SQL = f"""
WITH {_SHINGLE_CTES},
inter_all AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
truth AS (
  SELECT i.doc_a, i.doc_b
  FROM inter_all i
  JOIN sizes sa ON sa.doc_id = i.doc_a
  JOIN sizes sb ON sb.doc_id = i.doc_b
  WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= 0.5
),
perms AS (SELECT * FROM (VALUES {_PERM_VALUES}) p(i, a, b)),
h0 AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {D.MERSENNE_P} AS h0
  FROM sh
),
sigs AS (
  SELECT doc_id, i, MIN((a * h0 + b) % {D.MERSENNE_P}) AS sig
  FROM h0 CROSS JOIN perms GROUP BY doc_id, i
),
buckets AS (
  SELECT doc_id, (i // {D.BAND_SIZE}) AS band,
         md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bucket
  FROM sigs GROUP BY doc_id, (i // {D.BAND_SIZE})
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
hit AS (SELECT * FROM truth INTERSECT SELECT * FROM cands),
c AS (
  SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
         CAST((SELECT COUNT(*) FROM cands) AS BIGINT) AS n_candidates,
         CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit
)
SELECT n_true, n_candidates, n_hit,
       n_candidates - n_hit AS n_cand_rejected,
       CAST((n_hit * 1000000) // NULLIF(n_true, 0) AS BIGINT) AS recall_ppm
FROM c
"""

QUERIES["dedup_lsh_recall"] = Q(
    dedup_lsh_recall,
    DEDUP_LSH_RECALL_SQL,
    "measured LSH candidate recall vs exact Jaccard truth at J>=0.5",
)


def _fuzzy_entity_corpus(spark, sf_dir):
    """(clean, dirty) record-linkage corpus shared by the fuzzy_* gates:
    clean = every part's entity string (name + brand + type + size,
    ~5 tokens, near-unique per part); dirty = the same string with the
    token at position p_partkey mod len dropped (a clipped/typo'd catalog
    feed), id offset by 10^7 to share one id space."""
    part = load(spark, sf_dir, "part").withColumn(
        "entity",
        F.concat_ws(
            " ", "p_name", "p_brand", "p_type", F.col("p_size").cast("string")
        ),
    )
    clean = part.select(
        F.col("p_partkey").cast("long").alias("doc_id"), F.col("entity").alias("text")
    )
    toks = F.split("entity", " ")
    di = F.pmod(F.col("p_partkey"), F.size(toks))
    dirty = part.select(
        (F.col("p_partkey").cast("long") + 10_000_000).alias("doc_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.slice(toks, 1, di),
                F.slice(toks, di + 2, F.size(toks) - di - 1),
            ),
        ).alias("text"),
    )
    return clean, dirty


def fuzzy_entity_match(spark, sf_dir):
    """Fuzzy entity resolution as an LSH join: a deterministically
    dirtied copy of every part's entity string (see
    ``_fuzzy_entity_corpus``) is matched back to the clean catalog
    through the SAME MinHash index machinery as incremental dedup, on
    1-gram (word-set) shingles at J >= 0.6. A dropped token leaves
    J = (k-1)/k = 0.8 vs the source while unrelated parts share at most
    2-3 tokens (J <= ~0.43), so banding recovers the link without any
    all-pairs comparison — the record-linkage shape (blocking + verify)
    at catalog scale."""
    clean, dirty = _fuzzy_entity_corpus(spark, sf_dir)
    return (
        # max_bucket=256: p99.9 bucket size is ~62 even at the 100×-bench
        # decade, but brand/size tokens are shared across the whole
        # catalog, so a handful of degenerate shared-token buckets grow
        # linearly with catalog size and their pair fan-out quadratically
        # (measured: max bucket 13,578 at 2M parts → ~10^8 verify pairs
        # from those buckets alone). The cap keeps candidate volume
        # linear at a measured recall cost of 0.05% of matches at sf0.1
        # (35,609 vs 35,625) and 0.10% at sf1 (357,412 vs 357,751) —
        # the dropped links are those whose ONLY colliding band is a
        # degenerate shared-token bucket. The oracle applies the same
        # cap, so the driver gate checks the capped semantics exactly.
        # verify="array": entity strings are ~5 tokens, so the exact
        # Jaccard runs as array_intersect on the pair list instead of the
        # exploded index join (same values; profiled 6.5 GB less shuffle
        # at the 100×-bench decade)
        D.minhash_lsh_incremental(
            clean, dirty, threshold=0.6, n=1, max_bucket=256, verify="array"
        )
        .select(
            F.col("doc_new").alias("dirty_id"),
            F.col("doc_hist").alias("part_id"),
            "jaccard",
        )
        .orderBy("dirty_id", "part_id")
    )


_FUZZY_CTES = f"""t0 AS (
  SELECT CAST(p_partkey AS BIGINT) AS pk,
         p_name || ' ' || p_brand || ' ' || p_type || ' ' || CAST(p_size AS VARCHAR) AS entity,
         string_split(p_name || ' ' || p_brand || ' ' || p_type || ' ' || CAST(p_size AS VARCHAR), ' ') AS t
  FROM part
),
docs2 AS (
  SELECT pk AS doc_id, entity AS text FROM t0
  UNION ALL
  SELECT pk + 10000000 AS doc_id,
         array_to_string(
           list_concat(t[1:(pk % len(t))], t[(pk % len(t)) + 2:len(t)]), ' '
         ) AS text
  FROM t0
),
sh AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS shingle FROM docs2),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
perms AS (SELECT * FROM (VALUES {_PERM_VALUES}) p(i, a, b)),
h0 AS (
  SELECT doc_id, CAST('0x' || substr(md5(shingle), 1, 15) AS BIGINT) % {D.MERSENNE_P} AS h0
  FROM sh
),
sigs AS (
  SELECT doc_id, i, MIN((a * h0 + b) % {D.MERSENNE_P}) AS sig
  FROM h0 CROSS JOIN perms GROUP BY doc_id, i
),
buckets AS (
  SELECT doc_id, (i // {D.BAND_SIZE}) AS band,
         md5(string_agg(sig::VARCHAR, ',' ORDER BY i)) AS bucket
  FROM sigs GROUP BY doc_id, (i // {D.BAND_SIZE})
),
bkt_ok AS (
  -- mirror of max_bucket=256: drop (band, bucket) groups larger than the
  -- cap on either side before pairing
  SELECT band, bucket,
         COUNT(*) FILTER (WHERE doc_id < 10000000) AS n_h,
         COUNT(*) FILTER (WHERE doc_id >= 10000000) AS n_n
  FROM buckets GROUP BY band, bucket
),
cands AS (
  SELECT DISTINCT n.doc_id AS dirty_id, h.doc_id AS part_id
  FROM buckets n
  JOIN buckets h ON n.band = h.band AND n.bucket = h.bucket
  JOIN bkt_ok k ON k.band = n.band AND k.bucket = n.bucket
  WHERE n.doc_id >= 10000000 AND h.doc_id < 10000000
    AND k.n_h <= 256 AND k.n_n <= 256
)"""

FUZZY_ENTITY_MATCH_SQL = f"""
WITH {_FUZZY_CTES},
inter AS (
  SELECT c.dirty_id, c.part_id, COUNT(*) AS inter
  FROM cands c
  JOIN sh a ON a.doc_id = c.dirty_id
  JOIN sh b ON b.doc_id = c.part_id AND b.shingle = a.shingle
  GROUP BY c.dirty_id, c.part_id
)
SELECT i.dirty_id, i.part_id,
       ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.dirty_id
JOIN sizes sb ON sb.doc_id = i.part_id
WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= 0.6
ORDER BY i.dirty_id, i.part_id
"""

QUERIES["fuzzy_entity_match"] = Q(
    fuzzy_entity_match,
    FUZZY_ENTITY_MATCH_SQL,
    "LSH-blocked fuzzy entity resolution of dirtied part names",
)


def fuzzy_best_link(spark, sf_dir):
    """Entity-resolution DECISION stage: among each dirty record's
    LSH-candidate matches (`fuzzy_entity_match`), pick the single best
    link by Levenshtein edit distance of the full entity strings
    (tie → smallest part id) — blocking bounds the candidate set, the
    edit distance (identical dynamic program in both engines) makes the
    final call, the one-row-per-entity argmin is a grouped min_by. The
    expensive distance runs ONLY on banded candidates, never all pairs."""
    part = load(spark, sf_dir, "part").withColumn(
        "entity",
        F.concat_ws(
            " ", "p_name", "p_brand", "p_type", F.col("p_size").cast("string")
        ),
    )
    matches = fuzzy_entity_match(spark, sf_dir).select("dirty_id", "part_id")
    toks = F.split("entity", " ")
    di = F.pmod(F.col("p_partkey"), F.size(toks))
    dirty = part.select(
        (F.col("p_partkey").cast("long") + 10_000_000).alias("dirty_id"),
        F.concat_ws(
            " ",
            F.concat(
                F.slice(toks, 1, di), F.slice(toks, di + 2, F.size(toks) - di - 1)
            ),
        ).alias("dirty_entity"),
    )
    clean = part.select(
        F.col("p_partkey").cast("long").alias("part_id"), F.col("entity")
    )
    scored = (
        matches.join(dirty, "dirty_id")
        .join(clean, "part_id")
        .select(
            "dirty_id",
            "part_id",
            F.levenshtein("dirty_entity", "entity").cast("long").alias("edit_dist"),
        )
    )
    return (
        scored.groupBy("dirty_id")
        .agg(
            F.min_by(
                F.col("part_id"), F.struct(F.col("edit_dist"), F.col("part_id"))
            ).cast("long").alias("best_part_id"),
            F.min(F.struct(F.col("edit_dist"), F.col("part_id")))["edit_dist"]
            .cast("long")
            .alias("best_edit_dist"),
            F.count("*").cast("long").alias("n_candidates"),
        )
        .orderBy("dirty_id")
    )


FUZZY_BEST_LINK_SQL = f"""
WITH matches AS ({FUZZY_ENTITY_MATCH_SQL.replace(';', '')}),
t0 AS (
  SELECT CAST(p_partkey AS BIGINT) AS pk,
         p_name || ' ' || p_brand || ' ' || p_type || ' ' || CAST(p_size AS VARCHAR) AS entity,
         string_split(p_name || ' ' || p_brand || ' ' || p_type || ' ' || CAST(p_size AS VARCHAR), ' ') AS t
  FROM part
),
dirty AS (
  SELECT pk + 10000000 AS dirty_id,
         array_to_string(
           list_concat(t[1:(pk % len(t))], t[(pk % len(t)) + 2:len(t)]), ' '
         ) AS dirty_entity
  FROM t0
),
clean AS (SELECT pk AS part_id, entity FROM t0),
scored AS (
  SELECT m.dirty_id, m.part_id,
         CAST(levenshtein(d.dirty_entity, c.entity) AS BIGINT) AS edit_dist
  FROM matches m
  JOIN dirty d USING (dirty_id)
  JOIN clean c USING (part_id)
),
best AS (
  SELECT dirty_id, part_id AS best_part_id, edit_dist AS best_edit_dist,
         ROW_NUMBER() OVER (PARTITION BY dirty_id ORDER BY edit_dist, part_id) AS rn,
         COUNT(*) OVER (PARTITION BY dirty_id) AS n_candidates
  FROM scored
)
SELECT dirty_id, CAST(best_part_id AS BIGINT) AS best_part_id,
       CAST(best_edit_dist AS BIGINT) AS best_edit_dist,
       CAST(n_candidates AS BIGINT) AS n_candidates
FROM best WHERE rn = 1 ORDER BY dirty_id
"""

QUERIES["fuzzy_best_link"] = Q(
    fuzzy_best_link,
    FUZZY_BEST_LINK_SQL,
    "best-link resolution over LSH candidates by Levenshtein distance",
)


def fuzzy_cap_recall(spark, sf_dir):
    """Continuous recall bound for fuzzy_entity_match's max_bucket cap:
    the capped match set is a strict subset of the uncapped one (the cap
    only removes candidate pairs; the exact-Jaccard verify is
    deterministic), so n_capped / n_true IS the cap's recall — measured
    at every gate run instead of the one-time SWEEPS.md claim. The
    uncapped probe is O(sum bucket²) and only tractable at small SFs;
    that is exactly where this gate runs (the driver gates at sf0.01,
    the replica at sf0.1) — at scale the cap's cost model is covered by
    SCALING.md instead."""
    clean, dirty = _fuzzy_entity_corpus(spark, sf_dir)
    capped = D.minhash_lsh_incremental(
        clean, dirty, threshold=0.6, n=1, max_bucket=256, verify="array"
    )
    uncapped = D.minhash_lsh_incremental(
        clean, dirty, threshold=0.6, n=1, verify="array"
    )
    n_true = uncapped.agg(F.count("*").cast("long").alias("n_true"))
    n_cap = capped.agg(F.count("*").cast("long").alias("n_capped"))
    return n_true.crossJoin(n_cap).select(
        "n_true",
        "n_capped",
        (F.col("n_true") - F.col("n_capped")).alias("n_lost"),
        F.expr("(n_capped * 1000000) DIV NULLIF(n_true, 0)").cast("long").alias("recall_ppm"),
    )


FUZZY_CAP_RECALL_SQL = f"""
WITH {_FUZZY_CTES},
cands_all AS (
  SELECT DISTINCT n.doc_id AS dirty_id, h.doc_id AS part_id
  FROM buckets n
  JOIN buckets h ON n.band = h.band AND n.bucket = h.bucket
  WHERE n.doc_id >= 10000000 AND h.doc_id < 10000000
),
inter_all AS (
  SELECT c.dirty_id, c.part_id, COUNT(*) AS inter
  FROM cands_all c
  JOIN sh a ON a.doc_id = c.dirty_id
  JOIN sh b ON b.doc_id = c.part_id AND b.shingle = a.shingle
  GROUP BY c.dirty_id, c.part_id
),
m_all AS (
  SELECT i.dirty_id, i.part_id
  FROM inter_all i
  JOIN sizes sa ON sa.doc_id = i.dirty_id
  JOIN sizes sb ON sb.doc_id = i.part_id
  WHERE ROUND(i.inter / (sa.sz + sb.sz - i.inter), 6) >= 0.6
),
-- capped matches = uncapped matches ∩ capped candidates (verify is
-- deterministic, so no second intersection pass is needed)
m_cap AS (
  SELECT m.dirty_id, m.part_id FROM m_all m JOIN cands c USING (dirty_id, part_id)
),
counts AS (
  SELECT CAST((SELECT COUNT(*) FROM m_all) AS BIGINT) AS n_true,
         CAST((SELECT COUNT(*) FROM m_cap) AS BIGINT) AS n_capped
)
SELECT n_true, n_capped, n_true - n_capped AS n_lost,
       CAST((n_capped * 1000000) // NULLIF(n_true, 0) AS BIGINT) AS recall_ppm
FROM counts
"""

QUERIES["fuzzy_cap_recall"] = Q(
    fuzzy_cap_recall,
    FUZZY_CAP_RECALL_SQL,
    "measured recall of the max_bucket cap vs the uncapped LSH match set",
)


def dedup_prefix_filter(spark, sf_dir):
    """Prefix-filter set-similarity self-join
    (operators/dedup.py::prefix_filter_pairs, the PPJoin family) at
    3-gram-shingle Jaccard >= 0.7 — the exact, LSH-free member of the dedup
    family: rare-token-first global ordering, pigeonhole prefixes as the
    candidate index, exact verify. Unlike banding there are NO false
    negatives at the threshold; the oracle is the same algorithm
    unrolled, and its agreement doubles as the no-miss proof."""
    return (
        D.prefix_filter_pairs(load(spark, sf_dir, "documents"), threshold=0.7)
        .orderBy("doc_a", "doc_b")
    )


DEDUP_PREFIX_FILTER_SQL = f"""
WITH {_SHINGLE_CTES.replace("sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id)", "_sz0 AS (SELECT 1)")},
sset AS (SELECT doc_id, shingle AS tok FROM sh),
sizes2 AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz FROM sset GROUP BY doc_id),
dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM sset GROUP BY tok),
pos AS (
  SELECT t.doc_id, t.tok, s.sz,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY t.doc_id ORDER BY f.df ASC, t.tok ASC) AS BIGINT) AS pos
  FROM sset t JOIN dfreq f USING (tok) JOIN sizes2 s USING (doc_id)
),
prefix AS (
  SELECT doc_id, tok FROM pos
  WHERE pos <= sz - ((7 * sz + 9) // 10) + 1
),
cands AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
),
overlap AS (
  SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS inter
  FROM cands c
  JOIN sset ta ON ta.doc_id = c.doc_a
  JOIN sset tb ON tb.doc_id = c.doc_b AND tb.tok = ta.tok
  GROUP BY c.doc_a, c.doc_b
)
SELECT o.doc_a, o.doc_b,
       ROUND(o.inter / (sa.sz + sb.sz - o.inter), 6) AS jaccard
FROM overlap o
JOIN sizes2 sa ON sa.doc_id = o.doc_a
JOIN sizes2 sb ON sb.doc_id = o.doc_b
WHERE ROUND(o.inter / (sa.sz + sb.sz - o.inter), 6) >= 0.7
ORDER BY o.doc_a, o.doc_b
"""

QUERIES["dedup_prefix_filter"] = Q(
    dedup_prefix_filter,
    DEDUP_PREFIX_FILTER_SQL,
    "PPJoin-style prefix-filter join at token Jaccard >= 0.7 (exact, no false negatives)",
)


def dedup_similarity_histogram(spark, sf_dir):
    """Threshold-selection artifact for near-dup policy (the dedup
    counterpart of the IVF nprobe curve): exact Jaccard over the LSH
    candidate pairs, bucketed into 0.1-wide bands on the ppm grid —
    where would a 0.5 vs 0.7 vs 0.9 cutoff land? Pair volume stays
    banding-bounded (no all-pairs anywhere); bands are integer DIV so
    the bucketing is cross-engine exact."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(docs, threshold=0.0)
    # ROUND to the ppm grid BEFORE the integer band split: a bare cast
    # truncates in Spark but rounds in DuckDB at band boundaries
    band = F.least(F.lit(9), F.expr("CAST(ROUND(jaccard * 1000000) AS BIGINT) DIV 100000"))
    return (
        pairs.select(band.cast("long").alias("sim_band"))
        .groupBy("sim_band")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


_LSH_ALLPAIRS_SQL = DEDUP_MINHASH_LSH_SQL.replace(">= 0.5", ">= 0.0")

DEDUP_SIMILARITY_HISTOGRAM_SQL = f"""
WITH verified AS ({_LSH_ALLPAIRS_SQL})
SELECT sim_band, CAST(COUNT(*) AS BIGINT) AS n_pairs
FROM (
  SELECT LEAST(9, CAST(ROUND(jaccard * 1000000) AS BIGINT) // 100000) AS sim_band
  FROM verified
)
GROUP BY sim_band
"""

QUERIES["dedup_similarity_histogram"] = Q(
    dedup_similarity_histogram,
    DEDUP_SIMILARITY_HISTOGRAM_SQL,
    "near-dup threshold selection: Jaccard band histogram over LSH candidates",
)


def dedup_quality_keeper(spark, sf_dir):
    """Survivorship policy for dedup — not just WHICH rows collide but
    WHO survives: exact-duplicate groups (content md5) each keep their
    highest-quality member (longest text, then lowest doc_id — a total
    order, so the canonical pick is deterministic and engine-agnostic),
    and the rollup reports kept/dropped per language. One max_by per
    content group + one language rollup; survivorship at 100 TB is the
    same two partial-agg shuffles."""
    docs = load(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "lang",
        F.md5("text").alias("h"),
        F.length("text").alias("quality"),
    )
    kept = keyed.groupBy("h").agg(
        F.expr("max_by(doc_id, struct(quality, -doc_id))").alias("keep_id"),
        F.count("*").alias("group_size"),
    )
    return (
        keyed.join(
            kept.select("h", "keep_id"), "h"
        )
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("doc_id") == F.col("keep_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("doc_id") != F.col("keep_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .orderBy("lang")
    )


DEDUP_QUALITY_KEEPER_SQL = """
WITH keyed AS (
  SELECT doc_id, lang, md5(text) AS h, length(text) AS quality
  FROM documents
),
kept AS (
  SELECT h,
         (ARRAY_AGG(doc_id ORDER BY quality DESC, doc_id ASC))[1] AS keep_id
  FROM keyed GROUP BY h
)
SELECT k.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN k.doc_id = t.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN k.doc_id <> t.keep_id THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped
FROM keyed k JOIN kept t USING (h)
GROUP BY k.lang ORDER BY k.lang
"""

QUERIES["dedup_quality_keeper"] = Q(
    dedup_quality_keeper,
    DEDUP_QUALITY_KEEPER_SQL,
    "survivorship: exact-dup groups keep the best-quality member (deterministic pick)",
)
