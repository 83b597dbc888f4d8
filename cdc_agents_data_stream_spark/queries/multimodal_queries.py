"""Declared multimodal queries: binary-column metadata (pure expressions)
and the Arrow-batched stub-decode stage — BOTH oracle-checked, the latter
because the stub decoder's fake dimensions are md5-derived arithmetic that
DuckDB reproduces."""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import multimodal as M
from .base import Q, load


def multimodal_binary_meta(spark, sf_dir):
    return M.binary_meta(load(spark, sf_dir, "documents"))


MULTIMODAL_BINARY_META_SQL = f"""
SELECT doc_id,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS payload_md5,
       CAST(ceil(octet_length(encode(text)) / {M.CHUNK_BYTES}.0) AS BIGINT) AS n_chunks
FROM documents
"""


def multimodal_decode_stub(spark, sf_dir):
    return M.decode_stub_meta(load(spark, sf_dir, "documents"))


MULTIMODAL_DECODE_STUB_SQL = """
SELECT doc_id,
       CAST(1 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 64 AS INT) AS width,
       CAST(1 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 64 AS INT) AS height,
       CAST(1 + CAST('0x' || substr(md5(text), 5, 2) AS INT) % 16 AS INT) AS n_frames,
       'stub' AS fmt
FROM documents
"""


QUERIES = {
    "multimodal_binary_meta": Q(multimodal_binary_meta, MULTIMODAL_BINARY_META_SQL, "binary payload metadata"),
    "multimodal_decode_stub": Q(multimodal_decode_stub, MULTIMODAL_DECODE_STUB_SQL, "mapInPandas stub decode"),
}


def multimodal_feature_extract(spark, sf_dir):
    """Feature vectors are arrays; for a stable cross-engine hash the query
    emits each dimension as its own rounded column."""
    from pyspark.sql import functions as F

    feats = M.feature_extract_stub(load(spark, sf_dir, "documents"))
    return feats.select(
        "doc_id",
        *[F.round(F.element_at("feature", j + 1), 6).alias(f"f{j}") for j in range(M.FEATURE_DIM)],
    )


MULTIMODAL_FEATURE_EXTRACT_SQL = f"""
SELECT doc_id,
       {", ".join(f"ROUND(CAST('0x' || substr(md5(text), {2*j+1}, 2) AS INT) / 256.0, 6) AS f{j}" for j in range(M.FEATURE_DIM))}
FROM documents
"""


def multimodal_frame_sample(spark, sf_dir):
    return M.frame_sample_stub(load(spark, sf_dir, "documents"), every=4)


MULTIMODAL_FRAME_SAMPLE_SQL = """
WITH meta AS (
  SELECT doc_id, CAST(1 + CAST('0x' || substr(md5(text), 5, 2) AS INT) % 16 AS INT) AS n_frames
  FROM documents
)
SELECT doc_id, n_frames, CAST(UNNEST(range(0, n_frames, 4)) AS INT) AS frame_idx
FROM meta
"""

QUERIES["multimodal_feature_extract"] = Q(
    multimodal_feature_extract, MULTIMODAL_FEATURE_EXTRACT_SQL, "feature extraction stub"
)
QUERIES["multimodal_frame_sample"] = Q(
    multimodal_frame_sample, MULTIMODAL_FRAME_SAMPLE_SQL, "frame sampling"
)


def multimodal_resize(spark, sf_dir):
    return M.resize_stub(load(spark, sf_dir, "documents"), max_dim=32)


MULTIMODAL_RESIZE_SQL = """
WITH meta AS (
  SELECT doc_id,
         CAST(1 + CAST('0x' || substr(md5(text), 1, 2) AS INT) % 64 AS INT) AS width,
         CAST(1 + CAST('0x' || substr(md5(text), 3, 2) AS INT) % 64 AS INT) AS height
  FROM documents
)
SELECT doc_id, width, height,
       CAST(CASE WHEN greatest(width, height) <= 32 THEN width
                 ELSE greatest(1, (width * 32) // greatest(width, height)) END AS INT) AS out_width,
       CAST(CASE WHEN greatest(width, height) <= 32 THEN height
                 ELSE greatest(1, (height * 32) // greatest(width, height)) END AS INT) AS out_height
FROM meta
"""

QUERIES["multimodal_resize"] = Q(multimodal_resize, MULTIMODAL_RESIZE_SQL, "resize dims stage")


def audio_frame_windows(spark, sf_dir):
    """Audio framing arithmetic over opaque clips: synthesize each
    clip's sample count deterministically from its payload hash (the
    stand-in for a WAV header read — the real decoder is the documented
    plug-point), then compute STFT-style window counts: n_windows = 1 +
    (n_samples − WIN) DIV HOP for clips long enough, else 0. This is
    the Spark-side plumbing an audio featurizer needs — schema, exact
    framing math, per-clip fan-out size — kept codegen-side; only the
    sample decode itself would run in mapInPandas."""
    WIN, HOP, SR = 400, 160, 16_000
    docs = load(spark, sf_dir, "documents")
    n_samples = (
        F.conv(F.substring(F.md5("text"), 1, 6), 16, 10).cast("long") % (SR * 30) + SR
    )
    base = docs.select("doc_id", n_samples.alias("n_samples"))
    n_windows = F.when(
        F.col("n_samples") >= WIN,
        1 + F.expr(f"(n_samples - {WIN}) DIV {HOP}"),
    ).otherwise(0)
    return base.select(
        "doc_id",
        "n_samples",
        # integer DIV on both engines: double-division casts disagree
        # (Spark truncates, DuckDB rounds) at millisecond boundaries
        F.expr(f"(n_samples * 1000) DIV {SR}").cast("long").alias("dur_ms"),
        n_windows.cast("long").alias("n_windows"),
    )


AUDIO_FRAME_WINDOWS_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(text), 1, 6) AS BIGINT) % 480000 + 16000 AS n_samples
  FROM documents
)
SELECT doc_id, n_samples,
       CAST((n_samples * 1000) // 16000 AS BIGINT) AS dur_ms,
       CAST(CASE WHEN n_samples >= 400 THEN 1 + (n_samples - 400) // 160 ELSE 0 END AS BIGINT) AS n_windows
FROM m
"""

QUERIES["audio_frame_windows"] = Q(
    audio_frame_windows,
    AUDIO_FRAME_WINDOWS_SQL,
    "audio STFT framing arithmetic from header metadata (decode stays the plug-point)",
)


def image_tile_grid(spark, sf_dir):
    """Image tiling fan-out (ViT-style patching): tiles = ceil(w/T) ×
    ceil(h/T) from the decoded dimensions (the stub decoder's
    deterministic dims), plus the padded canvas size — the exact
    integer accounting a patch-embedding pipeline shuffles by. The
    fan-out ROW COUNT is computed, not materialized: at 100 TB you
    explode per-tile only inside the Arrow batch that featurizes it."""
    TILE = 16
    docs = load(spark, sf_dir, "documents")
    width = (F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("int") % 64 + 1)
    height = (F.conv(F.substring(F.md5("text"), 3, 2), 16, 10).cast("int") % 64 + 1)
    tx = F.ceil(width / F.lit(TILE)).cast("long")
    ty = F.ceil(height / F.lit(TILE)).cast("long")
    return docs.select(
        "doc_id",
        width.cast("long").alias("width"),
        height.cast("long").alias("height"),
        (tx * ty).alias("n_tiles"),
        (tx * TILE).alias("padded_w"),
        (ty * TILE).alias("padded_h"),
    )


IMAGE_TILE_GRID_SQL = """
WITH m AS (
  SELECT doc_id,
         CAST('0x' || substr(md5(text), 1, 2) AS INT) % 64 + 1 AS width,
         CAST('0x' || substr(md5(text), 3, 2) AS INT) % 64 + 1 AS height
  FROM documents
)
SELECT doc_id, CAST(width AS BIGINT) AS width, CAST(height AS BIGINT) AS height,
       CAST(CEIL(width / 16.0) * CEIL(height / 16.0) AS BIGINT) AS n_tiles,
       CAST(CEIL(width / 16.0) * 16 AS BIGINT) AS padded_w,
       CAST(CEIL(height / 16.0) * 16 AS BIGINT) AS padded_h
FROM m
"""

QUERIES["image_tile_grid"] = Q(
    image_tile_grid,
    IMAGE_TILE_GRID_SQL,
    "ViT-style tile/padding accounting from stub-decoded dims",
)


def multimodal_shard_manifest(spark, sf_dir):
    """WebDataset-style shard planning — the step that turns a payload
    lake into fixed-size training shards: payload byte sizes
    (octet_length of the binary column) pack contiguously into ~256 KB
    shards within deterministic hash lanes (the `pack_sequences`
    prefix-sum kernel applied to BYTES instead of tokens), and the
    manifest reports per-shard member count and byte fill. The manifest
    is what the tar-writer then consumes; planning cost is one shuffle
    of (id, size) pairs — payloads themselves never move until the
    write."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("lane"),
        F.octet_length(F.encode("text", "UTF-8")).cast("bigint").alias("nbytes"),
    )
    w = Window.partitionBy("lane").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    packed = sized.withColumn(
        "cum_bytes", F.sum("nbytes").over(w)
    ).withColumn("shard", F.expr("COALESCE(cum_bytes, 0) DIV 262144"))
    return (
        packed.groupBy("lane", "shard")
        .agg(
            F.count("*").cast("bigint").alias("n_members"),
            F.sum("nbytes").cast("bigint").alias("shard_bytes"),
        )
        .orderBy("lane", "shard")
    )


MULTIMODAL_SHARD_MANIFEST_SQL = """
WITH sized AS (
  SELECT doc_id, doc_id % 8 AS lane,
         CAST(octet_length(encode(text)) AS BIGINT) AS nbytes
  FROM documents
),
packed AS (
  SELECT lane, nbytes,
         CAST(COALESCE(SUM(nbytes) OVER (
             PARTITION BY lane ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 262144
           AS BIGINT) AS shard
  FROM sized
)
SELECT lane, shard, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(nbytes) AS BIGINT) AS shard_bytes
FROM packed GROUP BY lane, shard ORDER BY lane, shard
"""

QUERIES["multimodal_shard_manifest"] = Q(
    multimodal_shard_manifest,
    MULTIMODAL_SHARD_MANIFEST_SQL,
    "WebDataset shard planning: byte-budget prefix-sum packing manifest",
)


def multimodal_decode_real(spark, sf_dir):
    """REAL image decode gate — no stub anywhere in the measured path:
    each document becomes a deterministic synthetic PNG (geometry and
    pixels are closed-form in ``doc_id``: ``w = 1 + doc_id % 13``,
    ``h = 1 + doc_id % 11``, ``pixel(x,y) = (3x + 7y + doc_id) % 256``,
    encoded with scanline filters cycling 0..4), and a second Arrow
    stage decodes the actual bytes back — chunk CRC verification, zlib
    inflate, unfilter of all five PNG filter types
    (``functions/pngcodec.py``; PIL takes over transparently where the
    environment has it, same metadata contract). The oracle recomputes
    the geometry AND the full pixel sum in SQL, so a decoder that
    shortcuts the byte stream (or mis-reverses one filter) hash-fails.

    Scale shape: encode and decode are both map-only Arrow stages over
    the document scan — zero shuffles; payload bytes never move between
    stages (re-encoded per batch here only because the gate fabricates
    its own inputs)."""
    import pandas as pd

    from ..functions.pngcodec import decode_png, encode_png
    from ..operators.multimodal import decode_image_real

    docs = load(spark, sf_dir, "documents").select("doc_id")

    def encode_decode(batches):
        for pdf in batches:
            rows = []
            for doc_id in pdf["doc_id"].astype("int64"):
                d = int(doc_id)
                w, h = 1 + d % 13, 1 + d % 11
                px = bytes(
                    (3 * x + 7 * y + d) % 256 for y in range(h) for x in range(w)
                )
                data = encode_png(w, h, px)
                meta = decode_image_real(data)  # PIL or pure-stdlib path
                # pixel_sum always via the stdlib decoder: the unfilter proof
                psum = decode_png(data)["pixel_sum"]
                rows.append(
                    {
                        "doc_id": d,
                        "width": meta["width"],
                        "height": meta["height"],
                        "n_frames": meta["n_frames"],
                        "fmt": meta["fmt"],
                        "pixel_sum": psum,
                    }
                )
            yield pd.DataFrame(rows)

    return docs.mapInPandas(
        encode_decode,
        schema="doc_id long, width int, height int, n_frames int, fmt string, pixel_sum long",
    )


MULTIMODAL_DECODE_REAL_SQL = """
SELECT d.doc_id,
       CAST(1 + d.doc_id % 13 AS INT) AS width,
       CAST(1 + d.doc_id % 11 AS INT) AS height,
       CAST(1 AS INT) AS n_frames,
       'png' AS fmt,
       (SELECT SUM((3 * x.i + 7 * y.i + d.doc_id) % 256)
        FROM (SELECT unnest(range(1 + d.doc_id % 13)) AS i) x,
             (SELECT unnest(range(1 + d.doc_id % 11)) AS i) y
       )::BIGINT AS pixel_sum
FROM documents d
"""


QUERIES["multimodal_decode_real"] = Q(
    multimodal_decode_real,
    MULTIMODAL_DECODE_REAL_SQL,
    "REAL PNG decode (inflate + unfilter) vs closed-form oracle",
)
