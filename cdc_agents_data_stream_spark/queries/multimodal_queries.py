"""Declared multimodal queries: binary-column metadata (pure expressions)
and the Arrow-batched stub-decode stage — BOTH oracle-checked, the latter
because the stub decoder's fake dimensions are md5-derived arithmetic that
DuckDB reproduces."""

from __future__ import annotations

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
