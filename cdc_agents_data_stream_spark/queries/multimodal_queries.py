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
