"""Multimodal-column plumbing: opaque ``binary`` payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages. The decode itself is STUBBED in this
container (no image/audio libraries) — ``decode_stub_meta`` produces a
deterministic fake derived from the payload's md5 so the Spark-side
plumbing (schema, batching, partitioning) is real and testable, and
``decode_image_real`` raises ``NotImplementedError`` behind an import-try
to mark exactly where a real decoder plugs in.

At scale: binary payloads dominate bytes — keep them OUT of shuffles
(derive metadata first, shuffle only metadata + keys, rejoin payloads by
key if needed) and size ``spark.sql.files.maxPartitionBytes`` so one Arrow
batch of payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = "doc_id long, width int, height int, n_frames int, fmt string"
CHUNK_BYTES = 256


def to_binary_docs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Re-type documents as multimodal rows: payload bytes + metadata."""
    return df.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("text/plain").alias("mime"),
        ).alias("meta"),
    )


def binary_meta(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Byte-level metadata over the payload, all JVM-side expressions."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col),
        F.octet_length(F.col(text_col)).cast("long").alias("n_bytes"),
        F.md5(payload).alias("payload_md5"),
        F.ceil(F.octet_length(F.col(text_col)) / CHUNK_BYTES).cast("long").alias("n_chunks"),
    )


def _fake_dims(digest_hex: str) -> tuple[int, int, int]:
    """Deterministic fake decode: dimensions from the md5 digest (also
    expressible in SQL for the oracle)."""
    width = 1 + int(digest_hex[0:2], 16) % 64
    height = 1 + int(digest_hex[2:4], 16) % 64
    n_frames = 1 + int(digest_hex[4:6], 16) % 16
    return width, height, n_frames


def decode_stub_meta(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", repartition_to: int | None = None
) -> DataFrame:
    """Arrow-batched decode stage (mapInPandas) with the stub decoder.

    mapInPandas inherits the input partitioning; when a heavyweight real
    decoder (PIL/ffmpeg) sits behind a narrow scan, pass ``repartition_to``
    (e.g. ``sc.defaultParallelism``) to spread the decode across cores. The
    default leaves partitioning alone: at scale the scan already has
    thousands of partitions, and for the cheap stub decoder an extra
    shuffle costs more than it saves (measured at sf0.1)."""
    src = df
    if repartition_to:
        src = src.repartition(repartition_to)
    src = src.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            digests = [hashlib.md5(bytes(p)).hexdigest() for p in pdf["payload"]]
            dims = [_fake_dims(d) for d in digests]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                    "fmt": ["stub" for _ in dims],
                }
            )

    return src.mapInPandas(decode, schema=DECODED_SCHEMA)


def decode_image_real(payload: bytes):  # pragma: no cover - stub
    """Real decoder hook. The container has no image libraries; a real
    deployment swaps this for PIL/ffmpeg and keeps the mapInPandas shape."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode is stubbed in this environment (no PIL); "
            "use decode_stub_meta for plumbing tests"
        ) from exc
    raise NotImplementedError("real decode path not wired in this build")


FEATURE_DIM = 8
FEATURE_SCHEMA = f"doc_id long, feature array<double>"


def feature_extract_stub(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched feature extraction (mapInPandas): payload ->
    fixed-dim embedding. The stub derives ``FEATURE_DIM`` floats in [0,1)
    from consecutive md5 bytes (deterministic, SQL-reproducible); a real
    deployment swaps the body for an image/audio encoder and keeps the
    exact schema and batch shape."""
    src = df.select(F.col(id_col), F.encode(F.col(text_col), "UTF-8").alias("payload"))

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                d = hashlib.md5(bytes(p)).hexdigest()
                feats.append([int(d[2 * j : 2 * j + 2], 16) / 256.0 for j in range(FEATURE_DIM)])
            yield pd.DataFrame({"doc_id": pdf[id_col].astype("int64"), "feature": feats})

    return src.mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_stub(
    df: DataFrame, every: int = 4, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling plumbing: decode metadata -> one row per sampled
    frame index (0, every, 2*every, ... < n_frames). The explode happens
    AFTER decode so only (doc_id, n_frames) fans out, never the payload
    bytes; a real sampler would rejoin the payload by doc_id for just the
    sampled frames."""
    meta = decode_stub_meta(df, text_col, id_col)
    return meta.select(
        "doc_id",
        "n_frames",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every)).cast("array<int>")
        ).alias("frame_idx"),
    )


def resize_stub(
    df: DataFrame, max_dim: int = 32, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Resize plumbing: decoded dims -> aspect-preserving bounded dims.
    The arithmetic is integer-only JVM expressions layered on the decode
    stage (a real resizer would also rewrite the payload inside the same
    mapInPandas pass; the dimension math is what downstream schemas see).
    No upscaling: frames already within ``max_dim`` keep their size."""
    meta = decode_stub_meta(df, text_col, id_col)
    m = F.greatest(F.col("width"), F.col("height"))
    scale_w = F.greatest(F.lit(1), F.expr(f"(width * {max_dim}) DIV greatest(width, height)"))
    scale_h = F.greatest(F.lit(1), F.expr(f"(height * {max_dim}) DIV greatest(width, height)"))
    return meta.select(
        "doc_id",
        "width",
        "height",
        F.when(m <= max_dim, F.col("width")).otherwise(scale_w).cast("int").alias("out_width"),
        F.when(m <= max_dim, F.col("height")).otherwise(scale_h).cast("int").alias("out_height"),
    )
