"""Multimodal decode plumbing: the stub and real decoders share one
mapInPandas shape; the real path now runs in ANY environment — PIL where
present, else the pure-stdlib PNG decoder (functions/pngcodec.py)."""

from __future__ import annotations

import hashlib

import pytest

from cdc_agents_data_stream_spark.functions.pngcodec import decode_png, encode_png
from cdc_agents_data_stream_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(8)


def _png_payloads(n=4):
    out = []
    for i in range(n):
        w, h = 4 + i, 6 + i
        px = bytes((x * 3 + 7 * i) % 256 for x in range(w * h))
        out.append((i, encode_png(w, h, px)))
    return out


@pytest.mark.parametrize("decoder", ["stub", "real"])
def test_decode_paths_share_schema(spark, docs, decoder):
    if decoder == "stub":
        out = M.decode_stub_meta(docs)
    else:
        pdf = spark.createDataFrame(_png_payloads(), "doc_id long, payload binary")
        out = M.decode_real_meta(pdf)
    rows = out.collect()
    assert [f.name for f in out.schema.fields] == ["doc_id", "width", "height", "n_frames", "fmt"]
    assert rows
    for r in rows:
        assert r["width"] >= 1 and r["height"] >= 1 and r["n_frames"] >= 1
    if decoder == "real":
        by_id = {r["doc_id"]: r for r in rows}
        for i in range(4):
            assert (by_id[i]["width"], by_id[i]["height"], by_id[i]["fmt"]) == (4 + i, 6 + i, "png")


def test_stub_decode_is_md5_deterministic(spark, docs):
    first = docs.orderBy("doc_id").first()
    out = {r["doc_id"]: r for r in M.decode_stub_meta(docs).collect()}
    digest = hashlib.md5(first["text"].encode()).hexdigest()
    w, h, n = M._fake_dims(digest)
    got = out[first["doc_id"]]
    assert (got["width"], got["height"], got["n_frames"], got["fmt"]) == (w, h, n, "stub")


def test_decode_image_real_parses_actual_bytes():
    """No library shortcut: corrupting one IDAT byte must fail CRC, and
    the recovered geometry must come from IHDR, not payload heuristics."""
    _i, data = _png_payloads(1)[0]
    meta = M.decode_image_real(data)
    assert (meta["width"], meta["height"], meta["fmt"], meta["n_frames"]) == (4, 6, "png", 1)
    if not M.HAS_PIL:
        corrupted = bytearray(data)
        corrupted[-20] ^= 0xFF  # inside IDAT payload/CRC region
        with pytest.raises(ValueError):
            decode_png(bytes(corrupted))


def test_decode_image_real_rejects_non_png_without_pil():
    if M.HAS_PIL:
        pytest.skip("PIL present: the no-library contract is not exercised here")
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"GIF89a" + b"\x00" * 16)


def test_png_unfilter_all_filter_types():
    """The encoder cycles filters 0..4 by row; a 10-row image therefore
    exercises every unfilter branch twice, and the pixel sum must match."""
    w, h = 9, 10
    px = bytes((5 * x + 11) % 256 for x in range(w * h))
    meta = decode_png(encode_png(w, h, px))
    assert meta["pixel_sum"] == sum(px)
    assert (meta["width"], meta["height"]) == (w, h)
