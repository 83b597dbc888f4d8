"""Multimodal decode plumbing: the stub and real decoders share one
mapInPandas shape; the real path activates only where PIL exists."""

from __future__ import annotations

import hashlib

import pytest

from cdc_agents_data_stream_spark.operators import multimodal as M

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(8)


@pytest.mark.parametrize("decoder", ["stub", "real"])
def test_decode_paths_share_schema(spark, docs, decoder):
    if decoder == "stub":
        out = M.decode_stub_meta(docs)
    else:
        if not M.HAS_PIL:
            pytest.skip("PIL not available in this environment; real decode inert by design")
        import io

        from PIL import Image

        payloads = []
        for i in range(4):
            buf = io.BytesIO()
            Image.new("RGB", (4 + i, 6 + i)).save(buf, format="PNG")
            payloads.append((i, buf.getvalue()))
        pdf = spark.createDataFrame(payloads, "doc_id long, payload binary")
        out = M.decode_real_meta(pdf)
    rows = out.collect()
    assert [f.name for f in out.schema.fields] == ["doc_id", "width", "height", "n_frames", "fmt"]
    assert rows
    for r in rows:
        assert r["width"] >= 1 and r["height"] >= 1 and r["n_frames"] >= 1
    if decoder == "real":
        by_id = {r["doc_id"]: r for r in rows}
        assert (by_id[0]["width"], by_id[0]["height"], by_id[0]["fmt"]) == (4, 6, "png")


def test_stub_decode_is_md5_deterministic(spark, docs):
    first = docs.orderBy("doc_id").first()
    out = {r["doc_id"]: r for r in M.decode_stub_meta(docs).collect()}
    digest = hashlib.md5(first["text"].encode()).hexdigest()
    w, h, n = M._fake_dims(digest)
    got = out[first["doc_id"]]
    assert (got["width"], got["height"], got["n_frames"], got["fmt"]) == (w, h, n, "stub")


def test_decode_image_real_raises_cleanly_without_pil():
    if M.HAS_PIL:
        pytest.skip("PIL present: the no-library contract is not exercised here")
    with pytest.raises(NotImplementedError):
        M.decode_image_real(b"\x89PNG\r\n\x1a\n")
