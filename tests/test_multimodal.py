"""Multimodal plumbing: binary payload transfer, mapInPandas decode path,
frame sampling, span-sequence preservation for media spans."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark.operators import multimodal
from phenoscape_owl_tools_spark.operators.mention import explode_text_spans
from phenoscape_owl_tools_spark.sources import tpch_kg as KG
from phenoscape_owl_tools_spark.sources.documents import media_spans

from tests.conftest import SF001


@pytest.fixture(scope="module")
def spans(spark):
    flat = KG.load(spark, SF001, "documents")
    return KG.span_documents(flat)


def test_media_spans_preserve_order(spark, spans):
    m = media_spans(spans)
    rows = m.collect()
    assert len(rows) > 0
    # media span is always the leading span (offset 0, span_idx 0) by the
    # adapter's construction — the order comes from posexplode, not a sort
    for r in rows:
        assert r["span_idx"] == 0 and r["offset"] == 0
        assert r["kind"] == "media" and r["text"] is None


def test_attach_media_bytes_binary_roundtrip(spark, spans):
    m = media_spans(spans).limit(5)
    got = multimodal.attach_media_bytes(m).collect()
    for r in got:
        assert isinstance(r["media_bytes"], bytes)
        assert r["media_bytes"] == multimodal.fake_media_bytes(r["media_ref"])
        assert len(r["media_bytes"]) == 128


def test_extract_media_features_deterministic(spark, spans):
    feats = multimodal.extract_media_features(media_spans(spans)).collect()
    assert len(feats) > 0
    for r in feats:
        h = hashlib.sha256(r["media_ref"].encode()).hexdigest()
        assert r["feature_sig"] == h[:16]
        assert r["width"] == 32 * (multimodal.HEX.index(h[0]) + 1)
        assert r["height"] == 32 * (multimodal.HEX.index(h[1]) + 1)
        assert 1 <= r["n_frames"] <= 16


def test_compressed_decode_is_explicitly_stubbed():
    # JPEG magic: compressed formats are the one remaining stub
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\xff\xd8\xff\xe0rest")


def test_frame_sampling_stride(spark, spans):
    feats = multimodal.extract_media_features(media_spans(spans))
    samples = multimodal.frame_sample_refs(feats, stride=2)
    per_doc = (
        samples.groupBy("doc_id")
        .agg(F.collect_list("frame_idx").alias("idx"), F.count("*").alias("n"))
        .join(feats.select("doc_id", "n_frames"), "doc_id")
        .collect()
    )
    for r in per_doc:
        assert sorted(r["idx"]) == list(range(0, r["n_frames"], 2))


def test_text_spans_unaffected_by_media(spark, spans):
    flat = KG.load(spark, SF001, "documents")
    texts = {r["doc_id"]: r["text"] for r in flat.select(F.col("doc_id").cast("string").alias("doc_id"), "text").collect()}
    tspans = explode_text_spans(spans).where(F.col("kind") == "text").collect()
    assert len(tspans) == len(texts)
    for r in tspans:
        assert r["text"] == texts[r["doc_id"]]


def _make_bmp(width, height, seed=7):
    """Valid uncompressed 24-bit BMP, deterministic pixels."""
    import struct

    stride = ((width * 3) + 3) & ~3
    pix = bytearray()
    v = seed
    for _ in range(height):
        row = bytearray()
        for _ in range(width):
            v = (v * 1103515245 + 12345) & 0x7FFFFFFF
            row += bytes(((v >> 16) & 0xFF, (v >> 8) & 0xFF, v & 0xFF))
        row += b"\x00" * (stride - len(row))
        pix += row
    header_size = 14 + 40
    file_size = header_size + len(pix)
    return (
        b"BM" + struct.pack("<IHHI", file_size, 0, 0, header_size)
        + struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                      len(pix), 2835, 2835, 0, 0)
        + bytes(pix)
    )


def _make_wav(n_frames, channels=2, rate=8000, seed=3):
    import struct

    v, samples = seed, bytearray()
    for _ in range(n_frames * channels):
        v = (v * 1103515245 + 12345) & 0x7FFFFFFF
        samples += struct.pack("<h", (v & 0xFFFF) - 32768)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(samples)) + bytes(samples))
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_real_bmp_wav_decode():
    w, h, nf, sig = multimodal.decode_media(_make_bmp(17, 9))
    assert (w, h, nf) == (17, 9, 1)
    assert len(sig) == 16
    # same pixels -> same sig; different seed -> different sig
    assert multimodal.decode_media(_make_bmp(17, 9))[3] == sig
    assert multimodal.decode_media(_make_bmp(17, 9, seed=8))[3] != sig

    ch, bits, frames, wsig = multimodal.decode_media(_make_wav(250))
    assert (ch, bits, frames) == (2, 16, 250)
    assert len(wsig) == 16

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        multimodal.decode_media(b"\x89PNG\r\n\x1a\n....")


def test_real_decode_through_spark(spark):
    """End-to-end: binary payload column -> mapInPandas decode -> features."""
    rows = [
        ("d1", "m1.bmp", bytearray(_make_bmp(8, 4))),
        ("d2", "m2.wav", bytearray(_make_wav(100, channels=1))),
    ]
    df = spark.createDataFrame(
        rows, "doc_id string, media_ref string, media_bytes binary"
    )
    got = {r["media_ref"]: r for r in
           multimodal.extract_media_features(df, deterministic=False).collect()}
    assert got["m1.bmp"]["width"] == 8 and got["m1.bmp"]["height"] == 4
    assert got["m1.bmp"]["n_frames"] == 1
    assert got["m2.wav"]["n_frames"] == 100 and got["m2.wav"]["width"] == 1
    # decode is deterministic through the Arrow path too
    again = {r["media_ref"]: r["feature_sig"] for r in
             multimodal.extract_media_features(df.repartition(3),
                                               deterministic=False).collect()}
    assert again == {k: v["feature_sig"] for k, v in got.items()}
