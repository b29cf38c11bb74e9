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
        multimodal.decode_media(b"\xff\xd8\xff\xe0jpeg-soi")


def _make_png(width, height, color_type=2, bit_depth=8, seed=5, interlace=0,
              filter_cycle=(0, 1, 2, 3, 4)):
    """From-scratch PNG encoder (forward filtering — the decoder inverts
    it, so the two directions are independent implementations). Returns
    (png_bytes, raw_unfiltered_scanline_bytes)."""
    import struct
    import zlib

    samples = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    stride = (width * samples * bit_depth + 7) // 8
    bpp = max(1, (samples * bit_depth) // 8)
    v, raw = seed, []
    for _ in range(height):
        row = bytearray()
        for _ in range(stride):
            v = (v * 1103515245 + 12345) & 0x7FFFFFFF
            row.append((v >> 13) & 0xFF)
        raw.append(bytes(row))
    out, prev = bytearray(), bytes(stride)
    for y, row in enumerate(raw):
        f = filter_cycle[y % len(filter_cycle)]
        out.append(f)
        for x in range(stride):
            a = row[x - bpp] if x >= bpp else 0
            b = prev[x]
            c = prev[x - bpp] if x >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((row[x] - pred) & 0xFF)
        prev = row

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body)))

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type,
                       0, 0, interlace)
    parts = [b"\x89PNG\r\n\x1a\n", chunk(b"IHDR", ihdr)]
    if color_type == 3:
        plte = bytes(x for i in range(256) for x in (i, i, i))
        parts.append(chunk(b"PLTE", plte))
    parts.append(chunk(b"IDAT", zlib.compress(bytes(out))))
    parts.append(chunk(b"IEND", b""))
    return b"".join(parts), b"".join(raw)


def test_png_decode_golden_pixels_all_filters():
    """decode_png must recover the exact unfiltered scanline bytes the
    encoder filtered away — the filter cycle covers all five RFC 2083
    filters, and the sig is sha256 over the known raw array (golden)."""
    import hashlib

    for kw in (
        dict(color_type=2),                 # RGB8
        dict(color_type=0),                 # gray8
        dict(color_type=6),                 # RGBA8
        dict(color_type=4),                 # gray+alpha
        dict(color_type=3),                 # palette indices
        dict(color_type=0, bit_depth=16),   # gray16 (bpp=2)
        dict(color_type=2, bit_depth=16),   # RGB16 (bpp=6)
        dict(color_type=0, bit_depth=1),    # sub-byte depth (bpp=1 floor)
        dict(color_type=0, bit_depth=4),
    ):
        png, raw = _make_png(13, 9, seed=11, **kw)
        w, h, nf, sig = multimodal.decode_media(png)
        assert (w, h, nf) == (13, 9, 1), kw
        assert sig == hashlib.sha256(raw).hexdigest()[:16], kw


def test_png_decode_rejects_interlace_and_garbage():
    import pytest as _pytest

    png, _ = _make_png(6, 6, interlace=1)
    with _pytest.raises(NotImplementedError):
        multimodal.decode_media(png)
    with _pytest.raises(ValueError):
        multimodal.decode_png(b"\x89PNG\r\n\x1a\nnochunks")
    # truncated pixel data must not silently decode
    import struct
    import zlib as _z
    png, _ = _make_png(6, 6)
    # corrupt: drop last IDAT byte pre-compression by re-encoding short
    bad_idat = _z.compress(b"\x00" * 5)  # wrong length for 6x6 RGB
    ihdr = struct.pack(">IIBBBBB", 6, 6, 8, 2, 0, 0, 0)

    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", _z.crc32(ctype + body)))

    bad = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", bad_idat) + chunk(b"IEND", b""))
    with _pytest.raises(ValueError):
        multimodal.decode_png(bad)


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
