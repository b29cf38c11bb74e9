"""Multimodal (media-span) handling: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The reference ingests image-depiction records (image URL + depicted
structure, PhenoteImageDepictionsToOWL.scala:31-61); our interleaved input
carries those as media spans (kind='media', media_ref). This module makes
the Spark-side plumbing real — schema, partitioning, UDF signature, Arrow
batch shape — and the decode itself is REAL for formats the Python stdlib
can carry: BMP 24/32-bit images and RIFF/WAVE PCM audio (pure
struct + numpy) plus PNG (DEFLATE via stdlib ``zlib`` + RFC 2083 scanline
unfiltering — all color types, depths 1-16, all five filters). Formats
whose codecs the environment genuinely lacks (JPEG/FLAC/MP4) remain the
one documented stub. A deterministic fake decode also remains for
SQL-oracle-checkable end-to-end runs over refs without payloads.

Scale notes (100 TB): media bytes are the dominant payload; they never
shuffle — fetch/decode/feature-extract is map-only over Arrow batches, and
only the (small) feature rows continue downstream. Batch size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` so executor memory holds
O(batch x media_size), not O(partition).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

HEX = "0123456789abcdef"

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature_sig", T.StringType()),
    ]
)


def fake_media_bytes(media_ref: str) -> bytes:
    """Deterministic stand-in payload for a media object (tests only)."""
    return hashlib.sha256(media_ref.encode("utf-8")).digest() * 4


def attach_media_bytes(media_spans: DataFrame) -> DataFrame:
    """Add an opaque ``binary`` payload column to media spans.

    In production this is the Iceberg-stored blob (or a fetch inside the
    decode UDF); here the payload is the deterministic fake so binary-column
    plumbing (Arrow binary transfer, batch sizing) is exercised for real.
    """
    schema = T.StructType(
        media_spans.schema.fields + [T.StructField("media_bytes", T.BinaryType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["media_bytes"] = [
                fake_media_bytes(r) if r is not None else None
                for r in pdf["media_ref"]
            ]
            yield pdf

    return media_spans.mapInPandas(run, schema)


def decode_bmp(data: bytes) -> tuple[int, int, int, str]:
    """Decode an uncompressed BMP (BI_RGB, 24/32 bpp): pure struct+numpy.

    Returns (width, height, n_frames=1, feature_sig) where feature_sig is
    sha256 over the row-major pixel array — byte-stable across machines.
    """
    import struct

    import numpy as np

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if compression != 0 or bpp not in (24, 32):
        raise NotImplementedError(
            f"compressed/paletted BMP (compression={compression}, bpp={bpp}) "
            "needs a codec library"
        )
    bytes_pp = bpp // 8
    stride = ((width * bytes_pp) + 3) & ~3  # rows pad to 4 bytes
    rows = abs(height)
    px = np.frombuffer(data, dtype=np.uint8, count=stride * rows, offset=pix_off)
    px = px.reshape(rows, stride)[:, : width * bytes_pp]
    if height > 0:
        px = px[::-1]  # bottom-up storage -> top-down array
    sig = hashlib.sha256(np.ascontiguousarray(px).tobytes()).hexdigest()[:16]
    return width, rows, 1, sig


def decode_wav(data: bytes) -> tuple[int, int, int, str]:
    """Decode RIFF/WAVE PCM: returns (n_channels, bits_per_sample,
    n_sample_frames, feature_sig). feature_sig = sha256 of the sample data.
    """
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    pos, channels, bits, payload = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            (fmt, channels) = struct.unpack_from("<HH", body, 0)
            (bits,) = struct.unpack_from("<H", body, 14)
            if fmt != 1:  # 1 = PCM
                raise NotImplementedError(
                    f"non-PCM WAVE (format={fmt}) needs a codec library")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or payload is None:
        raise ValueError("WAVE missing fmt/data chunk")
    n_frames = len(payload) // (channels * (bits // 8))
    sig = hashlib.sha256(payload).hexdigest()[:16]
    return channels, bits, n_frames, sig


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# bytes per pixel-group numerator: samples per pixel by PNG color type
_PNG_SAMPLES = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def decode_png(data: bytes) -> tuple[int, int, int, str]:
    """Decode a non-interlaced PNG with stdlib ``zlib`` only — no codec
    library needed (the r4 'no codec libraries in env' boundary was softer
    than documented: DEFLATE ships with CPython).

    Supports all five PNG color types at bit depths 1/2/4/8/16 and all
    five scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6).
    Returns (width, height, n_frames=1, feature_sig) where feature_sig is
    sha256 over the UNFILTERED raw scanline bytes — the stored pixel
    array exactly as the encoder saw it (palette images hash index bytes;
    consistent with decode_bmp's pixel-array hash, stable across
    machines). Adam7-interlaced files raise NotImplementedError (rare in
    machine-generated corpora; deinterlacing is a layout permutation, not
    a codec problem).
    """
    import struct
    import zlib

    import numpy as np

    if data[:8] != PNG_MAGIC:
        raise ValueError("not a PNG payload")
    pos = 8
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (size,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + size]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack_from(">IIBBBBB", body, 0)
            )
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        pos += 12 + size  # length + type + body + CRC
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace != 0:
        raise NotImplementedError("Adam7-interlaced PNG not supported")
    if color_type not in _PNG_SAMPLES:
        raise ValueError(f"invalid PNG color type {color_type}")
    samples = _PNG_SAMPLES[color_type]
    # filters operate on BYTES, offset by bpp = whole bytes per pixel
    # (minimum 1 for sub-byte depths, RFC 2083 §6.2)
    bpp = max(1, (samples * bit_depth) // 8)
    stride = (width * samples * bit_depth + 7) // 8
    raw = zlib.decompress(bytes(idat))
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG pixel data length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(height):
        ftype = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int64)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up — vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub/Average/Paeth: sequential in x
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0  # left
                b = prev[x]  # up
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = prev[x - bpp] if x >= bpp else 0  # up-left
                    pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                    pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    sig = hashlib.sha256(out.tobytes()).hexdigest()[:16]
    return width, height, 1, sig


def decode_media(data: bytes) -> tuple[int, int, int, str]:
    """Sniff + decode a media payload. BMP/WAV/PNG are fully decoded here
    (PNG via stdlib zlib — see :func:`decode_png`); formats whose codecs
    this environment genuinely lacks (JPEG/FLAC/MP4) raise
    NotImplementedError — the one remaining stub."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    if data[:8] == PNG_MAGIC:
        return decode_png(data)
    raise NotImplementedError(
        "media formats needing codec libraries this environment does not "
        "ship (JPEG/FLAC/MP4/...) are stubbed; BMP/WAV/PNG decode is real"
    )


def _decode_fake(media_ref: str) -> tuple[int, int, int, str]:
    """Deterministic fake decode: metadata from sha2(media_ref) hex digits.

    width  = 32 * (1-based index of hex digit 1)
    height = 32 * (1-based index of hex digit 2)
    n_frames =     1-based index of hex digit 3
    feature_sig = first 16 hex chars
    (reproducible in SQL: 32 * instr('0123..f', substr(sha256(ref), 1, 1)))
    """
    h = hashlib.sha256(media_ref.encode("utf-8")).hexdigest()
    return (
        32 * (HEX.index(h[0]) + 1),
        32 * (HEX.index(h[1]) + 1),
        HEX.index(h[2]) + 1,
        h[:16],
    )


def extract_media_features(media_spans: DataFrame, deterministic: bool = True) -> DataFrame:
    """Decode media spans into typed feature rows via ``mapInPandas``.

    ``deterministic=True``: metadata from sha2(media_ref) (SQL-oracle
    reproducible; needs only (doc_id, media_ref)). ``deterministic=False``:
    REAL decode of the ``media_bytes`` binary column (see
    :func:`decode_media` — BMP/WAV decoded fully, compressed formats raise).
    Either way the decode is map-only over Arrow batches; only feature rows
    continue downstream.
    """
    cols = ["doc_id", "media_ref"] + ([] if deterministic else ["media_bytes"])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "media_ref": [], "width": [],
                "height": [], "n_frames": [], "feature_sig": [],
            }
            payloads = pdf["media_bytes"] if "media_bytes" in pdf else pdf["media_ref"]
            for doc_id, ref, payload in zip(pdf["doc_id"], pdf["media_ref"], payloads):
                if ref is None:
                    continue
                if deterministic:
                    w, h, nf, sig = _decode_fake(ref)
                else:
                    if payload is None:
                        continue  # payload-less span: skip, like a null ref
                    w, h, nf, sig = decode_media(bytes(payload))
                rows["doc_id"].append(doc_id)
                rows["media_ref"].append(ref)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["n_frames"].append(nf)
                rows["feature_sig"].append(sig)
            yield pd.DataFrame(rows).astype(
                {"width": "int32", "height": "int32", "n_frames": "int32"}
            ) if rows["doc_id"] else pd.DataFrame(
                {k: pd.Series(v, dtype="object") for k, v in rows.items()}
            )

    return media_spans.select(*cols).mapInPandas(run, MEDIA_FEATURE_SCHEMA)


def frame_sample_refs(features: DataFrame, stride: int = 2) -> DataFrame:
    """Frame sampling plumbing: one row per sampled frame index
    (doc_id, media_ref, frame_idx) — pure explode, no Python."""
    return features.select(
        "doc_id",
        "media_ref",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(stride))
        ).alias("frame_idx"),
    )
