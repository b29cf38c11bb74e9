"""Multimodal (media-span) handling: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The reference ingests image-depiction records (image URL + depicted
structure, PhenoteImageDepictionsToOWL.scala:31-61); our interleaved input
carries those as media spans (kind='media', media_ref). This module makes
the Spark-side plumbing real — schema, partitioning, UDF signature, Arrow
batch shape — and the decode itself is REAL for uncompressed container
formats (BMP 24/32-bit images, RIFF/WAVE PCM audio: pure struct + numpy,
no external library needed). Compressed formats (JPEG/PNG/MP4) are the one
remaining stub behind an import-try — those genuinely need codec libraries
this environment does not ship. A deterministic fake decode also remains
for SQL-oracle-checkable end-to-end runs over refs without payloads.

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


def decode_media(data: bytes) -> tuple[int, int, int, str]:
    """Sniff + decode a media payload. BMP/WAV are fully decoded here;
    compressed formats raise NotImplementedError (codec libraries are not
    available in this environment — the one remaining stub)."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WAVE":
        return decode_wav(data)
    raise NotImplementedError(
        "compressed media formats (JPEG/PNG/MP4/...) require codec "
        "libraries not shipped in this environment"
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
