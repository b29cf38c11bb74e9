"""Multimodal (media-span) handling: opaque binary payloads + typed
metadata, decoded/feature-extracted via Arrow-batched ``mapInPandas``.

The reference ingests image-depiction records (image URL + depicted
structure, PhenoteImageDepictionsToOWL.scala:31-61); our interleaved input
carries those as media spans (kind='media', media_ref). This module makes
the Spark-side plumbing real — schema, partitioning, UDF signature, Arrow
batch shape — while the actual image/audio decode is STUBBED behind an
import-try (decode libraries are not available in this environment): the
deterministic fake derives all "decoded" metadata from sha2(media_ref), so
tests and SQL oracles can verify the full path end-to-end.

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


def _decode_real(media_bytes: bytes) -> dict:
    """Real decode path — requires an image library, absent here."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - env has no PIL
        raise NotImplementedError(
            "real media decode requires an image library (PIL/ffmpeg); "
            "this environment ships none — use deterministic=True"
        ) from exc
    raise NotImplementedError("wire Image.open(BytesIO(media_bytes)) here")


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

    Input needs (doc_id, media_ref); output is MEDIA_FEATURE_SCHEMA. The
    decode body is per-batch vectorized Python over Arrow; swap
    ``deterministic=False`` for the real decoder when libraries exist.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "doc_id": [], "media_ref": [], "width": [],
                "height": [], "n_frames": [], "feature_sig": [],
            }
            for doc_id, ref in zip(pdf["doc_id"], pdf["media_ref"]):
                if ref is None:
                    continue
                if deterministic:
                    w, h, nf, sig = _decode_fake(ref)
                else:
                    _decode_real(b"")
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

    return media_spans.select("doc_id", "media_ref").mapInPandas(
        run, MEDIA_FEATURE_SCHEMA
    )


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
