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


def test_real_decode_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._decode_real(b"\x00")


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
