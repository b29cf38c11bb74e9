"""pack_sequences / chunk_documents / mixture_weights: python-oracle
parity, stream-contiguity invariants, chunk coverage properties, and the
map-only plan contract for chunking."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Row

from phenoscape_owl_tools_spark.operators.packing import (
    chunk_documents,
    mixture_weights,
    pack_sequences,
)


def _mkdocs(spark, sizes, source=None):
    return spark.createDataFrame(
        [
            Row(
                doc_id=i,
                text=" ".join(f"w{i}t{j}" for j in range(n)),
                source=(source(i) if source else f"s{i % 3}"),
            )
            for i, n in enumerate(sizes)
        ]
    )


def _py_pack(sizes, seq_len):
    """Single-stream oracle: md5(doc_id) order, running token offsets."""
    order = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), str(i), n)
        for i, n in enumerate(sizes)
    )
    out, cum = {}, 0
    for _, doc_id, n in order:
        out[doc_id] = (
            n,
            cum,
            cum // seq_len,
            (cum + n - 1) // seq_len,
            cum % seq_len,
        )
        cum += n
    return out


def test_pack_matches_python_oracle(spark):
    sizes = [5 + (i * 7) % 40 for i in range(80)]
    got = {
        r["doc_id"]: (
            r["n_tokens"],
            r["start_tok"],
            r["seq_first"],
            r["seq_last"],
            r["offset_in_seq"],
        )
        for r in pack_sequences(_mkdocs(spark, sizes), seq_len=64).collect()
    }
    assert got == _py_pack(sizes, 64)


def test_pack_stream_is_contiguous_and_bucket_width_invariant(spark):
    sizes = [1 + (i * 13) % 29 for i in range(120)]
    docs = _mkdocs(spark, sizes)
    rows = sorted(
        pack_sequences(docs, seq_len=32).collect(), key=lambda r: r["start_tok"]
    )
    cum = 0
    for r in rows:
        assert r["start_tok"] == cum  # no gaps, no overlaps: a true stream
        assert r["offset_in_seq"] == r["start_tok"] % 32
        cum += r["n_tokens"]
    assert cum == sum(sizes)
    # bucket_chars changes only the execution shape, never the result
    one = {tuple(r) for r in pack_sequences(docs, 32, bucket_chars=1).collect()}
    assert one == {tuple(r) for r in rows}


def _py_chunks(n, size, stride):
    m = 1 + max(0, math.ceil((n - size) / stride))
    return [(c, c * stride, min(size, n - c * stride)) for c in range(m)]


def test_chunk_coverage_and_hashes(spark):
    sizes = [1, 7, 31, 32, 33, 56, 57, 100]
    docs = _mkdocs(spark, sizes)
    got = {}
    for r in chunk_documents(docs, size=32, stride=24).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for i, n in enumerate(sizes):
        rows = sorted(got[str(i)], key=lambda r: r["chunk_id"])
        expect = _py_chunks(n, 32, 24)
        assert [(r["chunk_id"], r["start_tok"], r["n_chunk_tokens"]) for r in rows] == expect
        # every token position is covered by some chunk
        covered = set()
        for _, start, ln in expect:
            covered.update(range(start, start + ln))
        assert covered == set(range(n))
        # hash is the content fingerprint of exactly the window's tokens
        toks = [f"w{i}t{j}" for j in range(n)]
        for r in rows:
            window = " ".join(toks[r["start_tok"] : r["start_tok"] + 32])
            assert r["chunk_hash"] == hashlib.md5(window.encode()).hexdigest()


def test_chunking_is_map_only(spark):
    plan = chunk_documents(
        _mkdocs(spark, [10, 50]), size=8, stride=4
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # scan-speed: no shuffle anywhere
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_mixture_weights_normalize_and_temper(spark):
    docs = _mkdocs(spark, [10] * 30 + [40] * 10, source=lambda i: "big" if i >= 30 else "small")
    rows = {r["source"]: r for r in mixture_weights(docs, alpha=0.5, by="source").collect()}
    assert rows["small"]["n_docs"] == 30 and rows["big"]["n_docs"] == 10
    assert abs(rows["small"]["weight"] + rows["big"]["weight"] - 1.0) < 1e-6
    # alpha=0.5 flattens: the small source gets MORE than its token share,
    # and alpha=1 reproduces proportional sampling exactly
    share = rows["small"]["n_tokens"] / (rows["small"]["n_tokens"] + rows["big"]["n_tokens"])
    assert rows["small"]["weight"] > share
    prop = {
        r["source"]: r["weight"]
        for r in mixture_weights(docs, alpha=1.0, by="source").collect()
    }
    assert abs(prop["small"] - share) < 1e-6


def test_null_text_reads_as_empty(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=0, text=None, source="s"), Row(doc_id=1, text="a b c", source="s")]
    )
    packs = {r["doc_id"]: r for r in pack_sequences(docs, 8).collect()}
    assert packs["0"]["n_tokens"] == 1  # split('') -> [''], the engine convention
    chunks = {r["doc_id"]: r for r in chunk_documents(docs, size=4, stride=2).collect()}
    assert chunks["0"]["n_chunk_tokens"] == 1
    assert chunks["0"]["chunk_hash"] == hashlib.md5(b"").hexdigest()
    mw = mixture_weights(docs, by="source").collect()[0]
    assert mw["n_tokens"] == 4  # 1 (null->'') + 3


def test_pack_windows_are_bucket_partitioned(spark):
    """The scale contract: every window ordered by the corpus-wide rk key
    must be PARTITIONED by bucket (bounded sort groups); the only
    unpartitioned window is the 256-row offset table (ordered by bucket —
    Catalyst folds its constant partition key away)."""
    import re

    plan = pack_sequences(
        _mkdocs(spark, [10] * 50), seq_len=32
    )._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\([^)]*", plan)
    assert specs, "expected window operators in the packing plan"
    for s in specs:
        if "rk#" in s:  # the cumsum over document rows
            assert s.startswith("windowspecdefinition(bucket#"), s
        else:  # the offset table: ordered by bucket, dimension-scale
            assert "bucket#" in s, s
