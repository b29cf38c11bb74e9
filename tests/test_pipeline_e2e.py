"""End-to-end: full KB build on the fixture corpus vs the sequential Python
oracle — the P/R >= 0.95 triple-set gate (BASELINE.json north_rule), plus
checkpoint/resume semantics."""

from __future__ import annotations

import pytest

from phenoscape_owl_tools_spark.oracle import pipeline_oracle
from phenoscape_owl_tools_spark.plans import kb_build


def _inputs(spark, paths):
    return kb_build.KBInputs(
        documents=spark.read.parquet(paths["documents"]),
        terms=spark.read.parquet(paths["terms"]),
        synonyms=spark.read.parquet(paths["synonyms"]),
        subclass_edges=spark.read.parquet(paths["subclass_edges"]),
        equiv_edges=spark.read.parquet(paths["equiv_edges"]),
        restrictions=spark.read.parquet(paths["restrictions"]),
        gene_annotations=spark.read.parquet(paths["gene_annotations"]),
        homology=spark.read.parquet(paths["homology"]),
        taxonomy_edges=spark.read.parquet(paths["taxonomy_edges"]),
        state_phenotypes=spark.read.parquet(paths["state_phenotypes"]),
    )


@pytest.fixture(scope="module")
def pipeline_run(spark, corpus, tmp_path_factory):
    c, paths = corpus
    out = tmp_path_factory.mktemp("kb_out")
    res = kb_build.run(spark, _inputs(spark, paths), out_dir=out, n_buckets=4)
    got = {(r["subj"], r["pred"], r["obj"]) for r in res.triples.collect()}
    return c, paths, out, res, got


def test_triple_pr_gate(pipeline_run):
    c, paths, out, res, got = pipeline_run
    expected = pipeline_oracle.expected_triples(c)
    tp = len(got & expected)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(expected) if expected else 0.0
    print(f"\ntriples: got={len(got)} expected={len(expected)} "
          f"P={precision:.4f} R={recall:.4f}")
    if precision < 0.95 or recall < 0.95:
        fp = list(got - expected)[:8]
        fn = list(expected - got)[:8]
        raise AssertionError(
            f"P={precision:.4f} R={recall:.4f}\nFP sample: {fp}\nFN sample: {fn}"
        )


def test_presence_absence_emitted(pipeline_run):
    from phenoscape_owl_tools_spark import vocab

    _, _, _, _, got = pipeline_run
    preds = {p for _, p, _ in got}
    assert vocab.HAS_PRESENCE_OF in preds
    assert vocab.HAS_ABSENCE_OF in preds
    assert vocab.HAS_PHENOTYPIC_PROFILE in preds
    assert vocab.DEPICTS in preds


def test_resume_skips_stages(spark, pipeline_run):
    c, paths, out, first, got = pipeline_run
    res2 = kb_build.run(spark, _inputs(spark, paths), out_dir=out, n_buckets=4)
    resumed = [k for k, m in res2.manifests.items() if m.get("resumed")]
    assert "triples" in resumed and "closure" in resumed, res2.manifests.keys()
    got2 = {(r["subj"], r["pred"], r["obj"]) for r in res2.triples.collect()}
    assert got2 == got


def test_manifests_have_lineage(pipeline_run):
    _, _, out, res, _ = pipeline_run
    m = res.manifests["triples"]
    assert m["row_count"] > 0
    assert m["checksum"] is not None
    assert m["partition_counts"], "subject-hash partition counts missing"
    assert sum(m["partition_counts"].values()) == m["row_count"]


def test_resume_invalidated_by_input_change(spark, corpus, tmp_path_factory):
    """Changed input content with identical schema must NOT be served stale
    results from a previous run's stages."""
    from pyspark.sql import functions as F

    c, paths = corpus
    out = tmp_path_factory.mktemp("kb_out_inval")
    inputs = _inputs(spark, paths)
    res1 = kb_build.run(spark, inputs, out_dir=out, n_buckets=4)
    n1 = res1.triples.count()
    # drop half the documents: same schema, different content
    smaller = kb_build.KBInputs(
        **{**inputs.__dict__, "documents": inputs.documents.limit(40)}
    )
    res2 = kb_build.run(spark, smaller, out_dir=out, n_buckets=4)
    resumed = [k for k, m in res2.manifests.items()
               if isinstance(m, dict) and m.get("resumed")]
    assert resumed == [], f"stages wrongly resumed: {resumed}"
    assert res2.triples.count() != n1
