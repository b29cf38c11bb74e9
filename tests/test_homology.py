from __future__ import annotations

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.operators import homology


def test_homology_axioms(spark, corpus):
    c, paths = corpus
    h = spark.read.parquet(paths["homology"])
    triples = homology.homology_axioms(h)
    rows = triples.collect()
    got = {(r["subj"], r["pred"], r["obj"]) for r in rows}

    # reciprocal pairing: every positive homology edge has its reverse (J13)
    hom_edges = [
        (s, p, o) for (s, p, o) in got
        if p in (homology.IN_HISTORICAL_HOMOLOGY, homology.SERIALLY_HOMOLOGOUS_TO)
    ]
    assert hom_edges
    for s, p, o in hom_edges:
        assert (o, p, s) in got, "missing reciprocal edge"

    # negated rows produce no homology edge but still produce the OBAN
    # association when evidence is present
    n_pos = sum(1 for r in c.tables["homology"]["relation"] if not r.startswith("not "))
    # each positive row => 2 directed edges, deduped across identical rows
    assert len(hom_edges) <= 2 * n_pos

    # evidence rows carry an association subgraph
    ev_rows = [i for i, e in enumerate(c.tables["homology"]["evidence_code"]) if e]
    if ev_rows:
        assert any(p == vocab.RDF_TYPE and o == homology.ASSOCIATION for _, p, o in got)
        assert any(p == homology.HAS_PREDICATE for _, p, _ in got)


def test_homology_determinism(spark, corpus):
    c, paths = corpus
    h = spark.read.parquet(paths["homology"])
    a = {(r["subj"], r["pred"], r["obj"]) for r in homology.homology_axioms(h).collect()}
    b = {(r["subj"], r["pred"], r["obj"]) for r in homology.homology_axioms(h.repartition(7)).collect()}
    assert a == b
