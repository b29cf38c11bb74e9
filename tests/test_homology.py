from __future__ import annotations

from pyspark.sql import functions as F

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


def test_ancestral_structure_model(spark):
    """HomologyTableToOWLWithAncestralStructure.scala:51-73: only 'hom to'
    rows produce axioms; 7-triple subgraph per evidence-bearing row,
    4-triple without evidence; skolems are content-derived."""
    rows = [
        ("u:a", "t:1", "hom to", "u:b", "t:2", "ECO:0000033", "PMID:1"),
        ("u:c", "t:1", "hom to", "u:d", "t:2", None, "PMID:2"),
        ("u:e", "t:1", "not hom to", "u:f", "t:2", "ECO:0000033", "PMID:3"),
        ("u:g", "t:1", "ser hom to", "u:h", "t:2", "ECO:0000033", "PMID:4"),
    ]
    cols = ["structure1", "taxon1", "relation", "structure2", "taxon2", "evidence_code", "publication"]
    df = spark.createDataFrame(rows, cols)
    got = [(r.subj, r.pred, r.obj) for r in homology.homology_axioms_ancestral(df).collect()]
    assert len(got) == 7 + 4  # evidence row: 7; no-evidence row: 4; others: 0
    by_pred = {}
    for s, p, o in got:
        by_pred.setdefault(p, []).append((s, o))
    assert len(by_pred[homology.DERIVED_BY_DESCENT_FROM]) == 4
    assert len(by_pred[homology.HAS_DERIVED_BY_DESCENDANT]) == 4
    assert len(by_pred[vocab.HAS_EVIDENCE]) == 1
    assert len(by_pred[homology.DC_SOURCE]) == 1
    (ev_s, ev_o), = by_pred[vocab.HAS_EVIDENCE]
    assert ev_s.endswith("#ancestor") and ev_o.endswith("#evidence")
    # evidence typed with the OBO-expanded code
    assert any(
        o == "http://purl.obolibrary.org/obo/ECO_0000033"
        for s, o in by_pred[vocab.RDF_TYPE]
    )
    # determinism: re-run emits the identical triple set
    again = [(r.subj, r.pred, r.obj) for r in homology.homology_axioms_ancestral(df).collect()]
    assert sorted(got) == sorted(again)


def test_rolification_model(spark):
    """HomologyTableDemoRolification.scala:41-87: positive rows emit
    self-rolification + ternary chain; negated rows only evidence."""
    rows = [
        ("u:a", "t:1", "hom to", "u:b", "t:2", "ECO:0000033", "PMID:1"),
        ("u:c", "t:3", "not hom to", "u:d", "t:4", "ECO:0000034", "PMID:2"),
        ("u:e", "t:5", "ser hom to", "u:f", "t:6", None, "PMID:3"),
    ]
    h = spark.createDataFrame(
        rows,
        "structure1 string, taxon1 string, relation string, structure2 string, "
        "taxon2 string, evidence_code string, publication string",
    )
    got = {(r["subj"], r["pred"], r["obj"])
           for r in homology.homology_axioms_rolification(h).collect()}

    chains = [(s, o) for s, p, o in got if p == homology.OWL_PROPERTY_CHAIN]
    # two positive rows -> two chain axioms, one per homology property
    assert len(chains) == 2
    assert {s for s, _ in chains} == {
        homology.IN_HISTORICAL_HOMOLOGY, homology.SERIALLY_HOMOLOGOUS_TO
    }
    # every chain node has exactly members _1.._3 with Top in the middle
    for _, ch in chains:
        members = sorted((p, o) for s, p, o in got if s == ch)
        assert [p for p, _ in members] == [homology.RDF_N + "1",
                                           homology.RDF_N + "2",
                                           homology.RDF_N + "3"]
        assert members[1][1] == homology.TOP_OBJECT_PROPERTY
        assert members[0][1].endswith("#role1")
        assert members[2][1].endswith("#role2")
    # self restrictions: 2 per positive row
    selfs = [(s, o) for s, p, o in got if p == homology.OWL_HAS_SELF]
    assert len(selfs) == 4
    # negated row contributes no roles, but its evidence individual exists
    neg_ev = [s for s, p, o in got
              if p == homology.DC_SOURCE and o == "PMID:2"]
    assert len(neg_ev) == 1
    # exactly 2 positive rows' worth of role IRIs exist (negated row none)
    roles = {o for _, p, o in got if p == homology.OWL_HAS_SELF}
    assert len(roles) == 4

    # determinism under repartition
    again = {(r["subj"], r["pred"], r["obj"])
             for r in homology.homology_axioms_rolification(h.repartition(5)).collect()}
    assert got == again


def test_rolification_chain_rules_feed_saturation(spark):
    """The binary decomposition reproduces the ternary chain: composing
    role1 ∘ Top ∘ role2 edges through property_chain_closure derives a
    homology edge."""
    from phenoscape_owl_tools_spark.operators import closure as closure_ops

    rows = [("u:a", "t:1", "hom to", "u:b", "t:2", None, "PMID:1")]
    h = spark.createDataFrame(
        rows,
        "structure1 string, taxon1 string, relation string, structure2 string, "
        "taxon2 string, evidence_code string, publication string",
    )
    rl = homology.rolification_chain_rules(h).collect()
    assert len(rl) == 2
    aux_rule = [r for r in rl if r["sup"].endswith("#aux")][0]
    top_rule = [r for r in rl if r["sup"] == homology.IN_HISTORICAL_HOMOLOGY][0]
    assert aux_rule["second"] == homology.TOP_OBJECT_PROPERTY
    assert top_rule["first"].endswith("#aux")

    # facts: x role1-self x ; x Top y ; y role2-self y
    r1, r2 = aux_rule["first"], top_rule["second"]
    facts = spark.createDataFrame(
        [(r1, "x", "x"), (homology.TOP_OBJECT_PROPERTY, "x", "y"), (r2, "y", "y")],
        "p string, s string, o string",
    )
    chains = [(r["first"], r["second"], r["sup"]) for r in rl]
    sat = closure_ops.property_chain_closure(facts, chains, keep_self_loops=True)
    got = {(r["p"], r["s"], r["o"]) for r in sat.collect()}
    assert (homology.IN_HISTORICAL_HOMOLOGY, "x", "y") in got


def test_vahm_model(spark):
    """HomologyTableToOWLVAHM.scala:55-97: member edges through a per-row
    ancestor; chain + inverse ontology axioms; negated rows emit nothing."""
    rows = [
        ("u:a", "t:1", "hom to", "u:b", "t:2", "ECO:0000033", "PMID:1"),
        ("u:c", "t:3", "not hom to", "u:d", "t:4", "ECO:0000034", "PMID:2"),
        ("u:e", "t:5", "ser hom to", "u:f", "t:6", None, "PMID:3"),
    ]
    h = spark.createDataFrame(
        rows,
        "structure1 string, taxon1 string, relation string, structure2 string, "
        "taxon2 string, evidence_code string, publication string",
    )
    got = {(r["subj"], r["pred"], r["obj"])
           for r in homology.homology_axioms_vahm(h).collect()}

    # negated row contributes nothing at all (reference guards with !negated)
    assert not any(o == "PMID:2" for _, _, o in got)

    # historical row: expr1 -memberOf-> anc and anc -hasMember-> expr1
    up = [(s, o) for s, p, o in got if p == homology.HH_MEMBER_OF]
    down = [(s, o) for s, p, o in got if p == homology.HAS_HH_MEMBER]
    assert len(up) == 2 and len(down) == 2
    (anc,) = {o for _, o in up}
    assert anc.endswith("#ancestor")
    assert {s for s, _ in down} == {anc}
    assert {o for _, o in down} == {s for s, _ in up}

    # serial row uses the serial member properties
    assert sum(1 for _, p, _ in got if p == homology.SH_MEMBER_OF) == 2

    # evidence subgraph hangs off the ancestor
    ev_edges = [(s, o) for s, p, o in got if p == vocab.HAS_EVIDENCE]
    assert ev_edges == [(anc, anc.replace("#ancestor", "#evidence"))]

    # ontology-level: inverse + chain per relation present
    inv = {(s, o) for s, p, o in got if p == homology.OWL_INVERSE_OF}
    assert inv == {(homology.HH_MEMBER_OF, homology.HAS_HH_MEMBER),
                   (homology.SH_MEMBER_OF, homology.HAS_SH_MEMBER)}
    chains = {s for s, p, o in got if p == homology.OWL_PROPERTY_CHAIN}
    assert chains == {homology.IN_HISTORICAL_HOMOLOGY,
                      homology.SERIALLY_HOMOLOGOUS_TO}


def test_vahm_chains_derive_homology_edge(spark):
    """Saturating the VAHM member edges with VAHM_CHAIN_RULES derives the
    pairwise homology relation the REA model asserts directly — the two
    models agree through the chain (the homology paper's equivalence)."""
    from phenoscape_owl_tools_spark.operators import closure as closure_ops

    rows = [("u:a", "t:1", "hom to", "u:b", "t:2", None, "PMID:1")]
    h = spark.createDataFrame(
        rows,
        "structure1 string, taxon1 string, relation string, structure2 string, "
        "taxon2 string, evidence_code string, publication string",
    )
    triples = homology.homology_axioms_vahm(h)
    facts = triples.where(
        F.col("pred").isin(homology.HH_MEMBER_OF, homology.HAS_HH_MEMBER)
    ).select(F.col("pred").alias("p"), F.col("subj").alias("s"), F.col("obj").alias("o"))
    sat = closure_ops.property_chain_closure(facts, homology.VAHM_CHAIN_RULES)
    derived = {(r["s"], r["o"]) for r in sat.collect()
               if r["p"] == homology.IN_HISTORICAL_HOMOLOGY}
    # expr1 ~ expr2 both directions (memberOf ∘ hasMember through anc)
    exprs = {r["subj"] for r in triples.collect()
             if r["pred"] == homology.HH_MEMBER_OF}
    e1, e2 = sorted(exprs)
    assert (e1, e2) in derived and (e2, e1) in derived


def test_simple_and_annotation_models(spark):
    rows = [
        ("u:a", "t:1", "hom to", "u:b", "t:2", "ECO:0000033", "PMID:1"),
        ("u:c", "t:3", "not hom to", "u:d", "t:4", "ECO:0000034", "PMID:2"),
    ]
    h = spark.createDataFrame(
        rows,
        "structure1 string, taxon1 string, relation string, structure2 string, "
        "taxon2 string, evidence_code string, publication string",
    )
    # simple model: positive rows only, reciprocal structure-level edges
    simple = {(r["subj"], r["pred"], r["obj"])
              for r in homology.homology_axioms_simple(h).collect()}
    assert ("u:a", vocab.HOMOLOGOUS_TO, "u:b") in simple
    assert ("u:b", vocab.HOMOLOGOUS_TO, "u:a") in simple
    assert not any(o == "PMID:2" for _, _, o in simple)

    # annotation model: every row typed positive/negative
    ann = {(r["subj"], r["pred"], r["obj"])
           for r in homology.homology_axioms_annotations(h).collect()}
    types = {o for _, p, o in ann if p == vocab.RDF_TYPE and "Annotation" in o}
    assert types == {homology.HOMOLOGY_ANNOTATION, homology.NEG_HOMOLOGY_ANNOTATION}
    abouts = [o for _, p, o in ann if p == homology.ABOUT_STRUCTURE]
    assert sorted(abouts) == ["u:a", "u:b", "u:c", "u:d"]
    assert any(o == "PMID:2" for _, _, o in ann)
