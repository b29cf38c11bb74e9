"""OWL functional-syntax reader tests.

The parity test runs the REFERENCE'S OWN test fixture
(``src/test/resources/NegationHierarchyAsserterTest.ofn``) through the
engine and asserts the exact expectations of the reference's
``NegationHierarchyAsserterTest.scala`` (test1-test9).
"""

from __future__ import annotations

import os

import pytest

from phenoscape_owl_tools_spark.sources import ofn

REF_OFN = "/root/reference/src/test/resources/NegationHierarchyAsserterTest.ofn"
BASE = "http://owl.phenoscape.org/NegationHierarchyAsserterTest#"

OWN_DOC = """
Prefix(:=<http://example.org/onto#>)
Prefix(ex:=<http://example.org/x#>)
Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)
Ontology(<http://example.org/onto>
Declaration(Class(:Fin))
Declaration(ObjectProperty(ex:part_of))
SubClassOf(:Fin ObjectSomeValuesFrom(ex:part_of :Body))
EquivalentClasses(:FinPart ObjectIntersectionOf(:Fin ObjectSomeValuesFrom(ex:part_of :Body)))
SubObjectPropertyOf(ObjectPropertyChain(ex:part_of ex:part_of) ex:part_of)
SubObjectPropertyOf(ex:part_of ex:overlaps)
AnnotationAssertion(rdfs:label :Fin "the fin"@en)
AnnotationAssertion(rdfs:comment :Fin "n=1"^^<http://www.w3.org/2001/XMLSchema#string>)
ClassAssertion(:Fin ex:fin1)
ObjectPropertyAssertion(ex:part_of ex:fin1 ex:body1)
DisjointClasses(:Fin :Body)
SubClassOf(:Fin :Appendage)
)
"""


def test_parse_document_axiom_shapes():
    rows = ofn.parse_document(OWN_DOC, src="own", strict=True)
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r[1], []).append(r)

    assert ("own", "declaration", "http://example.org/onto#Fin", None, "Class") in rows
    sub = by_kind["subclass_of"][0]
    assert sub[2] == "http://example.org/onto#Fin"
    assert sub[4] == (
        "ObjectSomeValuesFrom(http://example.org/x#part_of "
        "http://example.org/onto#Body)"
    )
    # intersection args are sorted (set semantics)
    eq = by_kind["equivalent_classes"][0]
    inner = eq[4]
    assert inner.startswith("ObjectIntersectionOf(")
    args = inner[len("ObjectIntersectionOf("):-1]
    assert args == " ".join(sorted(args.split(" ")))
    chain = by_kind["property_chain"][0]
    assert chain[2] == "http://example.org/x#part_of http://example.org/x#part_of"
    assert chain[4] == "http://example.org/x#part_of"
    assert ("own", "sub_object_property", "http://example.org/x#part_of", None,
            "http://example.org/x#overlaps") in rows
    labels = [r for r in by_kind["annotation"]
              if r[3] == "http://www.w3.org/2000/01/rdf-schema#label"]
    assert labels[0][4] == "the fin"
    assert by_kind["class_assertion"][0][2] == "http://example.org/x#fin1"
    assert by_kind["object_property_assertion"][0] == (
        "own", "object_property_assertion", "http://example.org/x#fin1",
        "http://example.org/x#part_of", "http://example.org/x#body1")
    assert len(by_kind["disjoint_classes"]) == 1


def test_parse_unsupported_axiom_strict_raises():
    doc = "Prefix(:=<http://e.org#>)Ontology(FunctionalObjectProperty(:p))"
    with pytest.raises(ofn.OfnParseError):
        ofn.parse_document(doc, strict=True)
    assert ofn.parse_document(doc, strict=False) == []


@pytest.fixture(scope="module")
def ref_axioms(spark):
    if not os.path.exists(REF_OFN):
        pytest.skip("reference fixture not available")
    return ofn.read_ofn(spark, REF_OFN).cache()


def test_reference_fixture_before_axioms(ref_axioms):
    """NegationHierarchyAsserterTest 'beforeAxioms' (test1-test6)."""
    rows = {(r["kind"], r["s"], r["o"]) for r in ref_axioms.collect()}
    assert ("subclass_of", BASE + "B", BASE + "A") in rows  # test1
    assert ("subclass_of", BASE + "NotA", BASE + "NotB") not in rows  # test2
    assert ("subclass_of", BASE + "C", BASE + "B") in rows  # test3
    assert ("subclass_of", BASE + "NotB", BASE + "NotC") not in rows  # test4
    eq = {(s, o) for k, s, o in rows if k == "equivalent_classes"}
    assert (BASE + "B", BASE + "D") in eq or (BASE + "D", BASE + "B") in eq  # test5
    assert not ({(BASE + "NotB", BASE + "NotD"), (BASE + "NotD", BASE + "NotB")}
                & eq)  # test6
    assert ("subclass_of", BASE + "NotHasPartB", BASE + "NotHasPartC") not in rows


def test_reference_fixture_negation_hierarchy(ref_axioms):
    """NegationHierarchyAsserterTest 'afterAxioms' (test7-test9) — the
    engine's relational asserter reproduces the reference's added axioms."""
    sub_ax, eq_ax = ofn.negation_hierarchy_axioms(ref_axioms)
    subs = {(r["sub"], r["sup"]) for r in sub_ax.collect()}
    assert (BASE + "NotA", BASE + "NotB") in subs  # test7
    assert (BASE + "NotB", BASE + "NotC") in subs  # test8
    assert (BASE + "NotHasPartB", BASE + "NotHasPartC") in subs  # test9b
    # test9a: NotB EquivalentTo NotD (star edges, either orientation)
    eqs = {frozenset((r["a"], r["b"])) for r in eq_ax.collect()}
    assert frozenset((BASE + "NotB", BASE + "NotD")) in eqs
    # classMap expansion: negates(NotD, B) via EquivalentClasses(B, D)
    # gives the additional reference-entailed edge NotA -> NotD
    assert (BASE + "NotA", BASE + "NotD") in subs


def test_read_ofn_extractors(spark, tmp_path):
    p = tmp_path / "own.ofn"
    p.write_text(OWN_DOC)
    ax = ofn.read_ofn(spark, str(p))
    assert ofn.subclass_edges(ax).count() == 1
    chains = ofn.property_chains(ax).collect()
    assert len(chains) == 1 and chains[0]["sup"] == "http://example.org/x#part_of"
    anns = ofn.annotations(
        ax, prop="http://www.w3.org/2000/01/rdf-schema#label").collect()
    assert len(anns) == 1


def test_render_round_trip():
    rows = ofn.parse_document(OWN_DOC, src="own")
    text2 = ofn.render_document(rows)
    rows2 = ofn.parse_document(text2, src="own", strict=True)
    assert sorted(r[1:] for r in rows) == sorted(r[1:] for r in rows2)


def test_render_round_trip_reference_fixture():
    if not os.path.exists(REF_OFN):
        import pytest as _pytest
        _pytest.skip("reference fixture not available")
    rows = ofn.parse_document(open(REF_OFN).read(), src="ref")
    rows2 = ofn.parse_document(ofn.render_document(rows), src="ref")
    assert sorted(r[1:] for r in rows) == sorted(r[1:] for r in rows2)


def test_write_ofn(spark, tmp_path):
    p_in = tmp_path / "in.ofn"
    p_in.write_text(OWN_DOC)
    ax = ofn.read_ofn(spark, str(p_in))
    p_out = tmp_path / "out.ofn"
    ofn.write_ofn(ax, str(p_out))
    ax2 = ofn.read_ofn(spark, str(p_out))
    a = {tuple(r)[1:] for r in ax.collect()}
    b = {tuple(r)[1:] for r in ax2.collect()}
    assert a == b


def test_axiom_annotations_are_tolerated():
    doc = (
        "Prefix(:=<http://e.org#>)\n"
        "Prefix(rdfs:=<http://www.w3.org/2000/01/rdf-schema#>)\n"
        "Ontology(\n"
        'SubClassOf(Annotation(rdfs:comment "from curation") :A :B)\n'
        ")"
    )
    rows = ofn.parse_document(doc, strict=True)
    assert rows == [("", "subclass_of", "http://e.org#A", None, "http://e.org#B")]
