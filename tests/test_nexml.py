from __future__ import annotations

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.sources import nexml

NEXML_DOC = """<?xml version="1.0" encoding="UTF-8"?>
<nex:nexml xmlns:nex="http://www.nexml.org/2009" xmlns:dcterms="http://purl.org/dc/terms/" version="0.9">
  <meta xsi_type="LiteralMeta" property="dcterms:identifier" content="matrix-42" xmlns:xsi="x"/>
  <meta property="dcterms:title" content="Fin characters"/>
  <meta property="dcterms:bibliographicCitation" content="Doe 2020"/>
  <otus id="otus1">
    <otu id="otu1" label="Danio rerio">
      <meta href="http://purl.obolibrary.org/obo/VTO_0000001" rel="OBO_REL:is_a"/>
    </otu>
    <otu id="otu2" label="Unplaced taxon"/>
  </otus>
  <characters id="chars1" xsi_type="nex:StandardCells">
    <format>
      <states id="states1">
        <state id="s1" label="present" symbol="1"/>
        <state id="s2" label="absent" symbol="0"/>
        <polymorphic_state_set id="ps1" symbol="2">
          <member state="s1"/>
          <member state="s2"/>
        </polymorphic_state_set>
      </states>
      <char id="c1" label="dorsal fin" states="states1"/>
      <char id="c2" label="anal fin" states="states1"/>
    </format>
    <matrix>
      <row id="r1" otu="otu1">
        <cell char="c1" state="s1"/>
        <cell char="c2" state="ps1"/>
      </row>
      <row id="r2" otu="otu2">
        <cell char="c1" state="s2"/>
      </row>
    </matrix>
  </characters>
</nex:nexml>
"""


def _parsed(spark):
    docs = spark.createDataFrame([("d1", NEXML_DOC)], "doc_id string, xml string")
    return nexml.parse_nexml(docs)


def test_parse_nexml_elements(spark):
    rows = _parsed(spark).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r)
    assert len(by_kind["otu"]) == 2
    assert len(by_kind["character"]) == 2
    assert len(by_kind["state"]) == 2  # polymorphic set is not a state row
    assert len(by_kind["cell"]) == 3
    m, = by_kind["matrix"]
    assert (m.e_id, m.label, m.ref1) == ("matrix-42", "Fin characters", "Doe 2020")
    otu1 = next(r for r in by_kind["otu"] if r.e_id == "otu1")
    assert otu1.ref1 == "http://purl.obolibrary.org/obo/VTO_0000001"
    poly_cell = next(r for r in by_kind["cell"] if r.ref2 == "c2")
    assert sorted(poly_cell.states) == ["s1", "s2"]  # member flattening


def test_parse_nexml_malformed_is_error_row(spark):
    docs = spark.createDataFrame(
        [("bad", "<nexml><unclosed></nexml>"), ("empty", None)],
        "doc_id string, xml string",
    )
    rows = nexml.parse_nexml(docs).collect()
    assert [r.kind for r in rows] == ["error"]
    assert rows[0].doc_id == "bad"


def test_nexml_triples_cell_subgraph(spark):
    got = {
        (r.subj, r.pred, r.obj) for r in nexml.nexml_triples(_parsed(spark)).collect()
    }
    P = nexml.MATRIX_PREFIX
    cell = f"{P}d1#cell-otu1-c1"
    assert (cell, vocab.RDF_TYPE, nexml.STANDARD_CELL) in got
    assert (cell, nexml.BELONGS_TO_CHARACTER, f"{P}d1#c1") in got
    assert (cell, nexml.BELONGS_TO_TU, f"{P}d1#otu1") in got
    assert (cell, nexml.HAS_STATE, f"{P}d1#s1") in got
    # polymorphic cell links both member states
    poly = f"{P}d1#cell-otu1-c2"
    assert (poly, nexml.HAS_STATE, f"{P}d1#s1") in got
    assert (poly, nexml.HAS_STATE, f"{P}d1#s2") in got
    # exhibits_state only for the OTU with a taxon IRI
    taxon = "http://purl.obolibrary.org/obo/VTO_0000001"
    assert (taxon, vocab.EXHIBITS_STATE, f"{P}d1#s1") in got
    assert not any(p == vocab.EXHIBITS_STATE and s != taxon for s, p, o in got)
    # determinism: re-run equal
    again = {
        (r.subj, r.pred, r.obj) for r in nexml.nexml_triples(_parsed(spark)).collect()
    }
    assert got == again
