"""NeXML character-matrix ingestion (SURVEY.md S1, real-XML path).

The reference SAX-parses NeXML files one at a time on a single thread
(PhenexToOWL.scala:43-59 via SAXBuilder; util/PhenoXMLUtil.scala,
build/ConvertNeXML.scala). Here the corpus is a DataFrame with one NeXML
document per row — the shape an Iceberg documents table gives you — and the
parse is an Arrow-batched ``mapInPandas`` over stdlib ``xml.etree``: one
pass per partition, no shuffle, throughput scales with executors. A single
pass emits every element family (matrix / otu / character / state / cell)
into one discriminated row set; callers split it with cheap filters instead
of re-parsing per table.

Structural coverage mirrors PhenexToOWL's translate* functions:

- matrix metadata: dc identifier/title/bibliographicCitation
  (translateMatrix, :61-87),
- OTUs with their taxon IRI (translateOTUs),
- characters and states (translateCharacters),
- matrix cells with otu/char refs and states, flattening
  uncertain/polymorphic state sets into their members
  (translateMatrixCell, :118-143 — the ``member`` expansion).

Cell individuals are content-derived (doc, otu, char) skolems, not UUIDs
(OntUtil.nextIndividual), per the engine determinism contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark import vocab

# CDAO/vocab IRIs used by the reference (Vocab.scala:31-41, :87)
CHARACTER_STATE_DATA_MATRIX = "http://purl.obolibrary.org/obo/CDAO_0000056"
STANDARD_CELL = "http://purl.obolibrary.org/obo/CDAO_0000008"
BELONGS_TO_CHARACTER = "http://purl.obolibrary.org/obo/CDAO_0000205"
BELONGS_TO_TU = "http://purl.obolibrary.org/obo/CDAO_0000191"
HAS_STATE = "http://purl.obolibrary.org/obo/CDAO_0000184"
HAS_EXTERNAL_REFERENCE = "http://purl.obolibrary.org/obo/CDAO_0000164"

MATRIX_PREFIX = "http://purl.phenoscape.org/matrix/"

NEXML_SCHEMA = (
    "doc_id string, kind string, e_id string, label string,"
    " ref1 string, ref2 string, states array<string>"
)


def _local(tag: str) -> str:
    """Strip any XML namespace: '{http://...}cell' -> 'cell'."""
    return tag.rsplit("}", 1)[-1]


def _metas(elem) -> list:
    return [c for c in elem if _local(c.tag) == "meta"]


def _meta_literal(elem, prop_local: str) -> str | None:
    for m in _metas(elem):
        prop = m.get("property") or ""
        if prop.rsplit(":", 1)[-1] == prop_local:
            return m.get("content") or (m.text or "").strip() or None
    return None


def _parse_doc(doc_id: str, xml_text: str) -> list[tuple]:
    import xml.etree.ElementTree as ET

    rows: list[tuple] = []
    try:
        root = ET.fromstring(xml_text)
    except ET.ParseError as exc:
        rows.append((doc_id, "error", None, str(exc), None, None, None))
        return rows

    def children(elem, name):
        return [c for c in elem if _local(c.tag) == name]

    # matrix-level metadata (translateMatrix: dcterms identifier/title/
    # bibliographicCitation, with the reference's literal fallbacks)
    identifier = _meta_literal(root, "identifier")
    title = _meta_literal(root, "title")
    citation = _meta_literal(root, "bibliographicCitation") or "<missing citation>"
    rows.append((doc_id, "matrix", identifier, title, citation, None, None))

    # OTUs: id, label, taxon IRI from a resource meta href
    for otus in children(root, "otus"):
        for otu in children(otus, "otu"):
            taxon = None
            for m in _metas(otu):
                href = m.get("href")
                if href:
                    taxon = href
                    break
            rows.append((doc_id, "otu", otu.get("id"), otu.get("label"), taxon, None, None))

    member_states: dict[str, list[str]] = {}
    for chars_block in children(root, "characters"):
        for fmt in children(chars_block, "format"):
            for states_block in children(fmt, "states"):
                for st in children(states_block, "state"):
                    rows.append(
                        (doc_id, "state", st.get("id"), st.get("label"),
                         st.get("symbol"), states_block.get("id"), None)
                    )
                # polymorphic/uncertain sets: flattened to member states
                # (translateMatrixCell:135-137)
                for poly in children(states_block, "polymorphic_state_set") + children(
                    states_block, "uncertain_state_set"
                ):
                    member_states[poly.get("id")] = [
                        m.get("state") for m in children(poly, "member")
                    ]
            for char in children(fmt, "char"):
                rows.append(
                    (doc_id, "character", char.get("id"), char.get("label"),
                     char.get("states"), None, None)
                )
        for matrix in children(chars_block, "matrix"):
            for row in children(matrix, "row"):
                otu_id = row.get("otu")
                for cell in children(row, "cell"):
                    state_ref = cell.get("state")
                    states = member_states.get(state_ref, [state_ref])
                    rows.append(
                        (doc_id, "cell", None, None, otu_id, cell.get("char"), states)
                    )
    return rows


def parse_nexml(documents: DataFrame, xml_col: str = "xml") -> DataFrame:
    """(doc_id, xml) -> discriminated NeXML element rows (NEXML_SCHEMA).

    One Arrow-batched parse per partition; malformed documents yield a
    single kind='error' row (label = parser message) instead of failing the
    stage — at corpus scale a poison document must not kill the job.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["doc_id", "kind", "e_id", "label", "ref1", "ref2", "states"]
        for pdf in batches:
            out: list[tuple] = []
            for doc_id, xml_text in zip(pdf["doc_id"], pdf[xml_col]):
                if xml_text:
                    out.extend(_parse_doc(str(doc_id), xml_text))
            yield pd.DataFrame(out, columns=cols)

    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"), F.col(xml_col)
    ).mapInPandas(run, NEXML_SCHEMA)


def nexml_triples(parsed: DataFrame) -> DataFrame:
    """Cell/OTU subgraph triples from :func:`parse_nexml` output, mirroring
    translateMatrixCell (PhenexToOWL.scala:118-143):

    - (cell, rdf:type, StandardCell)
    - (cell, belongs_to_character, char), (cell, belongs_to_TU, otu)
    - (cell, has_state, state) per flattened state
    - (taxon, exhibits_state, state) when the OTU carries a taxon IRI

    Cell IRIs: content skolem over (doc, otu, char). OTU/char/state ids are
    scoped to their document (doc#id) so ids may repeat across files.
    """
    cells = parsed.where(F.col("kind") == "cell").select(
        "doc_id",
        F.col("ref1").alias("otu_id"),
        F.col("ref2").alias("char_id"),
        "states",
    )
    scoped = lambda c: F.concat(F.lit(MATRIX_PREFIX), F.col("doc_id"), F.lit("#"), c)  # noqa: E731
    cell_iri = F.concat(
        F.lit(MATRIX_PREFIX), F.col("doc_id"), F.lit("#cell-"),
        F.col("otu_id"), F.lit("-"), F.col("char_id"),
    )

    def t(subj, pred, obj):
        return [subj.alias("subj"), pred.alias("pred"), obj.alias("obj")]

    typed = cells.select(*t(cell_iri, F.lit(vocab.RDF_TYPE), F.lit(STANDARD_CELL)))
    to_char = cells.select(
        *t(cell_iri, F.lit(BELONGS_TO_CHARACTER), scoped(F.col("char_id")))
    )
    to_otu = cells.select(*t(cell_iri, F.lit(BELONGS_TO_TU), scoped(F.col("otu_id"))))
    has_state = cells.select(
        "doc_id", "otu_id", "char_id", F.explode("states").alias("state_id")
    ).where(F.col("state_id").isNotNull())
    state_t = has_state.select(
        *t(
            F.concat(
                F.lit(MATRIX_PREFIX), F.col("doc_id"), F.lit("#cell-"),
                F.col("otu_id"), F.lit("-"), F.col("char_id"),
            ),
            F.lit(HAS_STATE),
            scoped(F.col("state_id")),
        )
    )
    otus = parsed.where((F.col("kind") == "otu") & F.col("ref1").isNotNull()).select(
        "doc_id", F.col("e_id").alias("otu_id"), F.col("ref1").alias("taxon")
    )
    exhibits = (
        has_state.join(otus, ["doc_id", "otu_id"])
        .select(*t(F.col("taxon"), F.lit(vocab.EXHIBITS_STATE), scoped(F.col("state_id"))))
    )
    return (
        typed.unionByName(to_char)
        .unionByName(to_otu)
        .unionByName(state_t)
        .unionByName(exhibits)
        .dropDuplicates()
    )
