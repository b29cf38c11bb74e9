"""IRI minting and conversion as pure Spark column expressions.

Determinism contract (SURVEY.md §7.1): every minted IRI is a content hash —
never a UUID or a monotonically-increasing id — so that re-runs, resumed
runs, and differently-partitioned runs emit byte-identical triples. The
reference itself hashes where it matters (``sha1Hex(line)``,
HomologyTableWithTaxa.scala:50); where it mints UUIDs
(OntUtil.nextIndividual, PhenexToOWL.scala:121) we deliberately diverge to
content hashes so triple sets are comparable across runs.

All helpers return Column expressions (JVM-side, codegen-friendly); none of
this runs in Python at execution time.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark import vocab

MINT_PREFIX = "http://purl.org/phenoscape/minted/"


MINT_SEP = "\x1f"  # unit separator: cannot appear in IRIs or sane ids
MINT_NULL = "\x00"  # explicit null marker (concat_ws silently drops nulls)


def mint_iri(kind: str, *parts: Column | str) -> Column:
    """Content-derived IRI: sha256 over (kind, parts...).

    Replaces the reference's UUID minting (PhenexToOWL.scala:121) with a
    deterministic equivalent: same logical content => same IRI. Parts are
    joined on a unit separator with an explicit null marker, so parts
    containing spaces — or absent parts — cannot collide ((\"a b\", \"c\")
    vs (\"a\", \"b c\"); (\"x\", NULL, \"y\") vs (\"x\", \"y\")).
    """
    cols = [F.lit(kind)] + [
        F.coalesce(F.col(p) if isinstance(p, str) else p, F.lit(MINT_NULL))
        for p in parts
    ]
    return F.concat(
        F.lit(MINT_PREFIX + kind + "/"), F.sha2(F.concat_ws(MINT_SEP, *cols), 256)
    )


def obo_iri_for_term_id(term_id: Column | str) -> Column:
    """'UBERON:0001062' -> 'http://purl.obolibrary.org/obo/UBERON_0001062'.

    Mirrors OBOUtil.iriForTermID (used from PhenexToOWL.scala:370).
    """
    c = F.col(term_id) if isinstance(term_id, str) else term_id
    return F.concat(F.lit(vocab.OBO_PREFIX), F.translate(c, ":", "_"))


def term_id_for_obo_iri(iri: Column | str) -> Column:
    c = F.col(iri) if isinstance(iri, str) else iri
    return F.translate(F.regexp_replace(c, "^" + vocab.OBO_PREFIX, ""), "_", ":")


def negation_class_iri(cls: Column | str) -> Column:
    """IRI of the named negation class for ``cls``.

    NegationClassGenerator.scala:20: 'http://phenoscape.org/not/' + class IRI.
    """
    c = F.col(cls) if isinstance(cls, str) else cls
    return F.concat(F.lit(vocab.NOT_PREFIX), c)


def restriction_class_iri(prop: Column | str, filler: Column | str) -> Column:
    """Named class for the restriction ``prop some filler``.

    NamedRestrictionGenerator.scala:33-43 mints a named class per
    (property, class) pair; we derive it as a content hash of the canonical
    serialization of the expression (ExpressionUtil.nameForExpression).
    """
    p = F.col(prop) if isinstance(prop, str) else prop
    f = F.col(filler) if isinstance(filler, str) else filler
    return F.concat(
        F.lit(vocab.EXPRESSION_PREFIX),
        F.sha2(F.concat_ws(" ", F.lit("ObjectSomeValuesFrom"), p, f), 256),
    )


def expression_iri(canonical: Column | str) -> Column:
    """Named class for an arbitrary class expression, from its canonical
    serialization string (PhenexToOWL.scala:358-365 names anonymous
    expressions via ExpressionUtil.nameForExpressionWithAxioms)."""
    c = F.col(canonical) if isinstance(canonical, str) else canonical
    return F.concat(F.lit(vocab.EXPRESSION_PREFIX), F.sha2(c, 256))


def absence_class_iri(entity: Column | str) -> Column:
    """Named 'absence of E' class.

    AbsenceClassGenerator.scala:15-18 composes it as
    ``NegationIRI(RestrictionIRI(implies_presence_of, E))``; we mirror that
    composition over our content-hash IRIs.
    """
    e = F.col(entity) if isinstance(entity, str) else entity
    return negation_class_iri(restriction_class_iri(F.lit(vocab.IMPLIES_PRESENCE_OF), e))
