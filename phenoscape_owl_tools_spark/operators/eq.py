"""EQ phenotype composition (SURVEY.md P7/P8) — the 9-case class-expression
builder of PhenexToOWL.instantiateClassAssertion (PhenexToOWL.scala:324-356),
as a ``when``-chain over linked-mention columns.

Input: one row per phenotype annotation with nullable (entity, quality,
related_entity) IRIs. Output per row: the composed expression's canonical
serialization, its deterministic named-class IRI (P8, ExpressionUtil
.nameForExpressionWithAxioms), and annotation triples (entity_term /
quality_term / related_entity_term, :296-317).

Case table (entity E, quality Q, related entity RE):

  (None, None, _)            -> no phenotype
  (E, None, None/Some)       -> has_part some (Present and inheres_in some E)
  (E, Absent, None)          -> absence: has_part some (LacksAllPartsOfType
                                 and inheres_in some organism and towards E)
                                 and phenotype_of some E
  (E, LacksAllParts, RE)     -> lacks-all-parts variant towards RE
  (None, Q, None)            -> has_part some Q
  (None, Q, RE)              -> has_part some (Q and towards some RE)
  (E, Q, None)               -> has_part some (Q and inheres_in some E)
  (E, Q, RE)                 -> has_part some (Q and inheres_in some E and
                                 towards some RE)

All columns stay JVM-side (concat/when) — no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.functions import iri as iri_fn

PRESENT = vocab.OBO_PREFIX + "PATO_0000467"
MULTICELLULAR_ORGANISM = vocab.OBO_PREFIX + "UBERON_0000468"


def _canon(*parts) -> F.Column:
    return F.concat_ws(" ", *parts)


def compose_eq_phenotypes(annotations: DataFrame) -> DataFrame:
    """annotations(entity, quality, related_entity, ...) ->
    + (canonical_expr, phenotype_cls) columns; rows with no expression
    (entity and quality both null) are dropped, mirroring the None case."""
    E, Q, RE = F.col("entity"), F.col("quality"), F.col("related_entity")
    has_part, inheres_in, towards = (
        F.lit(vocab.HAS_PART), F.lit(vocab.INHERES_IN), F.lit(vocab.TOWARDS))

    present_case = _canon(
        F.lit("has_part some ("), F.lit(PRESENT), F.lit("and inheres_in some"), E, F.lit(")"))
    absent_case = _canon(
        F.lit("has_part some ("), F.lit(vocab.LACKS_ALL_PARTS_OF_TYPE),
        F.lit("and inheres_in some"), F.lit(MULTICELLULAR_ORGANISM),
        F.lit("and towards value"), E, F.lit(") and phenotype_of some"), E)
    lacks_case = _canon(
        F.lit("has_part some ("), F.lit(vocab.LACKS_ALL_PARTS_OF_TYPE),
        F.lit("and inheres_in some"), E, F.lit("and towards value"), RE,
        F.lit(") and phenotype_of some"), RE)
    q_only = _canon(F.lit("has_part some"), Q)
    q_re = _canon(F.lit("has_part some ("), Q, F.lit("and towards some"), RE, F.lit(")"))
    e_q = _canon(F.lit("has_part some ("), Q, F.lit("and inheres_in some"), E, F.lit(")"))
    e_q_re = _canon(
        F.lit("has_part some ("), Q, F.lit("and inheres_in some"), E,
        F.lit("and towards some"), RE, F.lit(")"))

    expr = (
        F.when(E.isNull() & Q.isNull(), F.lit(None))
        .when(E.isNotNull() & Q.isNull(), present_case)           # covers RE present too (warn case)
        .when(E.isNotNull() & (Q == vocab.ABSENT) & RE.isNull(), absent_case)
        .when(E.isNotNull() & (Q == vocab.LACKS_ALL_PARTS_OF_TYPE) & RE.isNotNull(), lacks_case)
        .when(E.isNull() & Q.isNotNull() & RE.isNull(), q_only)
        .when(E.isNull() & Q.isNotNull() & RE.isNotNull(), q_re)
        .when(E.isNotNull() & Q.isNotNull() & RE.isNull(), e_q)
        .otherwise(e_q_re)
    )
    out = annotations.withColumn("canonical_expr", expr).where(
        F.col("canonical_expr").isNotNull()
    )
    return out.withColumn("phenotype_cls", iri_fn.expression_iri(F.col("canonical_expr")))


def eq_annotation_triples(composed: DataFrame) -> DataFrame:
    """entity_term / quality_term / related_entity_term annotations on the
    named phenotype class (PhenexToOWL.scala:296-322)."""
    vocab_ns = vocab.PHENOSCAPE_VOCAB

    def ann(col: str, pred: str) -> DataFrame:
        return composed.where(F.col(col).isNotNull()).select(
            F.col("phenotype_cls").alias("subj"),
            F.lit(vocab_ns + pred).alias("pred"),
            F.col(col).alias("obj"),
        )

    return (
        ann("entity", "entity_term")
        .unionByName(ann("quality", "quality_term"))
        .unionByName(ann("related_entity", "related_entity_term"))
        .dropDuplicates()
    )


def eq_structure_edges(composed: DataFrame) -> DataFrame:
    """Subclass/restriction edges that make composed EQ classes participate
    in the closure: phenotype_cls SubClassOf (has_part some Q) and
    (phenotype_of some E) analogs — the joinable EL skeleton of the
    expression (what ELK would extract from the definition axiom)."""
    hp_q = composed.where(F.col("quality").isNotNull()).select(
        F.col("phenotype_cls").alias("sub"),
        iri_fn.restriction_class_iri(F.lit(vocab.HAS_PART), F.col("quality")).alias("sup"),
    )
    phen_e = composed.where(F.col("entity").isNotNull()).select(
        F.col("phenotype_cls").alias("sub"),
        iri_fn.restriction_class_iri(F.lit(vocab.PHENOTYPE_OF), F.col("entity")).alias("sup"),
    )
    return hp_q.unionByName(phen_e).dropDuplicates()


def eq_grid(entities: DataFrame, qualities: DataFrame) -> DataFrame:
    """J11 — entity x quality cross product of composed EQ classes
    (MatrixGenerator.scala:50-57, EQCharactersGenerator.scala:18-25,
    EQCreator.scala:42-45). Bounded dimension tables -> plain crossJoin;
    the reference needs 200 GB for this in-memory (EQCreator.scala:16),
    here it is a streamed cartesian projection."""
    e = entities.select(F.col("iri").alias("entity")).dropDuplicates()
    q = qualities.select(F.col("iri").alias("quality")).dropDuplicates()
    composed = e.crossJoin(q).withColumn(
        "canonical_expr",
        _canon(
            F.lit("has_part some ("), F.col("quality"),
            F.lit("and inheres_in some"), F.col("entity"), F.lit(")"),
        ),
    )
    return composed.withColumn(
        "phenotype_cls", iri_fn.expression_iri(F.col("canonical_expr"))
    )


def surviving_subsumers(grid: DataFrame, cooccurrence: DataFrame) -> DataFrame:
    """J12 — generate-and-test (SubsumerGenerator.scala:44-74): keep proposed
    EQ classes with at least one instance — here, (entity, quality) pairs
    attested by document co-occurrence. The test is one left-semi join per
    generation round (the reference's getSubClasses probe)."""
    return grid.join(cooccurrence, on=["entity", "quality"], how="leftsemi")
