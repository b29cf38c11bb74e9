"""Vocabulary IRIs used across the engine.

Mirrors the reference's ``Vocab.scala`` (src/main/scala/org/phenoscape/owl/
Vocab.scala:9-110) — only the subset exercised by the pipeline. All values
are plain strings; IRIs are data, never objects.
"""

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
RDFS_SUBCLASS_OF = "http://www.w3.org/2000/01/rdf-schema#subClassOf"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDFS_IS_DEFINED_BY = "http://www.w3.org/2000/01/rdf-schema#isDefinedBy"
OWL_EQUIVALENT_CLASS = "http://www.w3.org/2002/07/owl#equivalentClass"
OWL_THING = "http://www.w3.org/2002/07/owl#Thing"
OWL_NOTHING = "http://www.w3.org/2002/07/owl#Nothing"

OBO_PREFIX = "http://purl.obolibrary.org/obo/"
PHENOSCAPE_VOCAB = "http://purl.org/phenoscape/vocab.owl#"

# object / annotation properties (Vocab.scala:18-106)
HAS_PART = OBO_PREFIX + "BFO_0000051"
PART_OF = OBO_PREFIX + "BFO_0000050"
INHERES_IN = OBO_PREFIX + "RO_0000052"
INHERES_IN_PART_OF = OBO_PREFIX + "RO_0002314"
DEVELOPS_FROM = OBO_PREFIX + "RO_0002202"
TOWARDS = OBO_PREFIX + "RO_0002503"
IN_TAXON = OBO_PREFIX + "RO_0002162"
HOMOLOGOUS_TO = OBO_PREFIX + "RO_0002158"
SERIALLY_HOMOLOGOUS_TO = OBO_PREFIX + "RO_0002159"
HAS_EVIDENCE = OBO_PREFIX + "RO_0002558"

NEGATES = PHENOSCAPE_VOCAB + "negation_of_class"
ABSENCE_OF = PHENOSCAPE_VOCAB + "absence_of"
IMPLIES_PRESENCE_OF = PHENOSCAPE_VOCAB + "implies_presence_of"
EXHIBITS_STATE = PHENOSCAPE_VOCAB + "exhibits_state"
DESCRIBES_PHENOTYPE = PHENOSCAPE_VOCAB + "describes_phenotype"
MAY_HAVE_STATE_VALUE = PHENOSCAPE_VOCAB + "may_have_state_value"
HAS_PRESENCE_OF = PHENOSCAPE_VOCAB + "has_presence_of"
HAS_ABSENCE_OF = PHENOSCAPE_VOCAB + "has_absence_of"
HAS_PHENOTYPIC_PROFILE = PHENOSCAPE_VOCAB + "has_phenotypic_profile"
PHENOTYPE_OF = PHENOSCAPE_VOCAB + "phenotype_of"
PHENOTYPE_OF_PART_OF = PHENOSCAPE_VOCAB + "phenotype_of_reflexive_part_of"
HAS_PART_INHERING_IN = PHENOSCAPE_VOCAB + "has_part_inhering_in"
ASSOCIATED_WITH_GENE = PHENOSCAPE_VOCAB + "associated_with_gene"
ASSOCIATED_WITH_TAXON = PHENOSCAPE_VOCAB + "associated_with_taxon"
ANNOTATED_PHENOTYPE = PHENOSCAPE_VOCAB + "AnnotatedPhenotype"
SUBCLADE_OF = PHENOSCAPE_VOCAB + "subclade_of"
COMBINED_SCORE = PHENOSCAPE_VOCAB + "combined_score"
HAS_IC = PHENOSCAPE_VOCAB + "has_ic"
HAS_SUBSUMER = PHENOSCAPE_VOCAB + "has_subsumer"
FOR_QUERY_PROFILE = PHENOSCAPE_VOCAB + "for_query_profile"
FOR_CORPUS_PROFILE = PHENOSCAPE_VOCAB + "for_corpus_profile"
FOUND_AS_MICA = PHENOSCAPE_VOCAB + "FoundAsMICA"
MENTIONS = PHENOSCAPE_VOCAB + "mentions"

DEPICTS = "http://xmlns.com/foaf/0.1/depicts"
IMAGE = "http://xmlns.com/foaf/0.1/Image"
TAXON = "http://rs.tdwg.org/dwc/terms/Taxon"

ANATOMICAL_ENTITY = OBO_PREFIX + "UBERON_0001062"
QUALITY = OBO_PREFIX + "PATO_0000001"
ABSENT = OBO_PREFIX + "PATO_0000462"
LACKS_ALL_PARTS_OF_TYPE = OBO_PREFIX + "PATO_0002000"
CHORDATA = OBO_PREFIX + "VTO_0000001"

NOT_PREFIX = "http://phenoscape.org/not/"  # NegationClassGenerator.scala:20
EXPRESSION_PREFIX = "http://purl.org/phenoscape/expression?value="  # ExpressionsUtil.scala

# Property-normalization map: legacy property IRI -> canonical
# (PropertyNormalizer.scala:11-75 — a ~35-entry static map; representative
# subset with the same canonical targets).
PROPERTY_NORMALIZATION = {
    "http://purl.obolibrary.org/obo/uberon/core#part_of": PART_OF,
    "http://purl.obolibrary.org/obo/uberon#part_of": PART_OF,
    "http://purl.obolibrary.org/obo/zfa#part_of": PART_OF,
    "http://purl.obolibrary.org/obo/emapa#part_of": PART_OF,
    "http://purl.obolibrary.org/obo/uberon/core#has_part": HAS_PART,
    "http://purl.obolibrary.org/obo/uberon/core#develops_from": DEVELOPS_FROM,
    "http://purl.obolibrary.org/obo/zfa#develops_from": DEVELOPS_FROM,
    "http://purl.obolibrary.org/obo/uberon/core#in_taxon": IN_TAXON,
    "http://purl.obolibrary.org/obo/core#connected_to": OBO_PREFIX + "core#connected_to",
}
