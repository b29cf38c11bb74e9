from phenoscape_owl_tools_spark.functions.iri import (  # noqa: F401
    absence_class_iri,
    expression_iri,
    mint_iri,
    negation_class_iri,
    obo_iri_for_term_id,
    restriction_class_iri,
    term_id_for_obo_iri,
)
