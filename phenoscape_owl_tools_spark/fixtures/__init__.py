from phenoscape_owl_tools_spark.fixtures.generator import (  # noqa: F401
    FixtureCorpus,
    generate_corpus,
    write_corpus,
)
