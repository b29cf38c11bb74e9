"""TSV ingest converters (SURVEY.md S2): the reference's ZFIN/MGI/Xenbase/HP
line-split converters (PhenoscapeKB.scala:197-247, external
phenoscape-kb-ingest lib) as ``spark.read.csv`` pipelines.

Each converter takes the raw TSV DataFrame and emits the annotation shape
the profile layer consumes: (annotation, gene, phenotype_class) plus typed
triples. Parsing is schema-on-read CSV with explicit columns — no
line-splitting UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.functions import iri as iri_fn

GENE_PHENOTYPE_COLUMNS = ["gene_id", "gene_symbol", "phenotype_term_id", "pub_id"]


def read_gene_phenotype_tsv(spark: SparkSession, path: str) -> DataFrame:
    """ZFIN-style gene-phenotype TSV (no header, tab-separated)."""
    return (
        spark.read.option("sep", "\t")
        .csv(path)
        .toDF(*GENE_PHENOTYPE_COLUMNS)
    )


def gene_phenotype_annotations(raw: DataFrame, gene_prefix: str) -> DataFrame:
    """Rows -> (annotation, gene, phenotype_class): the AnnotatedPhenotype
    individuals of the reference (GeneProfiles BGP input, J6). Annotation
    IRIs are content hashes of the row identity — deterministic."""
    gene = F.concat(F.lit(gene_prefix), F.trim(F.col("gene_id")))
    phenotype = iri_fn.obo_iri_for_term_id(F.trim(F.col("phenotype_term_id")))
    ann = iri_fn.mint_iri("annotation", gene, phenotype, F.trim(F.col("pub_id")))
    return (
        raw.where(F.col("gene_id").isNotNull() & F.col("phenotype_term_id").isNotNull())
        .select(
            ann.alias("annotation"),
            gene.alias("gene"),
            phenotype.alias("phenotype_class"),
        )
        .dropDuplicates()
    )


def annotation_triples(annotations: DataFrame) -> DataFrame:
    """AnnotatedPhenotype typing + associated_with_gene + rdf:type class —
    the triple shape GeneProfiles queries back (GeneProfiles.scala:34-39)."""
    t1 = annotations.select(
        F.col("annotation").alias("subj"),
        F.lit(vocab.RDF_TYPE).alias("pred"),
        F.lit(vocab.ANNOTATED_PHENOTYPE).alias("obj"),
    )
    t2 = annotations.select(
        F.col("annotation").alias("subj"),
        F.lit(vocab.ASSOCIATED_WITH_GENE).alias("pred"),
        F.col("gene").alias("obj"),
    )
    t3 = annotations.select(
        F.col("annotation").alias("subj"),
        F.lit(vocab.RDF_TYPE).alias("pred"),
        F.col("phenotype_class").alias("obj"),
    )
    return t1.unionByName(t2).unionByName(t3).dropDuplicates()
