"""Deterministic KG derivation over the driver-provided testdata tables.

The driver's correctness gate (CORRECTNESS_r{N}.json) runs each engine query
against a DuckDB oracle over the same parquet — so every derivation here is
a pure, SQL-expressible function of the tables: no randomness, no Python
state. The flat ``documents(doc_id, text, ...)`` table becomes the engine's
interleaved-span input; its fixed 31-word vocabulary becomes an ontology
dictionary with a deterministic namespace rule and a depth-3 subclass DAG:

    term(word)  <  lenclass(namespace, len(word))  <  nsroot(namespace)  <  root

namespace rule: word < 'g' -> anatomy; word < 's' -> quality; else taxon.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TERM = "http://kg.example.org/term/"
LEN_CLASS = "http://kg.example.org/class/"
NS_ROOT = "http://kg.example.org/root/"
ROOT = "http://kg.example.org/root"
ABSENT_MARKER = "row"  # quality word that flags an absence assertion


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def doc_words(documents: DataFrame) -> DataFrame:
    """(doc_id, word) token relation — the mention ground truth both the
    engine and the SQL oracle can compute identically."""
    return documents.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.explode(F.split(F.col("text"), " ")).alias("word"),
    ).where(F.col("word") != "")


def namespace_of(word_col) -> F.Column:
    return (
        F.when(word_col < "g", F.lit("anatomy"))
        .when(word_col < "s", F.lit("quality"))
        .otherwise(F.lit("taxon"))
    )


def terms(documents: DataFrame) -> DataFrame:
    """(iri, label, namespace) dictionary derived from the corpus vocabulary."""
    w = doc_words(documents).select("word").dropDuplicates()
    return w.select(
        F.concat(F.lit(TERM), F.col("word")).alias("iri"),
        F.col("word").alias("label"),
        namespace_of(F.col("word")).alias("namespace"),
    )


def subclass_edges(documents: DataFrame) -> DataFrame:
    """Depth-3 DAG: term -> (ns,len) class -> ns root -> root."""
    w = doc_words(documents).select("word").dropDuplicates().select(
        "word",
        namespace_of(F.col("word")).alias("ns"),
        F.length("word").alias("len"),
    )
    t2l = w.select(
        F.concat(F.lit(TERM), F.col("word")).alias("sub"),
        F.concat(F.lit(LEN_CLASS), F.col("ns"), F.lit("/"), F.col("len")).alias("sup"),
    )
    l2n = w.select(
        F.concat(F.lit(LEN_CLASS), F.col("ns"), F.lit("/"), F.col("len")).alias("sub"),
        F.concat(F.lit(NS_ROOT), F.col("ns")).alias("sup"),
    ).dropDuplicates()
    n2r = w.select(
        F.concat(F.lit(NS_ROOT), F.col("ns")).alias("sub"), F.lit(ROOT).alias("sup")
    ).dropDuplicates()
    return t2l.unionByName(l2n).unionByName(n2r)


def equiv_edges(documents: DataFrame) -> DataFrame:
    """Chain equivalences: consecutive words (alphabetical) within one
    (namespace, length) group — connected components therefore equal the
    (namespace, length) groups, giving the SQL oracle a closed form."""
    from pyspark.sql.window import Window

    w = doc_words(documents).select("word").dropDuplicates().select(
        "word",
        namespace_of(F.col("word")).alias("ns"),
        F.length("word").alias("len"),
    )
    win = Window.partitionBy("ns", "len").orderBy("word")
    nxt = w.withColumn("next_word", F.lead("word").over(win))
    return nxt.where(F.col("next_word").isNotNull()).select(
        F.concat(F.lit(TERM), F.col("word")).alias("a"),
        F.concat(F.lit(TERM), F.col("next_word")).alias("b"),
    )


def span_documents(documents: DataFrame) -> DataFrame:
    from phenoscape_owl_tools_spark.sources.documents import adapt_flat_documents

    return adapt_flat_documents(documents)


def gene_annotations(orders: DataFrame) -> DataFrame:
    """orders -> (annotation, gene, phenotype_class): customer plays the
    gene, order priority the phenotype class."""
    return orders.select(
        F.concat(F.lit("http://kg.example.org/ann/"), F.col("o_orderkey").cast("string")).alias("annotation"),
        F.concat(F.lit("http://kg.example.org/gene/"), F.col("o_custkey").cast("string")).alias("gene"),
        F.concat(F.lit("http://kg.example.org/ph/"), F.col("o_orderpriority")).alias("phenotype_class"),
    )
