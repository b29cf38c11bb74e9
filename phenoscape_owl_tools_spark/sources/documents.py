"""Document sources: the engine's canonical input is an Iceberg/parquet
table of interleaved text+media documents (BASELINE.json input_hint):

    documents(doc_id STRING,
              spans ARRAY<STRUCT<kind STRING, text STRING,
                                 media_ref STRING, offset INT>>)

``read_span_documents`` reads that shape directly. ``adapt_flat_documents``
deterministically lifts a flat text table (like the driver-provided
/root/testdata documents: doc_id, text, lang, source, n_chars) into the span
shape — a pure projection, so the span-sequence invariant is trivially the
identity of the construction. Docs from 'src2' get a leading media span
(mirroring the reference's image-depiction ingest,
PhenoteImageDepictionsToOWL.scala:31-61).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPAN_SCHEMA = (
    "array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def read_span_documents(spark, path: str) -> DataFrame:
    return spark.read.parquet(path)


def adapt_flat_documents(flat: DataFrame) -> DataFrame:
    """(doc_id, text, lang, source, n_chars) -> span documents.

    Deterministic: media spans derive from the source column; no randomness.
    """
    text_span = F.struct(
        F.lit("text").alias("kind"),
        F.col("text").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
        F.lit(0).alias("offset"),
    )
    media_doc = F.array(
        F.struct(
            F.lit("media").alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.concat(F.lit("http://media.example.org/"), F.col("doc_id").cast("string"), F.lit(".bin")).alias("media_ref"),
            F.lit(0).alias("offset"),
        ),
        F.struct(
            F.lit("text").alias("kind"),
            F.col("text").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            F.lit(1).alias("offset"),
        ),
    )
    return flat.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.when(F.col("source") == "src2", media_doc)
        .otherwise(F.array(text_span))
        .alias("spans"),
    )


def media_spans(documents: DataFrame) -> DataFrame:
    """All media spans with their in-doc position (S5 ingest shape)."""
    from phenoscape_owl_tools_spark.operators.mention import explode_text_spans

    return explode_text_spans(documents).where(F.col("kind") == "media")
