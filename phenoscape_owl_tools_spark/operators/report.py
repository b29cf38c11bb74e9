"""Reporting operators (SURVEY.md A7, S10): annotation-status counts with
completeness buckets, and the flat TSV report sink.

Mirrors report/AnnotationStatus.scala:23-65 (grouped counts with ``when``
buckets) and report/AnnotationReport.scala:73-135 (TSV export). Pure
DataFrame aggregation / sink — one shuffle on the bucket key.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def annotation_status(annotations: DataFrame) -> DataFrame:
    """Counts of EQ annotations by completeness bucket.

    ``annotations(doc_id, entity, quality, related_entity)`` (nullable IRI
    columns, the P7 input shape). Buckets follow the reference's
    completeness criteria: full EQ+RE > EQ > entity-only > quality-only.
    """
    bucket = (
        F.when(F.col("entity").isNotNull() & F.col("quality").isNotNull()
               & F.col("related_entity").isNotNull(), F.lit("full_eq_re"))
        .when(F.col("entity").isNotNull() & F.col("quality").isNotNull(), F.lit("eq"))
        .when(F.col("entity").isNotNull(), F.lit("entity_only"))
        .when(F.col("quality").isNotNull(), F.lit("quality_only"))
        .otherwise(F.lit("empty"))
    )
    return (
        annotations.withColumn("bucket", bucket)
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n_annotations"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
    )


def write_tsv_report(df: DataFrame, path: str | Path, coalesce: int = 1) -> None:
    """S10 — flat TSV report sink (AnnotationReport.scala TSV output).

    ``coalesce=1`` for a single human-readable file locally; leave higher
    for distributed writes at scale.
    """
    (
        df.coalesce(coalesce)
        .write.mode("overwrite")
        .option("sep", "\t")
        .option("header", True)
        .csv(str(path))
    )
