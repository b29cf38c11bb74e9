"""Cluster driver for the KB build: the ``spark-submit --py-files`` entry
the north rule specifies.

Usage (local or on a cluster — the code is identical, only the master and
executor topology change):

    cd /root/repo && zip -qr /tmp/pipeline.zip phenoscape_owl_tools_spark
    spark-submit --py-files /tmp/pipeline.zip \
        [--master spark://... | local[8]] \
        scripts/run_kb_build.py --sf-dir /root/testdata/sf0.01 \
        --out /tmp/kb_out [--no-resume]

Reads the driver testdata tables, derives the ontology dictionary + document
span inputs (sources/tpch_kg.py), runs the staged KB build with lineage
manifests (plans/kb_build.py), and prints one JSON metrics line. Re-running
with the same inputs and --out skips valid stages (resume).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=None)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--n-buckets", type=int, default=16)
    args = ap.parse_args()

    # Under spark-submit, spark.master comes from the submit conf and MUST
    # NOT be overridden (get_spark would force local[N] and silently run the
    # whole build on the driver host). Detect submit by the presence of
    # spark.master in the ambient conf; standalone runs fall back to the
    # engine defaults.
    from pyspark import SparkConf

    if SparkConf().contains("spark.master"):
        spark = SparkSession.builder.appName("kb-build").getOrCreate()
        # engine-critical SQL confs (runtime-settable; cluster topology and
        # memory stay whatever spark-submit configured)
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    else:
        from phenoscape_owl_tools_spark.session import get_spark

        spark = get_spark("kb-build")

    from phenoscape_owl_tools_spark.plans import kb_build
    from phenoscape_owl_tools_spark.sources import tpch_kg as KG

    flat = KG.load(spark, args.sf_dir, "documents")
    orders = KG.load(spark, args.sf_dir, "orders")
    part = KG.load(spark, args.sf_dir, "part")
    terms = KG.terms(flat)
    inputs = kb_build.KBInputs(
        documents=KG.span_documents(flat),
        terms=terms,
        synonyms=terms.limit(0).select(
            F.col("iri"), F.col("label").alias("synonym")
        ),
        subclass_edges=KG.subclass_edges(flat),
        equiv_edges=KG.equiv_edges(flat),
        restrictions=None,
        gene_annotations=KG.gene_annotations(orders),
        homology=part.select(
            F.concat(F.lit("http://kg.example.org/part/"), F.col("p_partkey").cast("string")).alias("structure1"),
            F.lit("http://kg.example.org/taxon/1").alias("taxon1"),
            F.when(F.col("p_partkey") % 3 == 0, "not hom to")
            .when(F.col("p_partkey") % 3 == 1, "hom to")
            .otherwise("ser hom to").alias("relation"),
            F.concat(F.lit("http://kg.example.org/part/"), (F.col("p_partkey") + 1).cast("string")).alias("structure2"),
            F.lit("http://kg.example.org/taxon/2").alias("taxon2"),
            F.lit(None).cast("string").alias("evidence_code"),
            F.concat(F.lit("PMID:"), F.col("p_partkey").cast("string")).alias("publication"),
        ),
        taxonomy_edges=None,
        state_phenotypes=None,
    )

    t0 = time.perf_counter()
    res = kb_build.run(
        spark, inputs, out_dir=args.out, resume=not args.no_resume,
        n_buckets=args.n_buckets,
    )
    n = res.triples.count()
    dt = time.perf_counter() - t0
    print(json.dumps({
        "triples": n,
        "sec": round(dt, 3),
        "triples_per_sec": round(n / dt, 1),
        "stages": sorted(res.stages.keys()),
        "resumed_stages": sorted(
            k for k, m in res.manifests.items() if m.get("resumed")
        ),
    }))


if __name__ == "__main__":
    main()
