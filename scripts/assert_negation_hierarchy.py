"""Cluster driver mirroring NegationHierarchyAsserter.main
(NegationHierarchyAsserter.scala:16-25): load an OWL functional-syntax
ontology, compute the negation-hierarchy axioms, save them as a new
functional-syntax document.

    spark-submit --py-files /tmp/pipeline.zip \
        scripts/assert_negation_hierarchy.py input.ofn output.ofn
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession


def main() -> None:
    if len(sys.argv) != 3:
        raise SystemExit("usage: assert_negation_hierarchy.py <in.ofn> <out.ofn>")
    in_path, out_path = sys.argv[1], sys.argv[2]

    from phenoscape_owl_tools_spark.sources import ofn

    # honor spark-submit's master (run_kb_build.py:40-47 detection)
    from pyspark import SparkConf

    builder = SparkSession.builder.appName("negation-hierarchy")
    if not SparkConf().contains("spark.master"):
        builder = builder.master("local[*]")
    spark = builder.getOrCreate()

    axioms = ofn.read_ofn(spark, in_path)
    sub_ax, eq_ax = ofn.negation_hierarchy_axioms(axioms)
    rows = [("negation", "subclass_of", r["sub"], None, r["sup"])
            for r in sub_ax.collect()]
    rows += [("negation", "equivalent_classes", r["a"], None, r["b"])
             for r in eq_ax.collect()]
    Path(out_path).write_text(
        ofn.render_document(rows, ontology_iri="http://example.org/negation-axioms"),
        encoding="utf-8",
    )
    print(f"{len(rows)} negation axioms -> {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
