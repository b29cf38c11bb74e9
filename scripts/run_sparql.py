"""Cluster driver for SPARQL files over a triple table — the engine's
analog of the reference's RunSPARQLQuery / RunSPARQLConstruct /
RunSPARQLUpdate build tools (build/RunSPARQLQuery.scala:1-30 etc.), which
its pipeline invokes per .rq/.ru file against the triple store.

    spark-submit --py-files /tmp/pipeline.zip scripts/run_sparql.py \
        --triples /path/to/triples.parquet --query q.rq [--out outdir]

SELECT prints rows as TSV (or writes parquet with --out); CONSTRUCT writes
a (subj, pred, obj) parquet (or prints); update statements write the
updated graph to --out (required) — DataFrames are immutable, so the
"store" is replaced by writing a new snapshot, the same contract as the
streaming closure driver's pointer swap.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--triples", required=True, help="parquet dir with subj/pred/obj")
    ap.add_argument("--query", required=True, help=".rq/.ru file")
    ap.add_argument("--out", default=None, help="output parquet dir")
    args = ap.parse_args()

    from phenoscape_owl_tools_spark import sparql

    # honor spark-submit's master (run_kb_build.py:40-47 detection)
    from pyspark import SparkConf

    builder = SparkSession.builder.appName("run-sparql")
    if not SparkConf().contains("spark.master"):
        builder = builder.master("local[*]")
    spark = builder.getOrCreate()

    triples = spark.read.parquet(args.triples)
    text = Path(args.query).read_text(encoding="utf-8")
    parsed = sparql.parse(text)
    if parsed.form == "update":
        if not args.out:
            ap.error("update statements require --out (the new graph snapshot)")
        out = sparql.update(triples, parsed)
        out.write.mode("overwrite").parquet(args.out)
        print(f"updated graph: {out.count()} triples -> {args.out}")
    else:
        out = sparql.evaluate(triples, parsed)
        if args.out:
            out.write.mode("overwrite").parquet(args.out)
            print(f"{out.count()} rows -> {args.out}")
        else:
            for row in out.collect():
                print("\t".join("" if v is None else str(v) for v in row))
    spark.stop()


if __name__ == "__main__":
    main()
