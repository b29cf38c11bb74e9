"""Unified command dispatcher — the engine's analog of the reference's
``Command.scala`` (build/Command.scala:6-56), exposing the SAME command
names so a user of the reference can switch driver invocations 1:1:

    spark-submit --py-files /tmp/pipeline.zip scripts/phenoscape_tools.py \
        <command> [args...]

Commands (parquet in / parquet or text out; see each function):

    build-kb                     staged KB build (delegates run_kb_build)
    pairwise-sim                 profile x profile OWLsim scores
    load-triples                 bulk triple load -> bucketed store table
    output-ics                   information-content per class -> TSV
    output-profile-sizes         taxon/gene profile sizes -> TSV
    expects-to-triples           expect-score regression -> score triples
    sparql-select|sparql-construct|sparql-update   (delegates run_sparql)
    convert-nexml                NeXML docs -> cell-subgraph triples
    assert-negation-hierarchy    .ofn -> negation axioms .ofn
    output-evolutionary-profiles taxonomy+associations -> profile triples
    homology-table-to-owl MODEL  homology parquet/TSV -> triples parquet
                                 (MODEL: rea|ava|rolification|ancestral|
                                  simple|annotations)
    convert-ontology             ontology file(s) -> normalized axiom frame
                                 (in: .ofn/.ttl/.nt/.owl RDF-XML or a
                                  directory of them; out: parquet dir, or
                                  .ofn/.ttl to re-serialize) — the engine's
                                 analog of the reference's OWLAPI
                                 multi-format load
                                 (KnowledgeBaseBuilder.scala:56-68)
    build-corpus                 composed training-corpus pipeline
                                 (quality/repetition gates, exact +
                                  LSH-cluster dedup, semantic dedup,
                                  decontamination, token-budget sample,
                                  sequence packing) with stage
                                 manifests + resume (engine extension)

The reference's Blazegraph-specific ``load-triples`` (DataLoader) maps to
the engine's bucketed-table store (catalog.write_table) — the documented
engine substitution (SURVEY.md §2.1 S7/S8).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession


def _spark(name: str) -> SparkSession:
    # Under spark-submit, spark.master arrives via the submit conf and must
    # not be overridden (same detection as run_kb_build.py:40-47 — a
    # "--master" flag never reaches app args, so checking sys.argv is
    # useless and would silently force local mode on a cluster).
    from pyspark import SparkConf

    builder = SparkSession.builder.appName(name)
    if not SparkConf().contains("spark.master"):
        builder = builder.master("local[*]")
    return builder.getOrCreate()


def _read(spark, path: str):
    return spark.read.parquet(path)


def cmd_pairwise_sim(args: list[str]) -> None:
    """pairwise-sim <query_profiles> <corpus_profiles> <closure> <out>
    profiles: (individual, phenotype); closure: (sub, sup)."""
    from phenoscape_owl_tools_spark.operators import similarity as S

    qp, cp, cl, out = args
    spark = _spark("pairwise-sim")
    queries, corpus, closure = _read(spark, qp), _read(spark, cp), _read(spark, cl)
    ic = S.information_content(
        S.indirect_associations(corpus, closure),
        corpus.select("individual"),
        closure,
    )
    scores = S.groupwise_median(S.pairwise_scores(queries, corpus, closure, ic))
    scores.write.mode("overwrite").parquet(out)
    print(f"pairwise-sim: {scores.count()} pairs -> {out}")
    spark.stop()


def cmd_load_triples(args: list[str]) -> None:
    """load-triples <triples_parquet> <store_dir> [n_buckets]"""
    from phenoscape_owl_tools_spark import catalog

    src, store = args[0], args[1]
    n_buckets = int(args[2]) if len(args) > 2 else 16
    spark = _spark("load-triples")
    triples = _read(spark, src)
    catalog.write_table(
        triples, Path(store) / "triples", bucket_col="subj", n_buckets=n_buckets
    )
    print(f"load-triples: {triples.count()} triples -> {store}/triples")
    spark.stop()


def cmd_output_ics(args: list[str]) -> None:
    """output-ics <profiles> <closure> <out_tsv>  (ComputeICs.scala)"""
    from phenoscape_owl_tools_spark.operators import report
    from phenoscape_owl_tools_spark.operators import similarity as S

    pp, cl, out = args
    spark = _spark("output-ics")
    profiles, closure = _read(spark, pp), _read(spark, cl)
    ic = S.information_content(
        S.indirect_associations(profiles, closure),
        profiles.select("individual"),
        closure,
    )
    report.write_tsv_report(ic.orderBy("node"), out)
    print(f"output-ics: {ic.count()} rows -> {out}")
    spark.stop()


def cmd_output_profile_sizes(args: list[str]) -> None:
    """output-profile-sizes <profile_triples> <out_tsv>
    (PrintTaxonAndGeneProfileSizes.scala)"""
    from phenoscape_owl_tools_spark.operators import profiles as P
    from phenoscape_owl_tools_spark.operators import report

    src, out = args
    spark = _spark("profile-sizes")
    sizes = P.profile_sizes(_read(spark, src))
    report.write_tsv_report(sizes.orderBy("profile"), out)
    print(f"output-profile-sizes: {sizes.count()} rows -> {out}")
    spark.stop()


def cmd_expects_to_triples(args: list[str]) -> None:
    """expects-to-triples <pair_scores> <out>  (ConvertScoresToTriples +
    the expect-score regression, A8)."""
    from phenoscape_owl_tools_spark.operators import regression
    from phenoscape_owl_tools_spark.operators import similarity as S

    src, out = args
    spark = _spark("expects-to-triples")
    expected = regression.expect_scores(_read(spark, src))
    triples = S.score_triples(expected.withColumnRenamed("expect", "score"))
    triples.write.mode("overwrite").parquet(out)
    print(f"expects-to-triples: {triples.count()} triples -> {out}")
    spark.stop()


def cmd_convert_nexml(args: list[str]) -> None:
    """convert-nexml <nexml_docs_parquet(doc_id,xml)> <out_triples>"""
    from phenoscape_owl_tools_spark.sources import nexml

    src, out = args
    spark = _spark("convert-nexml")
    triples = nexml.nexml_triples(nexml.parse_nexml(_read(spark, src)))
    triples.write.mode("overwrite").parquet(out)
    print(f"convert-nexml: {triples.count()} triples -> {out}")
    spark.stop()


def cmd_output_evolutionary_profiles(args: list[str]) -> None:
    """output-evolutionary-profiles <taxonomy(child,parent)>
    <associations(taxon,character,state)> <state_phenotypes(state,phenotype)>
    <out>  (EvolutionaryProfiles.scala)"""
    from phenoscape_owl_tools_spark.operators import profiles as P

    tax, assoc, sp, out = args
    spark = _spark("evolutionary-profiles")
    _, prof = P.evolutionary_profiles(_read(spark, tax), _read(spark, assoc))
    triples = P.profile_triples(prof, _read(spark, sp))
    triples.write.mode("overwrite").parquet(out)
    print(f"output-evolutionary-profiles: {triples.count()} triples -> {out}")
    spark.stop()


def cmd_homology_table_to_owl(args: list[str]) -> None:
    """homology-table-to-owl <model> <homology_parquet> <out_triples>
    model: rea|ava|rolification|ancestral|simple|annotations
    (Command.scala:24-29 dispatches rea/ava/rolification; the engine adds
    the reference's other three converters under the same entry)."""
    from phenoscape_owl_tools_spark.operators import homology as H

    model, src, out = args[0].lower(), args[1], args[2]
    fn = {
        "rea": H.homology_axioms,
        "ava": H.homology_axioms_vahm,
        "rolification": H.homology_axioms_rolification,
        "ancestral": H.homology_axioms_ancestral,
        "simple": H.homology_axioms_simple,
        "annotations": H.homology_axioms_annotations,
    }.get(model)
    if fn is None:
        raise SystemExit(f"unknown homology model {model!r}")
    spark = _spark("homology-table-to-owl")
    triples = fn(_read(spark, src))
    triples.write.mode("overwrite").parquet(out)
    print(f"homology-table-to-owl[{model}]: {triples.count()} triples -> {out}")
    spark.stop()


def cmd_convert_ontology(args: list[str]) -> None:
    """convert-ontology <in:.ofn|.ttl|.nt|dir> <out:parquet-dir|.ofn|.ttl|.owl>

    Any supported serialization in, normalized axiom frame
    (src, kind, s, p, o) out; `.ofn`/`.ttl`/`.owl` outputs re-serialize
    (TBox-scale driver write), anything else writes parquet (distributed)."""
    from phenoscape_owl_tools_spark.sources import ofn, rdfxml, ttl

    src, out = args
    spark = _spark("convert-ontology")
    p = Path(src)
    exts = {q.suffix for q in p.glob("*")} if p.is_dir() else {p.suffix}
    if exts & {".nt", ".ntriples"}:
        axioms = ttl.axioms_from_triples(ttl.read_ntriples(spark, src), src=src)
    elif exts & {".ttl", ".turtle"}:
        axioms = ttl.read_turtle(spark, src)
    elif exts & {".owl", ".rdf", ".xml"}:
        axioms = rdfxml.read_rdfxml(spark, src)
    else:
        axioms = ofn.read_ofn(spark, src)
    if out.endswith(".ofn"):
        ofn.write_ofn(axioms, out)
        n = "document"
    elif out.endswith(".ttl"):
        ttl.write_turtle(axioms, out)
        n = "document"
    elif out.endswith((".owl", ".rdf")):
        rdfxml.write_rdfxml(axioms, out)
        n = "document"
    else:
        axioms.write.mode("overwrite").parquet(out)
        n = f"{spark.read.parquet(out).count()} axiom rows"
    print(f"convert-ontology: {src} -> {n} at {out}")
    spark.stop()


def cmd_build_corpus(args: list[str]) -> None:
    """build-corpus <documents.parquet> <out-dir> [budget_tokens] [benchmark.parquet] [embeddings.parquet] [seq_len]

    Composed training-corpus pipeline (plans/corpus_build.py): quality +
    repetition gates -> exact dedup -> LSH cluster collapse -> optional
    SemDeDup over doc embeddings -> optional decontamination -> optional
    per-language token-budget sample -> optional sequence packing. Pass
    '-' to skip an optional positional. Stages persist under <out-dir>
    with lineage manifests; re-runs resume. The final corpus lands at
    <out-dir>/corpus; the stage funnel prints."""
    from phenoscape_owl_tools_spark.plans import corpus_build

    doc_path, out = args[0], args[1]
    budget = int(args[2]) if len(args) > 2 and args[2] != "-" else None
    spark = _spark("build-corpus")
    docs = _read(spark, doc_path)
    bench = _read(spark, args[3]) if len(args) > 3 and args[3] != "-" else None
    emb = _read(spark, args[4]) if len(args) > 4 and args[4] != "-" else None
    seq_len = int(args[5]) if len(args) > 5 and args[5] != "-" else None
    cfg = corpus_build.CorpusConfig(budget_tokens=budget, seq_len=seq_len)
    res = corpus_build.run(
        spark, docs, benchmark=bench, embeddings=emb, out_dir=out, config=cfg
    )
    res.corpus.write.mode("overwrite").parquet(str(Path(out) / "corpus"))
    n = spark.read.parquet(str(Path(out) / "corpus")).count()
    print(f"build-corpus: funnel {res.funnel()} -> {n} docs at {out}/corpus")
    spark.stop()


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(1)
    command, rest = sys.argv[1], sys.argv[2:]
    delegated = {
        "build-kb": "run_kb_build.py",
        "sparql-select": "run_sparql.py",
        "sparql-construct": "run_sparql.py",
        "sparql-update": "run_sparql.py",
        "assert-negation-hierarchy": "assert_negation_hierarchy.py",
    }
    if command in delegated:
        import importlib.util

        mod_path = Path(__file__).resolve().parent / delegated[command]
        spec = importlib.util.spec_from_file_location("delegated_tool", mod_path)
        mod = importlib.util.module_from_spec(spec)
        sys.argv = [sys.argv[0]] + rest
        spec.loader.exec_module(mod)
        mod.main()
        return
    dispatch = {
        "pairwise-sim": cmd_pairwise_sim,
        "load-triples": cmd_load_triples,
        "output-ics": cmd_output_ics,
        "output-profile-sizes": cmd_output_profile_sizes,
        "expects-to-triples": cmd_expects_to_triples,
        "convert-nexml": cmd_convert_nexml,
        "output-evolutionary-profiles": cmd_output_evolutionary_profiles,
        "homology-table-to-owl": cmd_homology_table_to_owl,
        "convert-ontology": cmd_convert_ontology,
        "build-corpus": cmd_build_corpus,
    }
    fn = dispatch.get(command)
    if fn is None:
        print(__doc__)
        raise SystemExit(f"unknown command {command!r}")
    fn(rest)


if __name__ == "__main__":
    main()
