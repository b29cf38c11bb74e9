"""S2 TSV ingest: ZFIN-style gene-phenotype converter, P14 skolemization."""

from __future__ import annotations

from pyspark.sql import Row

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.operators import generators, profiles as profiles_op
from phenoscape_owl_tools_spark.sources import tsv_ingest


def test_gene_phenotype_tsv_roundtrip(spark, tmp_path):
    tsv = tmp_path / "zfin.tsv"
    tsv.write_text(
        "ZDB-GENE-1\tshha\tUBERON:0001062\tPMID:1\n"
        "ZDB-GENE-1\tshha\tPATO:0000462\tPMID:2\n"
        "ZDB-GENE-2\tpax2a\tUBERON:0001062\tPMID:1\n"
    )
    raw = tsv_ingest.read_gene_phenotype_tsv(spark, str(tsv))
    ann = tsv_ingest.gene_phenotype_annotations(raw, "http://zfin.org/")
    rows = ann.collect()
    assert len(rows) == 3
    genes = {r["gene"] for r in rows}
    assert genes == {"http://zfin.org/ZDB-GENE-1", "http://zfin.org/ZDB-GENE-2"}
    assert all(r["phenotype_class"].startswith(vocab.OBO_PREFIX) for r in rows)
    # deterministic annotation IRIs: re-parse gives identical set
    again = {r["annotation"] for r in tsv_ingest.gene_phenotype_annotations(raw, "http://zfin.org/").collect()}
    assert again == {r["annotation"] for r in rows}

    triples = tsv_ingest.annotation_triples(ann)
    preds = {r["pred"] for r in triples.collect()}
    assert preds == {vocab.RDF_TYPE, vocab.ASSOCIATED_WITH_GENE}
    # flows into the gene-profile layer
    prof = profiles_op.gene_profiles(ann)
    assert prof.count() > 0


def test_instantiate_class_assertions_skolems(spark):
    expr = spark.createDataFrame(
        [Row(root_individual="r1", prop="P", inner_prop="Q", filler="C")]
    )
    triples = generators.instantiate_class_assertions(expr).collect()
    assert len(triples) == 3
    by_pred = {r["pred"]: r for r in triples}
    sk1 = by_pred["P"]["obj"]
    assert by_pred["Q"]["subj"] == sk1
    sk2 = by_pred["Q"]["obj"]
    assert by_pred[vocab.RDF_TYPE]["subj"] == sk2
    assert by_pred[vocab.RDF_TYPE]["obj"] == "C"
    assert sk1 != sk2 and sk1.startswith("http://purl.org/phenoscape/minted/ind/")
