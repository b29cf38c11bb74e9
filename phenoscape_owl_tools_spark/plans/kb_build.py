"""The KB-build pipeline (SURVEY.md §3.1) — the engine's flagship plan.

Mirrors PhenoscapeKB.scala's 13-step object initializer as a staged Spark
job graph:

    ingest docs -> mention/link (Arrow UDF) -> EQ axiom-gen (projections)
    -> TBox generators -> EL closure (fixpoint joins) -> negation rules
    -> presence/absence path queries -> profiles -> canonicalize (CC)
    -> triple emit (subject-hash buckets, salted hub joins)

Every stage writes a table + lineage manifest via catalog.py; ``run`` skips
stages whose manifest fingerprint matches the current inputs (resume).

Scale design notes:
- dictionaries (terms/synonyms/edges) are broadcast-scale; the only large
  shuffles are mention output grouping and the final triple dedup — both
  keyed on doc/subject hash, skew-salted for hub entities;
- the closure runs over the ontology dimension only (never over doc-derived
  facts), so its cost is independent of corpus size;
- doc-derived triples join closure results through ``leftsemi``/broadcast
  probes (J4/J5), which AQE turns into broadcast joins at dimension scale.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from phenoscape_owl_tools_spark import catalog, vocab
from phenoscape_owl_tools_spark.functions import iri as iri_fn
from phenoscape_owl_tools_spark.operators import (
    closure as closure_op,
    components,
    eq,
    generators,
    mention,
    negation,
    profiles as profiles_op,
    salting,
)

TBOX_PROPERTIES = [
    # PhenoscapeKB.scala:249-287 generates restrictions for these properties
    vocab.PART_OF,
    vocab.HAS_PART,
    vocab.IMPLIES_PRESENCE_OF,
    vocab.HAS_PART_INHERING_IN,
    vocab.PHENOTYPE_OF,
    vocab.PHENOTYPE_OF_PART_OF,
]


@dataclass
class KBInputs:
    documents: DataFrame            # span shape (sources/documents.py)
    terms: DataFrame                # (iri, label, namespace)
    synonyms: DataFrame | None      # (iri, synonym, scope)
    subclass_edges: DataFrame       # (sub, sup)
    equiv_edges: DataFrame | None = None        # (a, b)
    restrictions: DataFrame | None = None       # (iri, prop, filler)
    gene_annotations: DataFrame | None = None   # (annotation, gene, phenotype_class)
    homology: DataFrame | None = None           # F4 shape
    taxonomy_edges: DataFrame | None = None     # (child, parent) tree
    state_phenotypes: DataFrame | None = None   # (state, phenotype) — fixture path


@dataclass
class KBResult:
    triples: DataFrame
    stages: dict[str, DataFrame] = field(default_factory=dict)
    manifests: dict[str, dict] = field(default_factory=dict)


def link_mentions(spark: SparkSession, inputs: KBInputs) -> DataFrame:
    """Stage 2: mention detection + namespace linking."""
    d = mention.build_dictionary(inputs.terms, inputs.synonyms)
    m = mention.detect_mentions(spark, inputs.documents, d)
    ns = F.broadcast(inputs.terms.select(F.col("iri").alias("term"), "namespace").dropDuplicates())
    return m.join(ns, on="term", how="left")


def compose_span_annotations(linked: DataFrame) -> DataFrame:
    """Stage 3: per (doc, span), the EQ annotation row.

    Deterministic aggregation: taxon/entity/quality = min(iri) per namespace
    within the span (ambiguity resolution must not depend on partitioning).
    A second anatomy mention becomes the related entity.
    """
    per_span = linked.groupBy("doc_id", "span_idx").agg(
        F.min(F.when(F.col("namespace") == "taxon", F.col("term"))).alias("taxon"),
        F.min(F.when(F.col("namespace") == "anatomy", F.col("term"))).alias("entity"),
        F.max(F.when(F.col("namespace") == "anatomy", F.col("term"))).alias("entity2"),
        F.min(F.when(F.col("namespace") == "quality", F.col("term"))).alias("quality"),
    )
    return per_span.withColumn(
        "related_entity",
        F.when(F.col("entity2") != F.col("entity"), F.col("entity2")),
    ).drop("entity2")


def doc_triples(annotations: DataFrame) -> dict[str, DataFrame]:
    """Stage 4: exhibits_state / describes_phenotype triples + EQ classes.

    State individuals are content-hash IRIs of (doc, span) — the reference
    mints them per NeXML state element (PhenexToOWL.scala:219-247); our
    identity is the span that asserted them (§7.1 determinism).
    """
    ann = annotations.where(F.col("entity").isNotNull() | F.col("quality").isNotNull())
    composed = eq.compose_eq_phenotypes(ann)
    state_iri = iri_fn.mint_iri("state", "doc_id", F.col("span_idx").cast("string"))
    composed = composed.withColumn("state", state_iri)

    with_taxon = composed.where(F.col("taxon").isNotNull())
    exhibits = with_taxon.select(
        F.col("taxon").alias("subj"),
        F.lit(vocab.EXHIBITS_STATE).alias("pred"),
        F.col("state").alias("obj"),
    )
    describes = composed.select(
        F.col("state").alias("subj"),
        F.lit(vocab.DESCRIBES_PHENOTYPE).alias("pred"),
        F.col("phenotype_cls").alias("obj"),
    )
    # presence/absence skeleton edges for the closure:
    # phenotype < implies_presence_of some E  (unless the quality is Absent)
    presence_edges = composed.where(
        F.col("entity").isNotNull() & (F.coalesce(F.col("quality"), F.lit("")) != vocab.ABSENT)
    ).select(
        F.col("phenotype_cls").alias("sub"),
        iri_fn.restriction_class_iri(F.lit(vocab.IMPLIES_PRESENCE_OF), F.col("entity")).alias("sup"),
    )
    absence_edges = composed.where(
        F.col("entity").isNotNull() & (F.col("quality") == vocab.ABSENT)
    ).select(
        F.col("phenotype_cls").alias("sub"),
        iri_fn.absence_class_iri(F.col("entity")).alias("sup"),
    )
    eq_edges = eq.eq_structure_edges(composed).unionByName(presence_edges).unionByName(absence_edges)
    # restriction definitions minted by EQ composition must be registered so
    # the closure's monotonicity rule can fire over them (e.g. quality
    # hierarchies propagating into (has_part some Q) classes)
    doc_restrictions = (
        composed.where(F.col("quality").isNotNull())
        .select(
            iri_fn.restriction_class_iri(F.lit(vocab.HAS_PART), F.col("quality")).alias("iri"),
            F.lit(vocab.HAS_PART).alias("prop"),
            F.col("quality").alias("filler"),
        )
        .unionByName(
            composed.where(F.col("entity").isNotNull()).select(
                iri_fn.restriction_class_iri(F.lit(vocab.PHENOTYPE_OF), F.col("entity")).alias("iri"),
                F.lit(vocab.PHENOTYPE_OF).alias("prop"),
                F.col("entity").alias("filler"),
            )
        )
        .unionByName(
            composed.where(F.col("entity").isNotNull()).select(
                iri_fn.restriction_class_iri(F.lit(vocab.IMPLIES_PRESENCE_OF), F.col("entity")).alias("iri"),
                F.lit(vocab.IMPLIES_PRESENCE_OF).alias("prop"),
                F.col("entity").alias("filler"),
            )
        )
        .dropDuplicates()
    )
    return {
        "triples": exhibits.unionByName(describes)
        .unionByName(eq.eq_annotation_triples(composed))
        .dropDuplicates(),
        "eq_edges": eq_edges.dropDuplicates(),
        "restrictions": doc_restrictions,
        "states": composed.select(
            "doc_id", "span_idx", "taxon", "entity", "quality", "state", "phenotype_cls"
        ),
    }


def depiction_triples(documents: DataFrame, linked: DataFrame) -> DataFrame:
    """S5 — media spans: (media_ref, depicts, anatomical structure) from the
    nearest anatomy mention in the same document, plus foaf:Image typing
    (PhenoteImageDepictionsToOWL.scala:31-61)."""
    from phenoscape_owl_tools_spark.sources.documents import media_spans

    media = media_spans(documents).select("doc_id", "media_ref")
    anat = (
        linked.where(F.col("namespace") == "anatomy")
        .groupBy("doc_id")
        .agg(F.min("term").alias("structure"))
    )
    dep = media.join(anat, on="doc_id").select(
        F.col("media_ref").alias("subj"),
        F.lit(vocab.DEPICTS).alias("pred"),
        F.col("structure").alias("obj"),
    )
    typing = media.select(
        F.col("media_ref").alias("subj"),
        F.lit(vocab.RDF_TYPE).alias("pred"),
        F.lit(vocab.IMAGE).alias("obj"),
    )
    return dep.unionByName(typing).dropDuplicates()


def build_tbox(inputs: KBInputs) -> dict[str, DataFrame]:
    """Stage 5: TBox generators over all anatomy entities (PhenoscapeKB
    .scala:249-297)."""
    anatomy = inputs.terms.where(F.col("namespace") == "anatomy").select("iri")
    nr = generators.named_restrictions(anatomy, TBOX_PROPERTIES)
    ab = generators.absence_classes(anatomy)
    dfr = generators.develops_from_rules(anatomy)
    sim = generators.similarity_templates(anatomy)
    neg = generators.negation_classes(anatomy)

    restrictions = nr["restrictions"].unionByName(ab["restrictions"]).unionByName(
        dfr["restrictions"]
    ).unionByName(sim["restrictions"]).dropDuplicates()
    if inputs.restrictions is not None:
        restrictions = restrictions.unionByName(inputs.restrictions).dropDuplicates()
    negates = ab["negates"].unionByName(neg["negates"]).dropDuplicates()
    gci_edges = dfr["gci_edges"].unionByName(sim["gci_edges"]).dropDuplicates()
    tbox_triples = nr["triples"].unionByName(ab["triples"]).unionByName(neg["triples"]).dropDuplicates()
    return {
        "restrictions": restrictions,
        "negates": negates,
        "gci_edges": gci_edges,
        "triples": tbox_triples,
    }


def _taxon_phenotypes(exhibits: DataFrame, describes: DataFrame) -> DataFrame:
    """exhibits(taxon, state) x describes(state, phenotype) -> (taxon, phenotype)."""
    ex = exhibits.select(F.col("subj").alias("taxon"), F.col("obj").alias("state"))
    de = describes.select(F.col("subj").alias("state2"), F.col("obj").alias("phenotype"))
    return ex.join(de, ex["state"] == de["state2"]).select("taxon", "phenotype")


def _phenotype_ancestors(tx_ph: DataFrame, closure: DataFrame, salt: int | None) -> DataFrame:
    """Reflexive ancestor expansion of (taxon, phenotype) through the
    closure — the hub-skew join of the presence/absence path: a handful of
    hot phenotype classes appear in a large fraction of documents, so the
    probe side is salted and the closure (dim) side exploded
    (operators/salting.py). ``salt=None`` auto-chooses from the key
    histogram (one collect job — callers with several path queries should
    choose once and pass it, as kb_build.run does, recording it under
    ``manifests['_config']``).
    """
    cl = closure.select(F.col("sub").alias("cl_sub"), F.col("sup").alias("cl_sup"))
    if salt is None:
        salt = salting.choose_salt_factor(tx_ph, "phenotype")
    joined = salting.salted_join(tx_ph, cl, "phenotype", "cl_sub", salt, "left")
    return (
        joined.select(
            "taxon", F.coalesce(F.col("cl_sup"), F.col("phenotype")).alias("cls")
        )
        .unionByName(tx_ph.select("taxon", F.col("phenotype").alias("cls")))
        .dropDuplicates()
    )


def presence_query(
    exhibits: DataFrame,
    describes: DataFrame,
    closure: DataFrame,
    anatomy_under_root: DataFrame,
    taxa_under_root: DataFrame,
    salt: int | None = None,
) -> DataFrame:
    """J4 — the flagship CONSTRUCT (PhenoscapeKB.scala:380-389):

    taxon exhibits_state/describes_phenotype/(subClassOf*)/
    implies_presence_of_some entity, entity under ANATOMICAL_ENTITY,
    taxon under CHORDATA -> (taxon, has_presence_of, entity).

    The path decodes to: phenotype ⊑* (implies_presence_of some E), with the
    named restriction's (prop, filler) read back from its definition table.
    Here ``closure`` rows already terminate at restriction classes whose
    filler we resolve via the restriction definitions carried in
    ``anatomy_under_root`` probes (passed as (cls, entity) pairs).
    """
    tx_ph = _taxon_phenotypes(exhibits, describes)
    ph_anc = _phenotype_ancestors(tx_ph, closure, salt)
    hit = ph_anc.join(
        F.broadcast(anatomy_under_root), ph_anc["cls"] == anatomy_under_root["presence_cls"]
    ).select("taxon", "entity")
    out = hit.join(F.broadcast(taxa_under_root), hit["taxon"] == taxa_under_root["t"], "leftsemi")
    return out.select(
        F.col("taxon").alias("subj"),
        F.lit(vocab.HAS_PRESENCE_OF).alias("pred"),
        F.col("entity").alias("obj"),
    ).dropDuplicates()


def absence_query(
    exhibits: DataFrame,
    describes: DataFrame,
    closure: DataFrame,
    absence_classes_df: DataFrame,
    taxa_under_root: DataFrame,
    salt: int | None = None,
) -> DataFrame:
    """J5 — same path through ABSENCE_OF (PhenoscapeKB.scala:391-396)."""
    tx_ph = _taxon_phenotypes(exhibits, describes)
    ph_anc = _phenotype_ancestors(tx_ph, closure, salt)
    hit = ph_anc.join(
        F.broadcast(absence_classes_df), ph_anc["cls"] == absence_classes_df["absence_cls"]
    ).select("taxon", "entity")
    out = hit.join(F.broadcast(taxa_under_root), hit["taxon"] == taxa_under_root["t"], "leftsemi")
    return out.select(
        F.col("taxon").alias("subj"),
        F.lit(vocab.HAS_ABSENCE_OF).alias("pred"),
        F.col("entity").alias("obj"),
    ).dropDuplicates()


def _fingerprint(*parts: str) -> str:
    h = hashlib.sha256()
    for p in parts:
        h.update(p.encode())
        h.update(b"\x1f")
    return h.hexdigest()[:16]


def run(
    spark: SparkSession,
    inputs: KBInputs,
    out_dir: str | Path | None = None,
    resume: bool = True,
    n_buckets: int = 16,
) -> KBResult:
    """Run the full KB build. With ``out_dir``, stages persist with
    manifests and valid stages are skipped on re-run (resume)."""
    result = KBResult(triples=None)  # type: ignore[arg-type]
    out_path = Path(out_dir) if out_dir else None

    def stage(name: str, fingerprint: str, build, bucket_col: str | None = None):
        """Materialize one stage with manifest + resume."""
        if out_path is not None:
            p = out_path / name
            if resume and catalog.is_stage_valid(p, fingerprint):
                df = catalog.read_table(spark, p)
                result.manifests[name] = catalog.read_manifest(p) | {"resumed": True}
                result.stages[name] = df
                return df
            df = build()
            m = catalog.write_table(
                df, p, fingerprint=fingerprint, bucket_col=bucket_col, n_buckets=n_buckets
            )
            result.manifests[name] = m
            df = catalog.read_table(spark, p)
            result.stages[name] = df
            return df
        df = build().localCheckpoint(eager=True)
        result.stages[name] = df
        return df

    # Resume fingerprint covers input CONTENT, not just shape: a schema-only
    # fingerprint would happily serve corpus A's cached stages for corpus B.
    # One cheap checksum pass per input table at pipeline start (the
    # order-insensitive xxhash64 sum catalog.content_checksum provides).
    # Skipped entirely when no out_dir: without persisted manifests the
    # fingerprint is never stored or compared, so the scans would be waste.
    # (With out_dir but resume=False it still runs: the manifests written
    # this run are what a FUTURE resume=True run validates against.)
    content_parts = []
    for name, df in [] if out_path is None else (
        ("documents", inputs.documents),
        ("terms", inputs.terms),
        ("synonyms", inputs.synonyms),
        ("subclass_edges", inputs.subclass_edges),
        ("equiv_edges", inputs.equiv_edges),
        ("restrictions", inputs.restrictions),
        ("gene_annotations", inputs.gene_annotations),
        ("homology", inputs.homology),
        ("taxonomy_edges", inputs.taxonomy_edges),
        ("state_phenotypes", inputs.state_phenotypes),
    ):
        content_parts.append(
            f"{name}={catalog.content_checksum(df) if df is not None else 'none'}"
        )
    in_fp = _fingerprint(
        str(inputs.documents.schema), str(sorted(inputs.terms.columns)),
        *content_parts,
    )

    linked = stage("linked_mentions", _fingerprint("linked", in_fp),
                   lambda: link_mentions(spark, inputs))
    ann = stage("span_annotations", _fingerprint("ann", in_fp),
                lambda: compose_span_annotations(linked))
    dt = doc_triples(ann)
    doc_trip = stage("doc_triples", _fingerprint("doc_triples", in_fp), lambda: dt["triples"])
    eq_edges = stage("eq_edges", _fingerprint("eq_edges", in_fp), lambda: dt["eq_edges"])
    states = stage("states", _fingerprint("states", in_fp), lambda: dt["states"])
    depict = stage("depictions", _fingerprint("depict", in_fp),
                   lambda: depiction_triples(inputs.documents, linked))

    tbox = build_tbox(inputs)
    restrictions = stage(
        "restrictions",
        _fingerprint("restr", in_fp),
        lambda: tbox["restrictions"].unionByName(dt["restrictions"]).dropDuplicates(),
    )
    negates = stage("negates", _fingerprint("negates", in_fp), lambda: tbox["negates"])
    tbox_triples = stage("tbox_triples", _fingerprint("tboxt", in_fp), lambda: tbox["triples"])

    cl = stage(
        "closure",
        _fingerprint("closure", in_fp),
        lambda: closure_op.el_closure(
            inputs.subclass_edges.unionByName(eq_edges),
            equiv_edges=inputs.equiv_edges,
            gci_edges=tbox["gci_edges"],
            restrictions=restrictions,
        ),
    )

    neg_sub = stage(
        "negation_hierarchy",
        _fingerprint("neg", in_fp),
        lambda: negation.negation_subclass_axioms(negates, cl),
    )

    # presence/absence path queries (J4/J5)
    anatomy = inputs.terms.where(F.col("namespace") == "anatomy").select("iri")
    presence_map = anatomy.select(
        iri_fn.restriction_class_iri(F.lit(vocab.IMPLIES_PRESENCE_OF), F.col("iri")).alias("presence_cls"),
        F.col("iri").alias("entity"),
    )
    absence_map = anatomy.select(
        iri_fn.absence_class_iri(F.col("iri")).alias("absence_cls"),
        F.col("iri").alias("entity"),
    )
    taxa = inputs.terms.where(F.col("namespace") == "taxon").select(F.col("iri").alias("t"))
    exhibits = doc_trip.where(F.col("pred") == vocab.EXHIBITS_STATE)
    describes = doc_trip.where(F.col("pred") == vocab.DESCRIBES_PHENOTYPE)
    # choose the hub-skew salt ONCE (one histogram job, shared by both path
    # queries) and record it for resume/golden-file verification
    salt = salting.choose_salt_factor(
        _taxon_phenotypes(exhibits, describes), "phenotype"
    )
    result.manifests["_config"] = {"presence_path_salt": salt}
    presences = stage(
        "presences",
        _fingerprint("presences", in_fp, f"salt={salt}"),
        lambda: presence_query(exhibits, describes, cl, presence_map, taxa, salt=salt),
    )
    absences = stage(
        "absences",
        _fingerprint("absences", in_fp, f"salt={salt}"),
        lambda: absence_query(exhibits, describes, cl, absence_map, taxa, salt=salt),
    )

    # profiles
    parts = [doc_trip, depict, tbox_triples, presences, absences]
    parts.append(
        stage(
            "closure_triples",
            _fingerprint("clt", in_fp),
            lambda: cl.select(
                F.col("sub").alias("subj"),
                F.lit(vocab.RDFS_SUBCLASS_OF).alias("pred"),
                F.col("sup").alias("obj"),
            ).unionByName(
                neg_sub.select(
                    F.col("sub").alias("subj"),
                    F.lit(vocab.RDFS_SUBCLASS_OF).alias("pred"),
                    F.col("sup").alias("obj"),
                )
            ),
        )
    )
    if inputs.gene_annotations is not None:
        parts.append(
            stage("gene_profiles", _fingerprint("gp", in_fp),
                  lambda: profiles_op.gene_profiles(inputs.gene_annotations))
        )
    if inputs.taxonomy_edges is not None and inputs.state_phenotypes is not None:
        def build_evo():
            assoc = states.where(F.col("taxon").isNotNull()).select(
                F.col("taxon"),
                F.coalesce(F.col("quality"), F.lit("none")).alias("character"),
                F.col("state"),
            )
            sp = states.where(F.col("entity").isNotNull()).select(
                "state", F.col("entity").alias("phenotype")
            ).dropDuplicates()
            _, prof = profiles_op.evolutionary_profiles(inputs.taxonomy_edges, assoc)
            return profiles_op.profile_triples(prof, sp)

        parts.append(stage("evolutionary_profiles", _fingerprint("evo", in_fp), build_evo))
    if inputs.homology is not None:
        from phenoscape_owl_tools_spark.operators import homology as hom_op

        parts.append(
            stage("homology_triples", _fingerprint("hom", in_fp),
                  lambda: hom_op.homology_axioms(inputs.homology))
        )

    def build_all_triples():
        all_t = parts[0]
        for p in parts[1:]:
            all_t = all_t.unionByName(p)
        all_t = generators.normalize_properties(all_t)
        if inputs.equiv_edges is not None:
            comp = components.connected_components(inputs.equiv_edges)
            all_t = components.canonicalize_triples(all_t, comp)
        return all_t.dropDuplicates()

    triples = stage("triples", _fingerprint("emit", in_fp), build_all_triples, bucket_col="subj")
    result.triples = triples
    if out_path is not None:
        (out_path / "_pipeline_manifest.json").write_text(
            json.dumps({k: v for k, v in result.manifests.items()}, indent=1, sort_keys=True, default=str)
        )
    return result
