"""Sequential reference oracle for the whole KB build (FIXTURES.md F8).

Recomputes, in plain Python over the fixture corpus, every triple the Spark
pipeline (plans/kb_build.py) is supposed to emit — working from the
generation-truth mentions, so extraction and composition are checked
independently. The engine's P/R >= 0.95 gate compares against this set.

IRI minting replicates functions/iri.py byte-for-byte (sha256 over the same
canonical serializations).
"""

from __future__ import annotations

import hashlib
from collections import defaultdict

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.oracle import pyoracle

MINT_PREFIX = "http://purl.org/phenoscape/minted/"
PRESENT = vocab.OBO_PREFIX + "PATO_0000467"
MULTICELLULAR_ORGANISM = vocab.OBO_PREFIX + "UBERON_0000468"


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def mint_iri(kind: str, *parts: str | None) -> str:
    joined = "\x1f".join([kind, *("\x00" if p is None else p for p in parts)])
    return MINT_PREFIX + kind + "/" + _sha(joined)


def restriction_iri(prop: str, filler: str) -> str:
    return vocab.EXPRESSION_PREFIX + _sha(f"ObjectSomeValuesFrom {prop} {filler}")


def negation_iri(cls: str) -> str:
    return vocab.NOT_PREFIX + cls


def absence_iri(entity: str) -> str:
    return negation_iri(restriction_iri(vocab.IMPLIES_PRESENCE_OF, entity))


def expression_iri(canonical: str) -> str:
    return vocab.EXPRESSION_PREFIX + _sha(canonical)


def compose_eq(entity: str | None, quality: str | None, related: str | None) -> str | None:
    """Mirror of operators/eq.py compose_eq_phenotypes canonical strings."""
    E, Q, RE = entity, quality, related
    if E is None and Q is None:
        return None
    if E is not None and Q is None:
        return f"has_part some ( {PRESENT} and inheres_in some {E} )"
    if E is not None and Q == vocab.ABSENT and RE is None:
        return (
            f"has_part some ( {vocab.LACKS_ALL_PARTS_OF_TYPE} and inheres_in some "
            f"{MULTICELLULAR_ORGANISM} and towards value {E} ) and phenotype_of some {E}"
        )
    if E is not None and Q == vocab.LACKS_ALL_PARTS_OF_TYPE and RE is not None:
        return (
            f"has_part some ( {vocab.LACKS_ALL_PARTS_OF_TYPE} and inheres_in some {E} "
            f"and towards value {RE} ) and phenotype_of some {RE}"
        )
    if E is None and Q is not None and RE is None:
        return f"has_part some {Q}"
    if E is None and Q is not None and RE is not None:
        return f"has_part some ( {Q} and towards some {RE} )"
    if E is not None and Q is not None and RE is None:
        return f"has_part some ( {Q} and inheres_in some {E} )"
    return f"has_part some ( {Q} and inheres_in some {E} and towards some {RE} )"


TBOX_PROPERTIES = [
    vocab.PART_OF, vocab.HAS_PART, vocab.IMPLIES_PRESENCE_OF,
    vocab.HAS_PART_INHERING_IN, vocab.PHENOTYPE_OF, vocab.PHENOTYPE_OF_PART_OF,
]


def expected_triples(corpus) -> set[tuple[str, str, str]]:
    """Full expected triple set for a FixtureCorpus."""
    t = corpus.tables
    triples: set[tuple[str, str, str]] = set()

    ns_of = dict(zip(t["terms"]["iri"], t["terms"]["namespace"]))
    anatomy = sorted(i for i, n in ns_of.items() if n == "anatomy")

    # --- per-span annotations from generation-truth mentions ---------------
    by_span: dict[tuple[str, int], list[str]] = defaultdict(list)
    em = t["expected_mentions"]
    for d, s, term in zip(em["doc_id"], em["span_idx"], em["term"]):
        by_span[(d, s)].append(term)

    restrictions: dict[str, tuple[str, str]] = {}  # iri -> (prop, filler)

    def add_restriction(prop: str, filler: str) -> str:
        r = restriction_iri(prop, filler)
        restrictions[r] = (prop, filler)
        return r

    eq_edges: set[tuple[str, str]] = set()
    states: list[dict] = []
    for (doc, span), terms in sorted(by_span.items()):
        taxa = sorted(x for x in terms if ns_of.get(x) == "taxon")
        anats = sorted(x for x in terms if ns_of.get(x) == "anatomy")
        quals = sorted(x for x in terms if ns_of.get(x) == "quality")
        taxon = taxa[0] if taxa else None
        entity = anats[0] if anats else None
        entity2 = anats[-1] if anats else None
        quality = quals[0] if quals else None
        related = entity2 if (entity2 and entity2 != entity) else None
        canonical = compose_eq(entity, quality, related)
        if canonical is None:
            continue
        ph = expression_iri(canonical)
        state = mint_iri("state", doc, str(span))
        states.append(
            {"doc": doc, "span": span, "taxon": taxon, "entity": entity,
             "quality": quality, "state": state, "phenotype": ph}
        )
        if taxon:
            triples.add((taxon, vocab.EXHIBITS_STATE, state))
        triples.add((state, vocab.DESCRIBES_PHENOTYPE, ph))
        if entity:
            triples.add((ph, vocab.PHENOSCAPE_VOCAB + "entity_term", entity))
        if quality:
            triples.add((ph, vocab.PHENOSCAPE_VOCAB + "quality_term", quality))
        if related:
            triples.add((ph, vocab.PHENOSCAPE_VOCAB + "related_entity_term", related))
        # EQ structure edges
        if quality:
            eq_edges.add((ph, add_restriction(vocab.HAS_PART, quality)))
        if entity:
            eq_edges.add((ph, add_restriction(vocab.PHENOTYPE_OF, entity)))
            if quality != vocab.ABSENT:
                eq_edges.add((ph, add_restriction(vocab.IMPLIES_PRESENCE_OF, entity)))
            else:
                eq_edges.add((ph, absence_iri(entity)))

    # --- depictions --------------------------------------------------------
    docs = t["documents"]
    anat_by_doc: dict[str, str] = {}
    for (doc, span), terms in by_span.items():
        anats = [x for x in terms if ns_of.get(x) == "anatomy"]
        if anats:
            cur = anat_by_doc.get(doc)
            m = min(anats)
            anat_by_doc[doc] = m if cur is None else min(cur, m)
    for doc_id, spans in zip(docs["doc_id"], docs["spans"]):
        for sp in spans:
            if sp["kind"] == "media":
                triples.add((sp["media_ref"], vocab.RDF_TYPE, vocab.IMAGE))
                if doc_id in anat_by_doc:
                    triples.add((sp["media_ref"], vocab.DEPICTS, anat_by_doc[doc_id]))

    # --- TBox generators ----------------------------------------------------
    negates: set[tuple[str, str]] = set()
    for e in anatomy:
        for prop in TBOX_PROPERTIES:
            r = add_restriction(prop, e)
            triples.add((r, prop + "_some", e))
        triples.add((absence_iri(e), vocab.ABSENCE_OF, e))
        negates.add((absence_iri(e), restriction_iri(vocab.IMPLIES_PRESENCE_OF, e)))
        triples.add((negation_iri(e), vocab.NEGATES, e))
        negates.add((negation_iri(e), e))
        # develops-from GCIs + similarity templates
        df_inner = add_restriction(vocab.DEVELOPS_FROM, e)
        po_inner = add_restriction(vocab.PART_OF, e)
        hp_df = add_restriction(vocab.HAS_PART, df_inner)
        hp_po = add_restriction(vocab.HAS_PART, po_inner)
        hp_e = add_restriction(vocab.HAS_PART, e)
        eq_edges.add((hp_df, hp_e))
        eq_edges.add((hp_po, hp_e))
        phen_e = add_restriction(vocab.PHENOTYPE_OF, e)
        phen_po_e = add_restriction(vocab.PHENOTYPE_OF, po_inner)
        union_tpl = expression_iri(f"ObjectUnionOf {vocab.PHENOTYPE_OF} {e}")
        eq_edges.add((phen_e, union_tpl))
        eq_edges.add((phen_po_e, union_tpl))

    for iri, prop, filler in zip(
        t["restrictions"]["iri"], t["restrictions"]["prop"], t["restrictions"]["filler"]
    ):
        restrictions[iri] = (prop, filler)

    # --- EL closure (transitivity + restriction monotonicity) --------------
    seed: set[tuple[str, str]] = set()
    for a, b in zip(t["subclass_edges"]["sub"], t["subclass_edges"]["sup"]):
        seed.add((a, b))
    for a, b in zip(t["equiv_edges"]["a"], t["equiv_edges"]["b"]):
        seed.add((a, b))
        seed.add((b, a))
    seed |= eq_edges

    by_filler: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for r, (p, f) in restrictions.items():
        by_filler[f].append((p, r))

    # Full saturation: monotonicity derives NEW edges (rx < ry), which must
    # themselves compose transitively with everything else — so transitivity
    # runs over the whole closure (both directions from the frontier), not
    # just the seed edges. Mirrors the engine's non-linear semi-naive loop.
    closure = set(x for x in seed if x[0] != x[1])
    frontier = set(closure)
    cl_by_sub: dict[str, set[str]] = defaultdict(set)
    cl_by_sup: dict[str, set[str]] = defaultdict(set)
    for a, b in closure:
        cl_by_sub[a].add(b)
        cl_by_sup[b].add(a)
    while frontier:
        new: set[tuple[str, str]] = set()
        for x, y in frontier:
            for z in cl_by_sub.get(y, ()):
                if x != z and (x, z) not in closure:
                    new.add((x, z))
            for w in cl_by_sup.get(x, ()):
                if w != y and (w, y) not in closure:
                    new.add((w, y))
            # monotonicity: (P some x) < (P some y)
            for p1, r1 in by_filler.get(x, ()):
                for p2, r2 in by_filler.get(y, ()):
                    if p1 == p2 and r1 != r2 and (r1, r2) not in closure:
                        new.add((r1, r2))
        closure |= new
        for a, b in new:
            cl_by_sub[a].add(b)
            cl_by_sup[b].add(a)
        frontier = new

    # --- negation hierarchy --------------------------------------------------
    neg_subs, _ = pyoracle.negation_hierarchy(closure, [], negates)
    closure_triples = closure | {(a, b) for a, b in neg_subs if a != b}
    for a, b in closure_triples:
        triples.add((a, vocab.RDFS_SUBCLASS_OF, b))

    # --- presence / absence queries -----------------------------------------
    anc: dict[str, set[str]] = defaultdict(set)
    for a, b in closure:
        anc[a].add(b)
    presence_of = {restriction_iri(vocab.IMPLIES_PRESENCE_OF, e): e for e in anatomy}
    absence_of = {absence_iri(e): e for e in anatomy}
    taxa_set = {i for i, n in ns_of.items() if n == "taxon"}
    for st in states:
        if not st["taxon"] or st["taxon"] not in taxa_set:
            continue
        for cls in anc[st["phenotype"]] | {st["phenotype"]}:
            if cls in presence_of:
                triples.add((st["taxon"], vocab.HAS_PRESENCE_OF, presence_of[cls]))
            if cls in absence_of:
                triples.add((st["taxon"], vocab.HAS_ABSENCE_OF, absence_of[cls]))

    # --- gene profiles -------------------------------------------------------
    ga = t["gene_annotations"]
    for gene, ph in set(zip(ga["gene"], ga["phenotype_class"])):
        triples.add((gene + "#profile", vocab.RDF_TYPE, ph))
        triples.add((gene, vocab.HAS_PHENOTYPIC_PROFILE, gene + "#profile"))

    # --- evolutionary profiles ----------------------------------------------
    children_of: dict[str, list[str]] = defaultdict(list)
    for c, p in zip(t["taxonomy_edges"]["child"], t["taxonomy_edges"]["parent"]):
        children_of[p].append(c)
    node_states: dict[str, dict[str, set[str]]] = defaultdict(lambda: defaultdict(set))
    state_entity: dict[str, set[str]] = defaultdict(set)
    for st in states:
        if st["taxon"]:
            char = st["quality"] or "none"
            node_states[st["taxon"]][char].add(st["state"])
        if st["entity"]:
            state_entity[st["state"]].add(st["entity"])
    _, prof = pyoracle.fitch_postorder(
        {k: v for k, v in children_of.items()},
        vocab.CHORDATA,
        {k: dict(v) for k, v in node_states.items()},
    )
    for node, per_char in prof.items():
        emitted = False
        for char, sts in per_char.items():
            for s in sts:
                for e in state_entity.get(s, ()):
                    triples.add((node + "#profile", vocab.RDF_TYPE, e))
                    emitted = True
        if emitted:
            triples.add((node, vocab.HAS_PHENOTYPIC_PROFILE, node + "#profile"))

    # --- homology -------------------------------------------------------------
    triples |= homology_triples(t["homology"])

    # --- canonicalization over equivalence components -------------------------
    comp = pyoracle.connected_components(
        set(zip(t["equiv_edges"]["a"], t["equiv_edges"]["b"]))
    )
    out = set()
    for s, p, o in triples:
        out.add((comp.get(s, s), p, comp.get(o, o)))
    return out


def homology_triples(h: dict[str, list]) -> set[tuple[str, str, str]]:
    """Mirror of operators/homology.py homology_axioms."""
    IN_HIST = "http://purl.obolibrary.org/obo/RO_HOM0000007"
    SER = "http://purl.obolibrary.org/obo/RO_HOM0000027"
    trip: set[tuple[str, str, str]] = set()

    def expr(s, t):
        return expression_iri(
            f"ObjectIntersectionOf {s} ObjectSomeValuesFrom {vocab.IN_TAXON} {t}"
        )

    for i in range(len(h["structure1"])):
        s1, t1 = h["structure1"][i].strip(), h["taxon1"][i].strip()
        s2, t2 = h["structure2"][i].strip(), h["taxon2"][i].strip()
        rel = h["relation"][i].strip()
        ev, pub = h["evidence_code"][i], h["publication"][i]
        prop = IN_HIST if rel in ("hom to", "not hom to") else SER
        negated = rel.startswith("not ")
        uid = _sha("\t".join([s1, t1, rel, s2, t2, ev or "", pub]))
        ann = "http://purl.phenoscape.org/homology/annotation/" + uid
        e1, e2 = expr(s1, t1), expr(s2, t2)
        if not negated:
            trip.add((e1, prop, e2))
            trip.add((e2, prop, e1))
        trip |= {
            (e1, vocab.RDFS_SUBCLASS_OF, s1), (e1, vocab.IN_TAXON, t1),
            (e2, vocab.RDFS_SUBCLASS_OF, s2), (e2, vocab.IN_TAXON, t2),
        }
        if ev is not None:
            ev_ind = ann + "#evidence"
            trip |= {
                (ann, vocab.RDF_TYPE, "http://purl.org/oban/association"),
                (ann, vocab.HAS_EVIDENCE, ev_ind),
                (ann, "http://purl.org/phenoscape/oban/is_negated", str(negated).lower()),
                (ann + "#structure1", vocab.RDF_TYPE, e1),
                (ann + "#structure2", vocab.RDF_TYPE, e2),
                (ann, "http://purl.org/oban/association_has_subject", ann + "#structure1"),
                (ann, "http://purl.org/oban/association_has_object", ann + "#structure2"),
                (ann, "http://purl.org/oban/association_has_predicate", prop),
                (ev_ind, vocab.RDF_TYPE, vocab.OBO_PREFIX + ev.replace(":", "_")),
                (ev_ind, "http://purl.org/dc/terms/source", pub),
            }
    return trip
