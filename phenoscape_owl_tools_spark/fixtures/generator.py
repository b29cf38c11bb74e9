"""Deterministic synthetic corpus generator (FIXTURES.md F1-F7).

Pure function of (seed, n_docs): a scale-free ontology DAG (anatomy /
quality / taxonomy), label+synonym dictionaries, and an interleaved
text+media document table

    documents(doc_id STRING,
              spans ARRAY<STRUCT<kind STRING, text STRING,
                                 media_ref STRING, offset INT>>)

mirroring the reference's three ingest shapes (NeXML character matrices
PhenexToOWL.scala:43-143, gene/phenotype TSVs PhenoscapeKB.scala:197-247,
image depictions PhenoteImageDepictionsToOWL.scala:31-61).

Ground truth (which ontology term each embedded label refers to) is recorded
at generation time (``expected_mentions``), so extraction P/R is measured
against generation truth, not against a re-implementation of the matcher.

Skew: one designated hub anatomy term appears in ~10% of docs
(SURVEY.md §7.5) so skew handling is actually exercised.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from phenoscape_owl_tools_spark import vocab

OBO = vocab.OBO_PREFIX

_SYLLABLES = [
    "zor", "bla", "quix", "morph", "vex", "tral", "ponti", "skel",
    "dactyl", "ceph", "brachi", "ostro", "pelvi", "neuro", "fib",
]
# filler words deliberately disjoint from the syllable alphabet
_FILLERS = (
    "the of in with and exhibits state observed specimen shows presence "
    "structure character describes noted we this has its from were which"
).split()


def _word(rng: random.Random, idx: int) -> str:
    return _SYLLABLES[idx % len(_SYLLABLES)] + _SYLLABLES[(idx * 7 + 3) % len(_SYLLABLES)] + str(idx)


@dataclass
class FixtureCorpus:
    """All fixture tables as dict-of-column lists, plus ground truth."""

    tables: dict[str, dict[str, list]] = field(default_factory=dict)
    hub_anatomy: str = ""

    def to_arrow(self, name: str) -> pa.Table:
        cols = self.tables[name]
        if name == "documents":
            span_type = pa.list_(
                pa.struct(
                    [
                        ("kind", pa.string()),
                        ("text", pa.string()),
                        ("media_ref", pa.string()),
                        ("offset", pa.int32()),
                    ]
                )
            )
            return pa.table(
                {
                    "doc_id": pa.array(cols["doc_id"], pa.string()),
                    "spans": pa.array(cols["spans"], span_type),
                }
            )
        return pa.table({k: pa.array(v) for k, v in cols.items()})


def _make_dag(rng: random.Random, prefix: str, root: str, n: int, chain: int) -> tuple[list[str], list[tuple[str, str]]]:
    """Scale-free-ish DAG rooted at ``root``: first ``chain`` terms form a
    chain (guaranteed depth, like deep OBO branches), the rest attach to
    1-2 earlier terms with preferential attachment."""
    iris = [f"{OBO}{prefix}_{i:07d}" for i in range(n)]
    edges: list[tuple[str, str]] = []
    degree = {root: 2}
    for i, iri in enumerate(iris):
        if i == 0:
            edges.append((iri, root))
        elif i < chain:
            edges.append((iri, iris[i - 1]))
        else:
            pool = [root] + iris[:i]
            weights = [degree.get(p, 1) for p in pool]
            n_parents = 1 + (rng.random() < 0.25)
            chosen = set()
            for _ in range(n_parents):
                chosen.add(rng.choices(pool, weights=weights, k=1)[0])
            for p in chosen:
                edges.append((iri, p))
                degree[p] = degree.get(p, 1) + 1
        degree.setdefault(iri, 1)
    return iris, edges


def generate_corpus(seed: int = 42, n_docs: int = 200) -> FixtureCorpus:
    rng = random.Random(seed)
    c = FixtureCorpus()

    n_anat = max(30, n_docs // 10)
    n_qual = max(15, n_docs // 20)
    n_taxa = max(20, n_docs // 12)
    n_genes = max(10, n_docs // 25)

    anat, anat_edges = _make_dag(rng, "ANAT", vocab.ANATOMICAL_ENTITY, n_anat, chain=12)
    qual, qual_edges = _make_dag(rng, "QUAL", vocab.QUALITY, n_qual, chain=8)

    # taxonomy is a TREE (single parent) under CHORDATA (F5)
    taxa = [f"{OBO}VTO_{i + 10:07d}" for i in range(n_taxa)]
    tax_edges = []
    for i, t in enumerate(taxa):
        if i == 0:
            tax_edges.append((t, vocab.CHORDATA))
        elif i < 5:
            tax_edges.append((t, taxa[i - 1]))
        else:
            tax_edges.append((t, taxa[rng.randrange(i)]))

    hub = anat[1]
    c.hub_anatomy = hub

    # --- F2 dictionaries -------------------------------------------------
    terms_rows = {"iri": [], "label": [], "namespace": []}
    syn_rows = {"iri": [], "synonym": [], "scope": []}
    label_of: dict[str, str] = {}

    def add_terms(iris: list[str], ns: str, base: int) -> None:
        for i, iri in enumerate(iris):
            words = [_word(rng, base + i)]
            if rng.random() < 0.3:
                words.append(_word(rng, base + i + 5000))
            label = " ".join(words)
            label_of[iri] = label
            terms_rows["iri"].append(iri)
            terms_rows["label"].append(label)
            terms_rows["namespace"].append(ns)
            if rng.random() < 0.35:
                syn_rows["iri"].append(iri)
                syn_rows["synonym"].append(_word(rng, base + i + 9000))
                syn_rows["scope"].append("exact" if rng.random() < 0.7 else "related")

    add_terms(anat, "anatomy", 0)
    add_terms(qual, "quality", 20000)
    add_terms(taxa, "taxon", 40000)
    # PATO 'absent' participates as a quality (drives the absence path J5)
    terms_rows["iri"].append(vocab.ABSENT)
    terms_rows["label"].append(_word(rng, 77777))
    terms_rows["namespace"].append("quality")
    label_of[vocab.ABSENT] = terms_rows["label"][-1]
    for root_iri, root_label, ns in [
        (vocab.ANATOMICAL_ENTITY, "anatomical entity", "anatomy"),
        (vocab.QUALITY, "quality", "quality"),
        (vocab.CHORDATA, "chordata", "taxon"),
    ]:
        terms_rows["iri"].append(root_iri)
        terms_rows["label"].append(root_label)
        terms_rows["namespace"].append(ns)
        label_of[root_iri] = root_label

    c.tables["terms"] = terms_rows
    c.tables["synonyms"] = syn_rows

    sub_edges = anat_edges + qual_edges + tax_edges
    c.tables["subclass_edges"] = {
        "sub": [e[0] for e in sub_edges],
        "sup": [e[1] for e in sub_edges],
    }
    c.tables["taxonomy_edges"] = {
        "child": [e[0] for e in tax_edges],
        "parent": [e[1] for e in tax_edges],
    }

    # equivalence clusters of size 2-4 over anatomy tail (C5 tests)
    eq_rows = {"a": [], "b": []}
    pool = anat[12:]
    i = 0
    while i + 4 < len(pool):
        size = rng.choice([2, 2, 3, 4])
        cluster = pool[i : i + size]
        for j in range(len(cluster) - 1):
            eq_rows["a"].append(cluster[j])
            eq_rows["b"].append(cluster[j + 1])
        i += size + rng.randrange(3, 8)
    c.tables["equiv_edges"] = eq_rows

    rest_rows = {"iri": [], "prop": [], "filler": []}
    for a in anat[: n_anat // 2]:
        for prop in (vocab.PART_OF, vocab.HAS_PART):
            if rng.random() < 0.4:
                rest_rows["iri"].append(f"{vocab.EXPRESSION_PREFIX}fixture-{prop.rsplit('/', 1)[-1]}-{a.rsplit('/', 1)[-1]}")
                rest_rows["prop"].append(prop)
                rest_rows["filler"].append(a)
    c.tables["restrictions"] = rest_rows

    dis_rows = {"a": [], "b": []}
    for _ in range(max(3, n_anat // 20)):
        x, y = rng.sample(anat[12:], 2)
        dis_rows["a"].append(x)
        dis_rows["b"].append(y)
    c.tables["disjoint_pairs"] = dis_rows

    # --- F4 homology ------------------------------------------------------
    hom = {"structure1": [], "taxon1": [], "relation": [], "structure2": [],
           "taxon2": [], "evidence_code": [], "publication": []}
    for _ in range(max(10, n_docs // 8)):
        s1, s2 = rng.sample(anat, 2)
        hom["structure1"].append(s1)
        hom["structure2"].append(s2)
        hom["taxon1"].append(rng.choice(taxa))
        hom["taxon2"].append(rng.choice(taxa))
        hom["relation"].append(rng.choice(["hom to", "ser hom to", "not hom to", "hom to"]))
        hom["evidence_code"].append(rng.choice(["ECO:0000033", None]))
        hom["publication"].append(f"PMID:{rng.randrange(10000, 99999)}")
    c.tables["homology"] = hom

    # --- F5/F6 associations + docs ---------------------------------------
    n_chars = max(8, n_docs // 20)
    characters = [f"http://example.org/character/{i}" for i in range(n_chars)]
    states: list[str] = []
    state_phen = {"state": [], "phenotype": []}
    state_assoc = {"taxon": [], "character": [], "state": []}

    docs = {"doc_id": [], "spans": []}
    mentions = {"doc_id": [], "span_idx": [], "term": []}
    gene_ann = {"annotation": [], "gene": [], "phenotype_class": []}

    def sentence(term_iris: list[str], doc_id: str, span_idx: int) -> str:
        parts = []
        for t in term_iris:
            parts.append(rng.choice(_FILLERS))
            use_syn = rng.random() < 0.2
            surface = label_of[t]
            if use_syn:
                for ii, s_iri in enumerate(syn_rows["iri"]):
                    if s_iri == t:
                        surface = syn_rows["synonym"][ii]
                        break
            parts.append(surface)
            mentions["doc_id"].append(doc_id)
            mentions["span_idx"].append(span_idx)
            mentions["term"].append(t)
        parts.append(rng.choice(_FILLERS))
        return " ".join(parts)

    for d in range(n_docs):
        doc_id = f"doc:{d:07d}"
        kind_roll = rng.random()
        spans = []
        if kind_roll < 0.55:  # matrix doc
            taxon = rng.choice(taxa)
            n_cells = rng.randrange(1, 4)
            for ci in range(n_cells):
                ch = rng.choice(characters)
                a = hub if rng.random() < 0.10 else rng.choice(anat)
                q = vocab.ABSENT if rng.random() < 0.15 else rng.choice(qual)
                state = f"http://example.org/state/{len(states)}"
                states.append(state)
                state_phen["state"].append(state)
                state_phen["phenotype"].append(a)  # phenotype keyed to entity
                state_assoc["taxon"].append(taxon)
                state_assoc["character"].append(ch)
                state_assoc["state"].append(state)
                text = sentence([taxon, q, a], doc_id, len(spans))
                spans.append({"kind": "text", "text": text, "media_ref": None, "offset": len(spans)})
        elif kind_roll < 0.85:  # gene annotation doc
            gene = f"http://example.org/gene/G{rng.randrange(n_genes):04d}"
            a = hub if rng.random() < 0.10 else rng.choice(anat)
            q = rng.choice(qual)
            ann = f"ann-{doc_id}"
            gene_ann["annotation"].append(ann)
            gene_ann["gene"].append(gene)
            gene_ann["phenotype_class"].append(a)
            text = sentence([q, a], doc_id, 0)
            spans.append({"kind": "text", "text": text, "media_ref": None, "offset": 0})
        else:  # depiction doc with a media span
            a = hub if rng.random() < 0.10 else rng.choice(anat)
            media_ref = f"http://images.example.org/{d}.png"
            spans.append({"kind": "media", "text": None, "media_ref": media_ref, "offset": 0})
            text = sentence([a], doc_id, 1)
            spans.append({"kind": "text", "text": text, "media_ref": None, "offset": 1})
        docs["doc_id"].append(doc_id)
        docs["spans"].append(spans)

    c.tables["documents"] = docs
    c.tables["expected_mentions"] = mentions
    c.tables["gene_annotations"] = gene_ann
    c.tables["state_associations"] = state_assoc
    c.tables["state_phenotypes"] = state_phen

    # --- F7 similarity mini-corpus ---------------------------------------
    prof = {"individual": [], "phenotype": []}
    n_ind = 20
    for i in range(n_ind):
        kind = "VTO" if i < n_ind // 2 else "GENE"
        ind = f"http://example.org/profile/{kind}_{i:03d}"
        for _ in range(rng.randrange(2, 6)):
            prof["individual"].append(ind)
            prof["phenotype"].append(rng.choice(anat))
    c.tables["profiles"] = prof

    return c


def write_corpus(corpus: FixtureCorpus, out_dir: str | Path) -> dict[str, str]:
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = {}
    for name in corpus.tables:
        p = out / f"{name}.parquet"
        pq.write_table(corpus.to_arrow(name), p)
        paths[name] = str(p)
    return paths
