"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship presence-path query (J4,
PhenoscapeKB.scala:380-389 re-expressed) over sf0.001. ``queries()`` /
``oracle_sql()`` pair every implemented operator from SURVEY.md §2 with a
DuckDB-runnable oracle over the same parquet tables.

All derivations over the driver tables are deterministic SQL-expressible
functions (phenoscape_owl_tools_spark/sources/tpch_kg.py) so the oracle can
recompute them exactly. Float outputs are rounded identically on both sides;
all computed columns are aliased identically.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phenoscape_owl_tools_spark import vocab
from phenoscape_owl_tools_spark.functions import iri as iri_fn
from phenoscape_owl_tools_spark.operators import (
    closure as closure_op,
    components as components_op,
    homology as homology_op,
    mention as mention_op,
    negation as negation_op,
    profiles as profiles_op,
    similarity as similarity_op,
)
from phenoscape_owl_tools_spark.sources import tpch_kg as KG

TERM = KG.TERM
MENTIONS_PRED = vocab.MENTIONS
DOC = "http://kg.example.org/doc/"


def _docs(spark, sf_dir):
    return KG.load(spark, sf_dir, "documents")


def _detected_mentions(spark, sf_dir) -> DataFrame:
    """Real extraction path: span docs + broadcast-trie UDF."""
    flat = _docs(spark, sf_dir)
    spans = KG.span_documents(flat)
    dictionary = KG.terms(flat).select(F.col("label").alias("surface"), "iri")
    return mention_op.detect_mentions(spark, spans, dictionary)


# --------------------------------------------------------------------------
# SQL building blocks shared by the oracles
# --------------------------------------------------------------------------

SQL_WORDS = """
words AS (
  SELECT cast(doc_id AS varchar) AS doc_id, w
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> ''
)"""

SQL_VOCAB = """
vocab AS (
  SELECT w,
         CASE WHEN w < 'g' THEN 'anatomy' WHEN w < 's' THEN 'quality' ELSE 'taxon' END AS ns,
         cast(length(w) AS varchar) AS len
  FROM (SELECT DISTINCT w FROM words)
)"""

SQL_EDGES = """
edges AS (
  SELECT 'http://kg.example.org/term/' || w AS sub,
         'http://kg.example.org/class/' || ns || '/' || len AS sup FROM vocab
  UNION
  SELECT DISTINCT 'http://kg.example.org/class/' || ns || '/' || len,
         'http://kg.example.org/root/' || ns FROM vocab
  UNION
  SELECT DISTINCT 'http://kg.example.org/root/' || ns, 'http://kg.example.org/root' FROM vocab
)"""

SQL_CLOSURE = """
cl(sub, sup) AS (
  SELECT sub, sup FROM edges
  UNION
  SELECT cl.sub, e.sup FROM cl JOIN edges e ON cl.sup = e.sub
)"""

SQL_PREAMBLE = f"WITH RECURSIVE {SQL_WORDS}, {SQL_VOCAB}, {SQL_EDGES}, {SQL_CLOSURE}"


# --------------------------------------------------------------------------
# KG queries
# --------------------------------------------------------------------------

def q_mentions_count(spark, sf_dir) -> DataFrame:
    m = _detected_mentions(spark, sf_dir)
    return m.groupBy("doc_id", "term").agg(F.count("*").alias("n"))


SQL_MENTIONS_COUNT = f"""
WITH {SQL_WORDS}
SELECT doc_id, 'http://kg.example.org/term/' || w AS term, count(*) AS n
FROM words GROUP BY 1, 2
"""


def q_mention_triples(spark, sf_dir) -> DataFrame:
    m = _detected_mentions(spark, sf_dir).withColumn(
        "doc_id", F.concat(F.lit(DOC), F.col("doc_id"))
    )
    return mention_op.mention_triples(m, MENTIONS_PRED)


SQL_MENTION_TRIPLES = f"""
WITH {SQL_WORDS}
SELECT DISTINCT '{DOC}' || doc_id AS subj,
       '{MENTIONS_PRED}' AS pred,
       'http://kg.example.org/term/' || w AS obj
FROM words
"""


def q_subclass_closure(spark, sf_dir) -> DataFrame:
    edges = KG.subclass_edges(_docs(spark, sf_dir))
    return closure_op.transitive_closure(edges)


SQL_SUBCLASS_CLOSURE = SQL_PREAMBLE + "\nSELECT DISTINCT sub, sup FROM cl"


def q_presence(spark, sf_dir) -> DataFrame:
    """Flagship J4: taxon-mention x anatomy-mention co-occurrence, closed
    over subClassOf* — (taxon, has_presence_of, entity-or-ancestor)."""
    flat = _docs(spark, sf_dir)
    m = _detected_mentions(spark, sf_dir)
    terms = KG.terms(flat)
    linked = m.join(
        F.broadcast(terms.select(F.col("iri").alias("term"), "namespace")), on="term"
    )
    taxa = linked.where(F.col("namespace") == "taxon").select("doc_id", F.col("term").alias("taxon"))
    anat = linked.where(F.col("namespace") == "anatomy").select("doc_id", F.col("term").alias("entity"))
    pairs = taxa.join(anat, on="doc_id").select("taxon", "entity").dropDuplicates()
    cl = closure_op.transitive_closure(KG.subclass_edges(flat))
    refl = pairs.select("taxon", F.col("entity").alias("obj")).unionByName(
        pairs.join(cl, pairs["entity"] == cl["sub"]).select("taxon", F.col("sup").alias("obj"))
    )
    return refl.select(
        F.col("taxon").alias("subj"),
        F.lit(vocab.HAS_PRESENCE_OF).alias("pred"),
        F.col("obj"),
    ).dropDuplicates()


SQL_PRESENCE = SQL_PREAMBLE + f""",
linked AS (
  SELECT doc_id, 'http://kg.example.org/term/' || w AS term,
         CASE WHEN w < 'g' THEN 'anatomy' WHEN w < 's' THEN 'quality' ELSE 'taxon' END AS ns
  FROM words
),
pairs AS (
  SELECT DISTINCT t.term AS taxon, a.term AS entity
  FROM linked t JOIN linked a ON t.doc_id = a.doc_id
  WHERE t.ns = 'taxon' AND a.ns = 'anatomy'
)
SELECT DISTINCT taxon AS subj, '{vocab.HAS_PRESENCE_OF}' AS pred, obj
FROM (
  SELECT taxon, entity AS obj FROM pairs
  UNION ALL
  SELECT p.taxon, cl.sup AS obj FROM pairs p JOIN cl ON p.entity = cl.sub
)
"""


def q_absence(spark, sf_dir) -> DataFrame:
    """J5: same co-occurrence carrying the absence marker word."""
    flat = _docs(spark, sf_dir)
    m = _detected_mentions(spark, sf_dir)
    terms = KG.terms(flat)
    linked = m.join(
        F.broadcast(terms.select(F.col("iri").alias("term"), "namespace")), on="term"
    )
    marked = (
        m.where(F.col("term") == TERM + KG.ABSENT_MARKER).select("doc_id").dropDuplicates()
    )
    taxa = linked.where(F.col("namespace") == "taxon").select("doc_id", F.col("term").alias("taxon"))
    anat = linked.where(F.col("namespace") == "anatomy").select("doc_id", F.col("term").alias("entity"))
    return (
        taxa.join(anat, on="doc_id")
        .join(marked, on="doc_id", how="leftsemi")
        .select(
            F.col("taxon").alias("subj"),
            F.lit(vocab.HAS_ABSENCE_OF).alias("pred"),
            F.col("entity").alias("obj"),
        )
        .dropDuplicates()
    )


SQL_ABSENCE = f"""
WITH {SQL_WORDS},
linked AS (
  SELECT doc_id, 'http://kg.example.org/term/' || w AS term,
         CASE WHEN w < 'g' THEN 'anatomy' WHEN w < 's' THEN 'quality' ELSE 'taxon' END AS ns, w
  FROM words
)
SELECT DISTINCT t.term AS subj, '{vocab.HAS_ABSENCE_OF}' AS pred, a.term AS obj
FROM linked t
JOIN linked a ON t.doc_id = a.doc_id
WHERE t.ns = 'taxon' AND a.ns = 'anatomy'
  AND t.doc_id IN (SELECT doc_id FROM words WHERE w = '{KG.ABSENT_MARKER}')
"""


def q_negation_hierarchy(spark, sf_dir) -> DataFrame:
    flat = _docs(spark, sf_dir)
    cl = closure_op.transitive_closure(KG.subclass_edges(flat))
    nodes = cl.select(F.col("sub").alias("c")).unionByName(
        cl.select(F.col("sup").alias("c"))
    ).dropDuplicates()
    negates = nodes.select(iri_fn.negation_class_iri(F.col("c")).alias("n"), "c")
    return negation_op.negation_subclass_axioms(negates, cl)


SQL_NEGATION = SQL_PREAMBLE + f"""
SELECT DISTINCT '{vocab.NOT_PREFIX}' || sup AS sub, '{vocab.NOT_PREFIX}' || sub AS sup
FROM cl WHERE sub <> sup
"""


def q_named_restrictions(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import generators

    anatomy = KG.terms(_docs(spark, sf_dir)).where(F.col("namespace") == "anatomy")
    return generators.named_restrictions(anatomy, [vocab.PART_OF, vocab.HAS_PART])["triples"]


SQL_NAMED_RESTRICTIONS = f"""
WITH {SQL_WORDS}, {SQL_VOCAB},
anat AS (SELECT 'http://kg.example.org/term/' || w AS iri FROM vocab WHERE ns = 'anatomy'),
props AS (SELECT unnest(['{vocab.PART_OF}', '{vocab.HAS_PART}']) AS prop)
SELECT '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectSomeValuesFrom ' || prop || ' ' || iri) AS subj,
       prop || '_some' AS pred, iri AS obj
FROM anat CROSS JOIN props
"""


def q_absence_classes(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import generators

    anatomy = KG.terms(_docs(spark, sf_dir)).where(F.col("namespace") == "anatomy")
    return generators.absence_classes(anatomy)["triples"]


SQL_ABSENCE_CLASSES = f"""
WITH {SQL_WORDS}, {SQL_VOCAB},
anat AS (SELECT 'http://kg.example.org/term/' || w AS iri FROM vocab WHERE ns = 'anatomy')
SELECT '{vocab.NOT_PREFIX}' || '{vocab.EXPRESSION_PREFIX}' ||
         sha256('ObjectSomeValuesFrom {vocab.IMPLIES_PRESENCE_OF} ' || iri) AS subj,
       '{vocab.ABSENCE_OF}' AS pred, iri AS obj
FROM anat
"""


def q_develops_from_gcis(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import generators

    anatomy = KG.terms(_docs(spark, sf_dir)).where(F.col("namespace") == "anatomy")
    return generators.develops_from_rules(anatomy)["gci_edges"]


SQL_DEVELOPS_FROM = f"""
WITH {SQL_WORDS}, {SQL_VOCAB},
anat AS (SELECT 'http://kg.example.org/term/' || w AS iri FROM vocab WHERE ns = 'anatomy'),
inner_r AS (
  SELECT iri,
    '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectSomeValuesFrom {vocab.DEVELOPS_FROM} ' || iri) AS df_inner,
    '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectSomeValuesFrom {vocab.PART_OF} ' || iri) AS po_inner,
    '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectSomeValuesFrom {vocab.HAS_PART} ' || iri) AS hp_e
  FROM anat
)
SELECT '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectSomeValuesFrom {vocab.HAS_PART} ' || df_inner) AS sub, hp_e AS sup FROM inner_r
UNION ALL
SELECT '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectSomeValuesFrom {vocab.HAS_PART} ' || po_inner) AS sub, hp_e AS sup FROM inner_r
"""


def q_connected_components(spark, sf_dir) -> DataFrame:
    eq = KG.equiv_edges(_docs(spark, sf_dir))
    return components_op.connected_components(eq)


SQL_CONNECTED_COMPONENTS = f"""
WITH {SQL_WORDS}, {SQL_VOCAB},
grp AS (
  SELECT 'http://kg.example.org/term/' || w AS node,
         'http://kg.example.org/term/' || min(w) OVER (PARTITION BY ns, len) AS component,
         count(*) OVER (PARTITION BY ns, len) AS grp_size
  FROM vocab
)
SELECT node, component FROM grp WHERE grp_size > 1
"""


def q_canonical_mentions(spark, sf_dir) -> DataFrame:
    triples = q_mention_triples(spark, sf_dir)
    comp = q_connected_components(spark, sf_dir)
    return components_op.canonicalize_triples(triples, comp)


SQL_CANONICAL_MENTIONS = f"""
WITH {SQL_WORDS}, {SQL_VOCAB},
grp AS (
  SELECT 'http://kg.example.org/term/' || w AS node,
         'http://kg.example.org/term/' || min(w) OVER (PARTITION BY ns, len) AS component,
         count(*) OVER (PARTITION BY ns, len) AS grp_size
  FROM vocab
),
comp AS (SELECT node, component FROM grp WHERE grp_size > 1),
triples AS (
  SELECT DISTINCT '{DOC}' || doc_id AS subj, '{MENTIONS_PRED}' AS pred,
         'http://kg.example.org/term/' || w AS obj
  FROM words
)
SELECT DISTINCT coalesce(cs.component, t.subj) AS subj, t.pred AS pred,
       coalesce(co.component, t.obj) AS obj
FROM triples t
LEFT JOIN comp cs ON t.subj = cs.node
LEFT JOIN comp co ON t.obj = co.node
"""


# --------------------------------------------------------------------------
# profile / similarity queries (orders-derived)
# --------------------------------------------------------------------------

def q_gene_profiles(spark, sf_dir) -> DataFrame:
    ann = KG.gene_annotations(KG.load(spark, sf_dir, "orders"))
    return profiles_op.gene_profiles(ann)


SQL_GENE_PROFILES = f"""
WITH base AS (
  SELECT DISTINCT 'http://kg.example.org/gene/' || cast(o_custkey AS varchar) AS gene,
         'http://kg.example.org/ph/' || o_orderpriority AS ph
  FROM orders
)
SELECT gene || '#profile' AS subj, '{vocab.RDF_TYPE}' AS pred, ph AS obj FROM base
UNION
SELECT DISTINCT gene AS subj, '{vocab.HAS_PHENOTYPIC_PROFILE}' AS pred, gene || '#profile' AS obj FROM base
"""


def q_profile_sizes(spark, sf_dir) -> DataFrame:
    return profiles_op.profile_sizes(q_gene_profiles(spark, sf_dir))


SQL_PROFILE_SIZES = """
SELECT gene || '#profile' AS profile, count(DISTINCT ph) AS n_annotations
FROM (
  SELECT 'http://kg.example.org/gene/' || cast(o_custkey AS varchar) AS gene,
         'http://kg.example.org/ph/' || o_orderpriority AS ph
  FROM orders
)
GROUP BY 1
"""


def _order_profiles(spark, sf_dir):
    orders = KG.load(spark, sf_dir, "orders")
    return orders.select(
        F.concat(F.lit("http://kg.example.org/gene/"), F.col("o_custkey").cast("string")).alias("individual"),
        F.concat(F.lit("http://kg.example.org/ph/"), F.col("o_orderpriority")).alias("phenotype"),
        F.col("o_custkey").alias("custkey"),
    ).dropDuplicates()


PH_ROOT = "http://kg.example.org/ph-root"


def _ph_closure(spark, sf_dir):
    profs = _order_profiles(spark, sf_dir)
    return profs.select(F.col("phenotype").alias("sub")).dropDuplicates().select(
        "sub", F.lit(PH_ROOT).alias("sup")
    )


def q_ic_scores(spark, sf_dir) -> DataFrame:
    profs = _order_profiles(spark, sf_dir)
    corpus = profs.where(F.col("custkey") % 2 == 0).select("individual").dropDuplicates()
    cl = _ph_closure(spark, sf_dir)
    ind = similarity_op.indirect_associations(profs.select("individual", "phenotype"), cl)
    ic = similarity_op.information_content(ind, corpus, cl)
    return ic.select("node", "freq", (F.round(F.col("ic") + F.lit(0.0), 6)).alias("ic_r"))


SQL_IC_SCORES = f"""
WITH profs AS (
  SELECT DISTINCT 'http://kg.example.org/gene/' || cast(o_custkey AS varchar) AS individual,
         'http://kg.example.org/ph/' || o_orderpriority AS phenotype, o_custkey AS custkey
  FROM orders
),
corpus AS (SELECT DISTINCT individual FROM profs WHERE custkey % 2 = 0),
nodes AS (
  SELECT individual, phenotype AS node FROM profs
  UNION
  SELECT individual, '{PH_ROOT}' AS node FROM profs
),
n AS (SELECT count(*) AS corpus_size FROM corpus),
freqs AS (
  SELECT node, count(DISTINCT nodes.individual) AS freq
  FROM nodes JOIN corpus ON nodes.individual = corpus.individual
  GROUP BY node
),
allnodes AS (SELECT DISTINCT node FROM nodes)
SELECT a.node AS node, coalesce(f.freq, 0) AS freq,
       round(CASE WHEN coalesce(f.freq, 0) > 0
             THEN (-log2(cast(f.freq AS double) / corpus_size)) / log2(cast(corpus_size AS double))
             ELSE coalesce((SELECT (-log2(cast(fr.freq AS double) / corpus_size)) / log2(cast(corpus_size AS double))
                            FROM freqs fr WHERE fr.node = '{PH_ROOT}' AND a.node <> '{PH_ROOT}'), 1.0)
             END + 0.0, 6) AS ic_r
FROM allnodes a CROSS JOIN n LEFT JOIN freqs f ON a.node = f.node
"""


def q_pairwise_similarity(spark, sf_dir) -> DataFrame:
    profs = _order_profiles(spark, sf_dir)
    small = profs.where(F.col("custkey") < 120)
    q = small.where(F.col("custkey") % 2 == 1).select("individual", "phenotype")
    c = small.where(F.col("custkey") % 2 == 0).select("individual", "phenotype")
    corpus_inds = profs.where(F.col("custkey") % 2 == 0).select("individual").dropDuplicates()
    cl = _ph_closure(spark, sf_dir)
    ind = similarity_op.indirect_associations(profs.select("individual", "phenotype"), cl)
    ic = similarity_op.information_content(ind, corpus_inds, cl)
    pas = similarity_op.pairwise_scores(q, c, cl, ic)
    med = similarity_op.groupwise_median(pas)
    return med.select(
        "query", "corpus", F.round(F.col("score") + F.lit(0.0), 6).alias("score_r")
    )


SQL_PAIRWISE = f"""
WITH profs AS (
  SELECT DISTINCT 'http://kg.example.org/gene/' || cast(o_custkey AS varchar) AS individual,
         'http://kg.example.org/ph/' || o_orderpriority AS phenotype, o_custkey AS custkey
  FROM orders
),
corpus_inds AS (SELECT DISTINCT individual FROM profs WHERE custkey % 2 = 0),
n AS (SELECT count(*) AS corpus_size FROM corpus_inds),
nodes AS (
  SELECT individual, phenotype AS node FROM profs
  UNION SELECT individual, '{PH_ROOT}' FROM profs
),
freqs AS (
  SELECT node, count(DISTINCT nodes.individual) AS freq
  FROM nodes JOIN corpus_inds ON nodes.individual = corpus_inds.individual GROUP BY node
),
ic AS (
  SELECT node, (-log2(cast(freq AS double) / corpus_size)) / log2(cast(corpus_size AS double)) AS ic
  FROM freqs CROSS JOIN n
),
small AS (SELECT * FROM profs WHERE custkey < 120),
q AS (SELECT individual, phenotype FROM small WHERE custkey % 2 = 1),
c AS (SELECT individual, phenotype FROM small WHERE custkey % 2 = 0),
-- common reflexive subsumers of (qa, ca): the shared phenotype, or the root
pair_ann AS (
  SELECT q.individual AS query, c.individual AS corpus, q.phenotype AS qa,
         max(CASE WHEN q.phenotype = c.phenotype
                  THEN (SELECT ic FROM ic WHERE node = q.phenotype)
                  ELSE (SELECT ic FROM ic WHERE node = '{PH_ROOT}') END) AS max_ic
  FROM q CROSS JOIN c
  GROUP BY 1, 2, 3
)
SELECT query, corpus, round(median(max_ic) + 0.0, 6) AS score_r
FROM pair_ann GROUP BY 1, 2
"""


def q_evolutionary_profiles(spark, sf_dir) -> DataFrame:
    """A1 over the customer->nation->region tree; no SQL oracle (iterative
    Fitch; rows-only check — full oracle coverage lives in pytest)."""
    nation = KG.load(spark, sf_dir, "nation")
    region = KG.load(spark, sf_dir, "region")
    customer = KG.load(spark, sf_dir, "customer")
    orders = KG.load(spark, sf_dir, "orders")
    cust = F.concat(F.lit("c:"), F.col("c_custkey").cast("string"))
    edges = (
        customer.select(cust.alias("child"), F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("parent"))
        .unionByName(nation.select(F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("child"),
                                   F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("parent")))
        .unionByName(region.select(F.concat(F.lit("r:"), F.col("r_regionkey").cast("string")).alias("child"),
                                   F.lit("root").alias("parent")))
    )
    assoc = orders.select(
        F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("taxon"),
        F.col("o_orderstatus").alias("character"),
        F.col("o_orderpriority").alias("state"),
    ).dropDuplicates()
    _, prof = profiles_op.evolutionary_profiles(edges, assoc)
    sp = assoc.select("state", F.concat(F.lit("ph:"), F.col("state")).alias("phenotype")).dropDuplicates()
    return profiles_op.profile_triples(prof, sp)


def q_homology(spark, sf_dir) -> DataFrame:
    part = KG.load(spark, sf_dir, "part")
    hom = part.select(
        F.concat(F.lit("http://kg.example.org/part/"), F.col("p_partkey").cast("string")).alias("structure1"),
        F.lit("http://kg.example.org/taxon/1").alias("taxon1"),
        F.when(F.col("p_partkey") % 3 == 0, "not hom to")
        .when(F.col("p_partkey") % 3 == 1, "hom to")
        .otherwise("ser hom to").alias("relation"),
        F.concat(F.lit("http://kg.example.org/part/"), (F.col("p_partkey") + 1).cast("string")).alias("structure2"),
        F.lit("http://kg.example.org/taxon/2").alias("taxon2"),
        F.lit(None).cast("string").alias("evidence_code"),
        F.concat(F.lit("PMID:"), F.col("p_partkey").cast("string")).alias("publication"),
    )
    return homology_op.homology_axioms(hom)


SQL_HOMOLOGY = f"""
WITH h AS (
  SELECT 'http://kg.example.org/part/' || cast(p_partkey AS varchar) AS s1,
         'http://kg.example.org/taxon/1' AS t1,
         CASE WHEN p_partkey % 3 = 0 THEN 'not hom to'
              WHEN p_partkey % 3 = 1 THEN 'hom to' ELSE 'ser hom to' END AS rel,
         'http://kg.example.org/part/' || cast(p_partkey + 1 AS varchar) AS s2,
         'http://kg.example.org/taxon/2' AS t2
  FROM part
),
e AS (
  SELECT *,
   '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectIntersectionOf ' || s1 || ' ObjectSomeValuesFrom {vocab.IN_TAXON} ' || t1) AS e1,
   '{vocab.EXPRESSION_PREFIX}' || sha256('ObjectIntersectionOf ' || s2 || ' ObjectSomeValuesFrom {vocab.IN_TAXON} ' || t2) AS e2,
   CASE WHEN rel IN ('hom to', 'not hom to') THEN '{homology_op.IN_HISTORICAL_HOMOLOGY}'
        ELSE '{homology_op.SERIALLY_HOMOLOGOUS_TO}' END AS prop,
   rel LIKE 'not %' AS negated
  FROM h
)
SELECT DISTINCT subj, pred, obj FROM (
  SELECT e1 AS subj, prop AS pred, e2 AS obj FROM e WHERE NOT negated
  UNION ALL SELECT e2, prop, e1 FROM e WHERE NOT negated
  UNION ALL SELECT e1, '{vocab.RDFS_SUBCLASS_OF}', s1 FROM e
  UNION ALL SELECT e1, '{vocab.IN_TAXON}', t1 FROM e
  UNION ALL SELECT e2, '{vocab.RDFS_SUBCLASS_OF}', s2 FROM e
  UNION ALL SELECT e2, '{vocab.IN_TAXON}', t2 FROM e
)
"""


def q_taxonomy_depths(spark, sf_dir) -> DataFrame:
    nation = KG.load(spark, sf_dir, "nation")
    region = KG.load(spark, sf_dir, "region")
    customer = KG.load(spark, sf_dir, "customer")
    edges = (
        customer.select(F.concat(F.lit("c:"), F.col("c_custkey").cast("string")).alias("child"),
                        F.concat(F.lit("n:"), F.col("c_nationkey").cast("string")).alias("parent"))
        .unionByName(nation.select(F.concat(F.lit("n:"), F.col("n_nationkey").cast("string")).alias("child"),
                                   F.concat(F.lit("r:"), F.col("n_regionkey").cast("string")).alias("parent")))
        .unionByName(region.select(F.concat(F.lit("r:"), F.col("r_regionkey").cast("string")).alias("child"),
                                   F.lit("root").alias("parent")))
    )
    return profiles_op.taxonomy_depths(edges)


SQL_TAXONOMY_DEPTHS = """
SELECT 'root' AS n, 0 AS depth
UNION ALL SELECT DISTINCT 'r:' || cast(r_regionkey AS varchar), 1 FROM region
UNION ALL SELECT DISTINCT 'n:' || cast(n_nationkey AS varchar), 2 FROM nation
UNION ALL SELECT DISTINCT 'c:' || cast(c_custkey AS varchar), 3 FROM customer
"""


# --------------------------------------------------------------------------
# text analysis over documents
# --------------------------------------------------------------------------

def q_token_count(spark, sf_dir) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tokens"),
    )


SQL_TOKEN_COUNT = """
SELECT cast(doc_id AS varchar) AS doc_id, cast(len(string_split(text, ' ')) AS bigint) AS n_tokens
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.sha2(F.lower(F.col("text")), 256).alias("fp"),
    )


SQL_DOC_FINGERPRINT = """
SELECT cast(doc_id AS varchar) AS doc_id, sha256(lower(text)) AS fp FROM documents
"""


def q_stopword_ratio(spark, sf_dir) -> DataFrame:
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    stop = F.size(F.filter(toks, lambda t: t.isin("the", "a")))
    return d.select(
        F.col("doc_id").cast("string").alias("doc_id"),
        F.round(stop / F.size(toks) + F.lit(0.0), 6).alias("stop_ratio"),
    )


SQL_STOPWORD_RATIO = """
SELECT cast(doc_id AS varchar) AS doc_id,
       round(cast(len(list_filter(string_split(text, ' '), t -> t IN ('the', 'a'))) AS double)
             / len(string_split(text, ' ')) + 0.0, 6) AS stop_ratio
FROM documents
"""


# --------------------------------------------------------------------------
# training-data pipeline: dedup / ANN / text stats / multimodal
# --------------------------------------------------------------------------

def q_dedup_exact(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import dedup

    return dedup.exact_dedup(_docs(spark, sf_dir))


SQL_DEDUP_EXACT = """
WITH fp AS (
  SELECT cast(doc_id AS varchar) AS doc_id, sha256(lower(text)) AS fp FROM documents
)
SELECT doc_id, fp,
       min(doc_id) OVER (PARTITION BY fp) AS keep_id,
       (count(*) OVER (PARTITION BY fp)) > 1 AS is_dup_group
FROM fp
"""


SQL_SHINGLES_CTE = """
d AS (SELECT cast(doc_id AS varchar) AS doc_id, string_split(text, ' ') AS ws FROM documents),
idx AS (SELECT doc_id, ws, unnest(range(1, greatest(len(ws) - 1, 2))) AS i FROM d),
sh AS (SELECT DISTINCT doc_id, array_to_string(ws[i:i+2], ' ') AS shingle FROM idx WHERE array_to_string(ws[i:i+2], ' ') <> ''),
sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1)
"""

SQL_JACCARD_VERIFY = """
jac AS (
  SELECT c.doc_a, c.doc_b,
         round(cast(count(*) AS double) / (any_value(sa.n) + any_value(sb.n) - count(*)), 6) AS jaccard
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  JOIN sz sa ON sa.doc_id = c.doc_a
  JOIN sz sb ON sb.doc_id = c.doc_b
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, jaccard FROM jac WHERE jaccard >= 0.2
"""


def q_dedup_ngram_jaccard(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import dedup

    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.2)


SQL_DEDUP_NGRAM_JACCARD = f"""
WITH {SQL_SHINGLES_CTE},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
),
{SQL_JACCARD_VERIFY}
"""


_MINHASH_K = 8


def q_dedup_minhash_lsh(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import dedup

    return dedup.minhash_lsh_dedup(
        _docs(spark, sf_dir), n=3, k=_MINHASH_K, rows_per_band=2, threshold=0.2
    )


_mh_aggs = ",\n  ".join(
    f"min(sha256('{i}:' || shingle)) AS mh{i}" for i in range(_MINHASH_K)
)
_band_selects = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, sha256(mh{2*b} || mh{2*b+1}) AS bkey FROM sig"
    for b in range(_MINHASH_K // 2)
)

SQL_DEDUP_MINHASH_LSH = f"""
WITH {SQL_SHINGLES_CTE},
sig AS (SELECT doc_id,
  {_mh_aggs}
  FROM sh GROUP BY 1),
bands AS (
  {_band_selects}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
),
{SQL_JACCARD_VERIFY}
"""


_SIMHASH_BITS = 8


def q_dedup_simhash(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import dedup

    return dedup.simhash(_docs(spark, sf_dir), bits=_SIMHASH_BITS)


_sim_bit_aggs = ",\n  ".join(
    f"sum(CASE WHEN substr(hx, {p + 1}, 1) IN ('8','9','a','b','c','d','e','f') THEN 1 ELSE 0 END) AS b{p}"
    for p in range(_SIMHASH_BITS)
)
_sim_cat = " || ".join(
    f"(CASE WHEN b{p} * 2 > n THEN '1' ELSE '0' END)" for p in range(_SIMHASH_BITS)
)

SQL_DEDUP_SIMHASH = f"""
WITH w AS (
  SELECT DISTINCT cast(doc_id AS varchar) AS doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
h AS (SELECT doc_id, sha256(tok) AS hx FROM w WHERE tok <> ''),
bits AS (SELECT doc_id, count(*) AS n,
  {_sim_bit_aggs}
  FROM h GROUP BY 1)
SELECT doc_id, {_sim_cat} AS simhash FROM bits
"""


SQL_COS = """round(
  list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS double) * CAST({b}[i] AS double)))
  / (sqrt(list_sum(list_transform(range(1, len({a}) + 1), i -> CAST({a}[i] AS double) * CAST({a}[i] AS double))))
   * sqrt(list_sum(list_transform(range(1, len({b}) + 1), i -> CAST({b}[i] AS double) * CAST({b}[i] AS double))))), 6)"""


def q_dedup_embedding_cosine(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import dedup

    return dedup.embedding_near_dups(KG.load(spark, sf_dir, "embeddings"), threshold=0.4)


SQL_DEDUP_EMBEDDING = f"""
SELECT * FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {SQL_COS.format(a="a.embedding", b="b.embedding")} AS cos
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
) WHERE cos >= 0.4
"""


def _ann_queries(spark, sf_dir):
    emb = KG.load(spark, sf_dir, "embeddings")
    return emb, emb.where(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def q_ann_cosine_topk(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import annsearch

    emb, q = _ann_queries(spark, sf_dir)
    r = annsearch.brute_force_topk(emb, q, k=5)
    return r.select("query_id", "neighbor_id", "cos", F.col("rank").alias("rnk"))


SQL_ANN_COSINE_TOPK = f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 16),
scored AS (
  SELECT query_id, c.vec_id AS neighbor_id,
         {SQL_COS.format(a="qe", b="c.embedding")} AS cos
  FROM q JOIN embeddings c ON c.vec_id <> q.query_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
SELECT query_id, neighbor_id, cos, CAST(rn AS integer) AS rnk FROM r WHERE rn <= 5
"""


_LSH_DIMS = (1, 8, 16, 24)


def q_ann_lsh_topk(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import annsearch

    emb, q = _ann_queries(spark, sf_dir)
    r = annsearch.bucket_lsh_topk(emb, q, k=5, dims=_LSH_DIMS)
    return r.select("query_id", "neighbor_id", "cos", F.col("rank").alias("rnk"))


_sql_bucket = " || ".join(
    f"(CASE WHEN CAST({{e}}[{d}] AS double) >= 0 THEN '1' ELSE '0' END)" for d in _LSH_DIMS
)

SQL_ANN_LSH_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qe, {_sql_bucket.format(e="embedding")} AS bucket
  FROM embeddings WHERE vec_id < 16
),
c AS (
  SELECT vec_id AS neighbor_id, embedding AS ce, {_sql_bucket.format(e="embedding")} AS bucket
  FROM embeddings
),
scored AS (
  SELECT query_id, neighbor_id, {SQL_COS.format(a="qe", b="ce")} AS cos
  FROM q JOIN c ON q.bucket = c.bucket AND q.query_id <> c.neighbor_id
),
r AS (SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn FROM scored)
SELECT query_id, neighbor_id, cos, CAST(rn AS integer) AS rnk FROM r WHERE rn <= 5
"""


def q_language_id(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import textstats

    return textstats.language_id(_docs(spark, sf_dir))


def _sql_lang_score(markers) -> str:
    terms = " + ".join(
        f"(length(p) - length(replace(p, '{m}', ''))) / {len(m)}" for m in markers
    )
    return f"({terms})"


def _sql_language_id() -> str:
    from phenoscape_owl_tools_spark.operators.textstats import LANG_PROFILES

    langs = sorted(LANG_PROFILES)
    scores = {lang: _sql_lang_score(LANG_PROFILES[lang]) for lang in langs}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    pred = "'und'"
    for lang in reversed(langs):
        pred = f"CASE WHEN best > 0 AND {scores[lang]} = best THEN '{lang}' ELSE {pred} END"
    return f"""
WITH padded AS (SELECT cast(doc_id AS varchar) AS doc_id, ' ' || text || ' ' AS p FROM documents),
b AS (SELECT doc_id, p, {best} AS best FROM padded)
SELECT doc_id, {pred} AS pred_lang, round(best, 2) AS score FROM b
"""


SQL_LANGUAGE_ID = _sql_language_id()


def q_quality_score(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import textstats

    return textstats.quality_score(_docs(spark, sf_dir))


SQL_QUALITY_SCORE = """
WITH t AS (
  SELECT cast(doc_id AS varchar) AS doc_id, text, string_split(text, ' ') AS toks,
         regexp_replace(text, '[A-Za-z0-9 ]', '', 'g') AS stripped
  FROM documents
),
m AS (
  SELECT doc_id,
         cast(len(toks) AS bigint) AS n_tokens,
         cast(len(list_filter(toks, x -> x IN ('the', 'a', 'and', 'of'))) AS double) / len(toks) AS stop_ratio,
         cast(length(stripped) AS double) / length(text) AS punct_ratio
  FROM t
)
SELECT doc_id, n_tokens, round(stop_ratio, 6) AS stop_ratio,
       round(least(1.0, n_tokens / 50.0) * (1.0 - stop_ratio) * (1.0 - punct_ratio), 6) AS q
FROM m
"""


def q_bpe_token_count(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import textstats

    return textstats.bpe_token_count(_docs(spark, sf_dir))


SQL_BPE_TOKEN_COUNT = """
SELECT cast(doc_id AS varchar) AS doc_id,
       cast(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]')) AS bigint) AS n_bpe_tokens
FROM documents
"""


def q_rolling_fingerprint(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import textstats

    return textstats.rolling_fingerprint(_docs(spark, sf_dir), window=5)


SQL_ROLLING_FINGERPRINT = """
WITH g AS (
  SELECT cast(doc_id AS varchar) AS doc_id, text,
         unnest(range(1, greatest(length(text) - 4, 1) + 1)) AS i
  FROM documents
)
SELECT doc_id, min(sha256(substr(text, i, 5))) AS fp FROM g GROUP BY 1
"""


def q_media_features(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import multimodal
    from phenoscape_owl_tools_spark.sources.documents import media_spans

    spans = KG.span_documents(_docs(spark, sf_dir))
    feats = multimodal.extract_media_features(media_spans(spans))
    return feats.select(
        "doc_id", "media_ref",
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_frames").cast("long").alias("n_frames"),
        "feature_sig",
    )


SQL_MEDIA_FEATURES = """
WITH m AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         'http://media.example.org/' || cast(doc_id AS varchar) || '.bin' AS media_ref
  FROM documents WHERE source = 'src2'
),
h AS (SELECT doc_id, media_ref, sha256(media_ref) AS hx FROM m)
SELECT doc_id, media_ref,
       32 * instr('0123456789abcdef', substr(hx, 1, 1)) AS width,
       32 * instr('0123456789abcdef', substr(hx, 2, 1)) AS height,
       instr('0123456789abcdef', substr(hx, 3, 1)) AS n_frames,
       substr(hx, 1, 16) AS feature_sig
FROM h
"""


def q_frame_samples(spark, sf_dir) -> DataFrame:
    from phenoscape_owl_tools_spark.operators import multimodal
    from phenoscape_owl_tools_spark.sources.documents import media_spans

    spans = KG.span_documents(_docs(spark, sf_dir))
    feats = multimodal.extract_media_features(media_spans(spans))
    samples = multimodal.frame_sample_refs(feats, stride=2)
    return samples.select(
        "doc_id", "media_ref", F.col("frame_idx").cast("long").alias("frame_idx")
    )


SQL_FRAME_SAMPLES = """
WITH m AS (
  SELECT cast(doc_id AS varchar) AS doc_id,
         'http://media.example.org/' || cast(doc_id AS varchar) || '.bin' AS media_ref
  FROM documents WHERE source = 'src2'
),
h AS (SELECT doc_id, media_ref,
             instr('0123456789abcdef', substr(sha256(media_ref), 3, 1)) AS n_frames
      FROM m)
SELECT doc_id, media_ref, unnest(range(0, n_frames, 2)) AS frame_idx FROM h
"""


# --------------------------------------------------------------------------
# TPC-H anchors + events
# --------------------------------------------------------------------------

def q_tpch_q1(spark, sf_dir) -> DataFrame:
    li = KG.load(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity") + F.lit(0.0), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice") + F.lit(0.0), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(0.0), 2).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


SQL_TPCH_Q1 = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity) + 0.0, 2) AS sum_qty,
       round(sum(l_extendedprice) + 0.0, 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)) + 0.0, 2) AS sum_disc_price,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= '1998-09-02'
GROUP BY 1, 2
"""


def q_tpch_q3(spark, sf_dir) -> DataFrame:
    cust = KG.load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = KG.load(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1995-03-15"))
    li = KG.load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))) + F.lit(0.0), 2).alias("revenue"))
        .select(
            F.col("l_orderkey"),
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
            "revenue",
        )
    )


SQL_TPCH_Q3 = """
SELECT l_orderkey, cast(o_orderdate AS varchar) AS o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)) + 0.0, 2) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING' AND o_orderdate < '1995-03-15' AND l_shipdate > '1995-03-15'
GROUP BY 1, 2, 3
"""


def q_tpch_q6(spark, sf_dir) -> DataFrame:
    li = KG.load(spark, sf_dir, "lineitem")
    return (
        li.where(
            (F.col("l_shipdate") >= F.lit("1994-01-01"))
            & (F.col("l_shipdate") < F.lit("1995-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")) + F.lit(0.0), 2).alias("revenue"))
    )


SQL_TPCH_Q6 = """
SELECT round(sum(l_extendedprice * l_discount) + 0.0, 2) AS revenue
FROM lineitem
WHERE l_shipdate >= '1994-01-01' AND l_shipdate < '1995-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def q_events_hourly(spark, sf_dir) -> DataFrame:
    ev = KG.load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("value") + F.lit(0.0), 4).alias("avg_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n, round(avg(value) + 0.0, 4) AS avg_value
FROM events GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# contract surface
# --------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: presence-path query (J4) over sf0.001."""
    return q_presence(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "mentions_count": q_mentions_count,
        "mention_triples": q_mention_triples,
        "subclass_closure": q_subclass_closure,
        "presence_query": q_presence,
        "absence_query": q_absence,
        "negation_hierarchy": q_negation_hierarchy,
        "named_restrictions": q_named_restrictions,
        "absence_classes": q_absence_classes,
        "develops_from_gcis": q_develops_from_gcis,
        "connected_components": q_connected_components,
        "canonical_mentions": q_canonical_mentions,
        "gene_profiles": q_gene_profiles,
        "profile_sizes": q_profile_sizes,
        "taxonomy_depths": q_taxonomy_depths,
        "evolutionary_profiles": q_evolutionary_profiles,
        "homology_axioms": q_homology,
        "ic_scores": q_ic_scores,
        "pairwise_similarity": q_pairwise_similarity,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "stopword_ratio": q_stopword_ratio,
        "dedup_exact": q_dedup_exact,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_simhash": q_dedup_simhash,
        "dedup_embedding_cosine": q_dedup_embedding_cosine,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "language_id": q_language_id,
        "quality_score": q_quality_score,
        "bpe_token_count": q_bpe_token_count,
        "rolling_fingerprint": q_rolling_fingerprint,
        "media_features": q_media_features,
        "frame_samples": q_frame_samples,
        "tpch_q1": q_tpch_q1,
        "tpch_q3": q_tpch_q3,
        "tpch_q6": q_tpch_q6,
        "events_hourly": q_events_hourly,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "mentions_count": SQL_MENTIONS_COUNT,
        "mention_triples": SQL_MENTION_TRIPLES,
        "subclass_closure": SQL_SUBCLASS_CLOSURE,
        "presence_query": SQL_PRESENCE,
        "absence_query": SQL_ABSENCE,
        "negation_hierarchy": SQL_NEGATION,
        "named_restrictions": SQL_NAMED_RESTRICTIONS,
        "absence_classes": SQL_ABSENCE_CLASSES,
        "develops_from_gcis": SQL_DEVELOPS_FROM,
        "connected_components": SQL_CONNECTED_COMPONENTS,
        "canonical_mentions": SQL_CANONICAL_MENTIONS,
        "gene_profiles": SQL_GENE_PROFILES,
        "profile_sizes": SQL_PROFILE_SIZES,
        "taxonomy_depths": SQL_TAXONOMY_DEPTHS,
        # evolutionary_profiles: iterative Fitch — not SQL-expressible;
        # rows-only check here, full oracle coverage in tests/test_profiles.py
        "homology_axioms": SQL_HOMOLOGY,
        "ic_scores": SQL_IC_SCORES,
        "pairwise_similarity": SQL_PAIRWISE,
        "token_count": SQL_TOKEN_COUNT,
        "doc_fingerprint": SQL_DOC_FINGERPRINT,
        "stopword_ratio": SQL_STOPWORD_RATIO,
        "dedup_exact": SQL_DEDUP_EXACT,
        "dedup_ngram_jaccard": SQL_DEDUP_NGRAM_JACCARD,
        "dedup_minhash_lsh": SQL_DEDUP_MINHASH_LSH,
        "dedup_simhash": SQL_DEDUP_SIMHASH,
        "dedup_embedding_cosine": SQL_DEDUP_EMBEDDING,
        "ann_cosine_topk": SQL_ANN_COSINE_TOPK,
        "ann_lsh_topk": SQL_ANN_LSH_TOPK,
        "language_id": SQL_LANGUAGE_ID,
        "quality_score": SQL_QUALITY_SCORE,
        "bpe_token_count": SQL_BPE_TOKEN_COUNT,
        "rolling_fingerprint": SQL_ROLLING_FINGERPRINT,
        "media_features": SQL_MEDIA_FEATURES,
        "frame_samples": SQL_FRAME_SAMPLES,
        "tpch_q1": SQL_TPCH_Q1,
        "tpch_q3": SQL_TPCH_Q3,
        "tpch_q6": SQL_TPCH_Q6,
        "events_hourly": SQL_EVENTS_HOURLY,
    }
