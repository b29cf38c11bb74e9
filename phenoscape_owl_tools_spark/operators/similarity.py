"""OWLsim semantic-similarity layer (SURVEY.md A3-A5, J9-J10, W1-W2).

Re-expression of sim/OWLsim.scala over DataFrames:

- association accumulation up the DAG (A3, :212-225) = profiles joined with
  the reflexive subclass closure, grouped per node;
- IC (A4, :80-92, 242-262): normalizedIC(freq) = -log2(freq/corpus)/MaxIC,
  MaxIC = -log2(1/corpus); zero-frequency nodes inherit the max parent IC —
  by monotonicity (frequency is non-decreasing upward) that equals the IC of
  the smallest positive ancestor frequency, so the reference's recursive
  traversal becomes one join + min;
- pairwise scores (J9/A5, :272-306): per (query, corpus, query-annotation),
  the max common-subsumer IC (MICA) over all corpus annotations; the pair
  score is the **exact median** (incl. even-size average, :303-306) of those
  maxima — ``percentile``, never ``percentile_approx``;
- top-20 subsumers per pair (W1, :381) = window row_number;
- Jaccard (J10, :289-293) = ancestor-set intersection/union counts.

The reference shards the cartesian product over 100 SLURM JVMs
(RunPairwiseOWLSim.scala:40-46); here the "cartesian" is a join on the
shared-ancestor block key — pairs that share no subsumer never materialize,
and Spark partitioning replaces manual sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from phenoscape_owl_tools_spark import vocab


def reflexive_ancestors(closure: DataFrame, nodes: DataFrame) -> DataFrame:
    """(node, ancestor) incl. self, from a (sub, sup) closure table."""
    proper = closure.select(F.col("sub").alias("node"), F.col("sup").alias("ancestor"))
    selfs = nodes.select(F.col("node")).dropDuplicates().select(
        "node", F.col("node").alias("ancestor")
    )
    return proper.unionByName(selfs).dropDuplicates()


def indirect_associations(profiles: DataFrame, closure: DataFrame) -> DataFrame:
    """A3 — (individual, node): every reflexive ancestor of every direct
    annotation (OWLsim.scala:212-225 accumulateAssociations)."""
    anc = reflexive_ancestors(
        closure, profiles.select(F.col("phenotype").alias("node"))
    )
    return (
        profiles.join(anc, profiles["phenotype"] == anc["node"])
        .select("individual", F.col("ancestor").alias("node"))
        .dropDuplicates()
    )


def information_content(
    indirect: DataFrame,
    corpus_individuals: DataFrame,
    closure: DataFrame,
) -> DataFrame:
    """A4 — (node, freq, ic). ``corpus_individuals(individual)`` defines the
    corpus (reference: IRI prefix convention, ComputeICs.scala:19-23)."""
    corpus = F.broadcast(corpus_individuals.select("individual").dropDuplicates())
    corpus_size = corpus.count()
    in_corpus = indirect.join(corpus, on="individual", how="leftsemi")
    freqs = in_corpus.groupBy("node").agg(F.countDistinct("individual").alias("freq"))

    max_ic = F.log2(F.lit(float(corpus_size)))  # -log2(1/N)
    nodes = indirect.select("node").dropDuplicates()
    freqs = nodes.join(freqs, on="node", how="left").fillna(0, subset=["freq"])

    # zero-freq fallback: IC of the smallest positive ancestor frequency
    pos = freqs.where(F.col("freq") > 0).select(
        F.col("node").alias("anc_node"), F.col("freq").alias("anc_freq")
    )
    anc = closure.select(F.col("sub").alias("node"), F.col("sup").alias("ancestor"))
    min_anc_freq = (
        anc.join(pos, anc["ancestor"] == pos["anc_node"])
        .groupBy("node")
        .agg(F.min("anc_freq").alias("min_pos_anc_freq"))
    )
    out = freqs.join(min_anc_freq, on="node", how="left").select(
        "node",
        "freq",
        F.when(
            F.col("freq") > 0,
            (-F.log2(F.col("freq") / F.lit(float(corpus_size)))) / max_ic,
        )
        .otherwise(
            F.coalesce(
                (-F.log2(F.col("min_pos_anc_freq") / F.lit(float(corpus_size)))) / max_ic,
                F.lit(1.0),
            )
        )
        .alias("ic"),
    )
    return out


def pairwise_scores(
    query_profiles: DataFrame,
    corpus_profiles: DataFrame,
    closure: DataFrame,
    ic: DataFrame,
) -> DataFrame:
    """J9/A5 — (query, corpus, score, ...) group-wise similarity.

    Returns per-pair rows with the exact-median score plus per-annotation
    best subsumers for the top-k emitter.
    """
    q_anc = (
        query_profiles.join(
            reflexive_ancestors(closure, query_profiles.select(F.col("phenotype").alias("node"))),
            query_profiles["phenotype"] == F.col("node"),
        )
        .select(
            F.col("individual").alias("query"),
            F.col("phenotype").alias("qa"),
            F.col("ancestor").alias("anc"),
        )
    )
    c_anc = (
        corpus_profiles.join(
            reflexive_ancestors(closure, corpus_profiles.select(F.col("phenotype").alias("node"))),
            corpus_profiles["phenotype"] == F.col("node"),
        )
        .select(
            F.col("individual").alias("corpus"),
            F.col("ancestor").alias("anc2"),
        )
        .dropDuplicates()
    )
    ic_b = F.broadcast(ic.select(F.col("node").alias("ic_node"), "ic"))
    joined = (
        q_anc.join(c_anc, q_anc["anc"] == c_anc["anc2"])
        .join(ic_b, F.col("anc") == F.col("ic_node"))
        .groupBy("query", "corpus", "qa")
        .agg(F.max(F.struct(F.col("ic"), F.col("anc"))).alias("best"))
        .select(
            "query",
            "corpus",
            "qa",
            F.col("best.ic").alias("max_subsumer_ic"),
            F.col("best.anc").alias("max_subsumer"),
        )
    )
    return joined


def groupwise_median(pair_annotation_scores: DataFrame) -> DataFrame:
    """W2 — exact median per (query, corpus) (OWLsim.scala:303-306)."""
    return pair_annotation_scores.groupBy("query", "corpus").agg(
        F.expr("percentile(max_subsumer_ic, 0.5)").alias("score")
    )


def top_subsumers(pair_annotation_scores: DataFrame, k: int = 20) -> DataFrame:
    """W1 — per pair, subsumers of the k best annotation scores with ic > 0
    (OWLsim.scala:381)."""
    w = Window.partitionBy("query", "corpus").orderBy(
        F.desc("max_subsumer_ic"), F.asc("qa")
    )
    return (
        pair_annotation_scores.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= k) & (F.col("max_subsumer_ic") > 0))
        .select("query", "corpus", "max_subsumer", "max_subsumer_ic")
        .dropDuplicates()
    )


def jaccard_similarity(
    query_profiles: DataFrame,
    corpus_profiles: DataFrame,
    closure: DataFrame,
) -> DataFrame:
    """J10 — |anc(q) ∩ anc(c)| / |anc(q) ∪ anc(c)| over indirect
    association sets (OWLsim.scala:289-293)."""
    qi = indirect_associations(
        query_profiles.select("individual", "phenotype"), closure
    ).select(F.col("individual").alias("query"), F.col("node"))
    ci = indirect_associations(
        corpus_profiles.select("individual", "phenotype"), closure
    ).select(F.col("individual").alias("corpus"), F.col("node"))
    q_sizes = qi.groupBy("query").agg(F.countDistinct("node").alias("n_q"))
    c_sizes = ci.groupBy("corpus").agg(F.countDistinct("node").alias("n_c"))
    inter = (
        qi.join(ci, on="node")
        .groupBy("query", "corpus")
        .agg(F.countDistinct("node").alias("n_common"))
    )
    return (
        inter.join(q_sizes, on="query")
        .join(c_sizes, on="corpus")
        .select(
            "query",
            "corpus",
            (
                F.col("n_common")
                / (F.col("n_q") + F.col("n_c") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )


def score_triples(medians: DataFrame) -> DataFrame:
    """Similarity triples (GroupWiseSimilarity.toTriples, OWLsim.scala:366-393)
    with content-hash comparison IRIs instead of OntUtil.nextIRI (§7.1)."""
    comparison = F.concat(
        F.lit("http://purl.org/phenoscape/comparison/"),
        F.sha2(F.concat_ws(" ", "query", "corpus"), 256),
    )
    return (
        medians.select(
            comparison.alias("subj"),
            F.lit(vocab.COMBINED_SCORE).alias("pred"),
            F.col("score").cast("string").alias("obj"),
        )
        .unionByName(
            medians.select(
                comparison.alias("subj"),
                F.lit(vocab.FOR_QUERY_PROFILE).alias("pred"),
                F.col("query").alias("obj"),
            )
        )
        .unionByName(
            medians.select(
                comparison.alias("subj"),
                F.lit(vocab.FOR_CORPUS_PROFILE).alias("pred"),
                F.col("corpus").alias("obj"),
            )
        )
    )


def shard_queries(
    query_profiles: DataFrame, shard: int, n_shards: int = 100
) -> DataFrame:
    """Deterministic query-profile sharding (RunPairwiseOWLSim.scala:40-46):
    profiles sorted by IRI and split into ``n_shards`` near-equal groups;
    shard k processes group k. The reference runs this as a 100-task SLURM
    array (pipeline/kb-owlsim-taxa.sh:7-17); here each shard is an
    independent job over the same broadcast closure/IC, so the union of all
    shards' outputs equals the unsharded result exactly.

    ntile over a sorted window is deterministic for a fixed profile set —
    the same contract as the reference's sorted ``grouped`` slicing.
    """
    if not (0 <= shard < n_shards):
        raise ValueError(f"shard {shard} out of range [0, {n_shards})")
    w = Window.orderBy("individual")
    assigned = (
        query_profiles.select("individual")
        .dropDuplicates()
        .withColumn("shard", F.ntile(n_shards).over(w) - 1)
        .where(F.col("shard") == shard)
        .drop("shard")
    )
    return query_profiles.join(F.broadcast(assigned), on="individual", how="leftsemi")
