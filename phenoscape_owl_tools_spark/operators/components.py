"""Connected components via hash-to-min label propagation (C5).

The reference collapses equivalence classes into reasoner ``Node``s
(sim/OWLsim.scala:175-198, 352-362) inside ELK; we canonicalize with
connected components over equivalence / sameAs / synonym edges: every node
converges to the minimum IRI in its component (hash-to-min), which becomes
the canonical representative — the north-star canonicalization step.

Scale notes: converges in O(log n) iterations for hash-to-min on undirected
graphs whose components are small (OBO equivalence clusters are 2-5 nodes;
diameter-bounded). Each iteration = one shuffle on node id.
``localCheckpoint`` per iteration truncates lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, a: str = "a", b: str = "b", max_iterations: int = 50
) -> DataFrame:
    """Label every node with min(IRI) of its component.

    Returns ``(node, component)``; isolated nodes absent from ``edges`` are
    their own representatives by convention (callers coalesce).
    """
    from phenoscape_owl_tools_spark.iterbarrier import IterationBarrier

    barrier = IterationBarrier("cc", adaptive_width=True)
    und = barrier(
        edges.select(F.col(a).alias("x"), F.col(b).alias("y"))
        .unionByName(edges.select(F.col(b).alias("x"), F.col(a).alias("y")))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .dropDuplicates(),
        "und",
    )
    labels = barrier(
        und.select(F.col("x").alias("node"))
        .dropDuplicates()
        .withColumn("component", F.col("node")),
        "labels",
    )

    converged = False
    for _ in range(max_iterations):
        # hook: component = min(own, neighbors' components) — one hop
        neighbor_min = (
            und.join(labels, und["y"] == labels["node"])
            .groupBy(F.col("x").alias("node2"))
            .agg(F.min("component").alias("nbr_min"))
        )
        hooked = labels.join(
            neighbor_min, labels["node"] == neighbor_min["node2"], "left"
        ).select(
            "node",
            F.least(
                F.col("component"), F.coalesce(F.col("nbr_min"), F.col("component"))
            ).alias("component"),
            F.col("component").alias("old_component"),
        )
        # pointer doubling (the hash-to-min accelerant): component :=
        # component(component). Label distance to the component min doubles
        # per round, so long-diameter components converge in O(log d)
        # instead of O(d) one-hop rounds.
        ptr = hooked.select(
            F.col("node").alias("p_node"), F.col("component").alias("p_comp")
        )
        updated = barrier(
            hooked.join(ptr, hooked["component"] == ptr["p_node"], "left").select(
                "node",
                F.least(
                    F.col("component"), F.coalesce(F.col("p_comp"), F.col("component"))
                ).alias("component"),
                "old_component",
            ),
            "labels",
        )
        stable = updated.where(F.col("component") != F.col("old_component")).isEmpty()
        labels = updated.select("node", "component")
        if stable:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} iterations"
        )
    return labels


def canonicalize_triples(triples: DataFrame, components: DataFrame) -> DataFrame:
    """Re-key (subj, pred, obj) to component representatives.

    Broadcast-joins the (small) component map on both subject and object —
    two map-side joins, no shuffle of the triple table.
    """
    comp = F.broadcast(components)
    s_map = comp.select(F.col("node").alias("s_node"), F.col("component").alias("s_comp"))
    o_map = comp.select(F.col("node").alias("o_node"), F.col("component").alias("o_comp"))
    return (
        triples.join(s_map, triples["subj"] == s_map["s_node"], "left")
        .join(o_map, triples["obj"] == o_map["o_node"], "left")
        .select(
            F.coalesce("s_comp", "subj").alias("subj"),
            F.col("pred"),
            F.coalesce("o_comp", "obj").alias("obj"),
        )
        .dropDuplicates()
    )
