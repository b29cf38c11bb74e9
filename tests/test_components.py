from __future__ import annotations

import random

from phenoscape_owl_tools_spark.operators import components
from phenoscape_owl_tools_spark.oracle import pyoracle


def test_connected_components_random_graph(spark):
    rng = random.Random(11)
    edges = set()
    # several clusters of varying size + a long chain (worst case for hash-to-min)
    for c in range(8):
        members = [f"c{c}_n{i}" for i in range(rng.randrange(2, 6))]
        for i in range(len(members) - 1):
            edges.add((members[i], members[i + 1]))
    chain = [f"chain{i}" for i in range(12)]
    for i in range(11):
        edges.add((chain[i], chain[i + 1]))

    df = spark.createDataFrame(list(edges), ["a", "b"])
    got = {r["node"]: r["component"] for r in components.connected_components(df).collect()}
    assert got == pyoracle.connected_components(edges)


def test_canonicalize_triples(spark):
    comp = spark.createDataFrame([("b", "a"), ("a", "a")], ["node", "component"])
    triples = spark.createDataFrame(
        [("b", "p", "x"), ("x", "p", "b"), ("a", "p", "x")], ["subj", "pred", "obj"]
    )
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in components.canonicalize_triples(triples, comp).collect()
    }
    assert got == {("a", "p", "x"), ("x", "p", "a")}
