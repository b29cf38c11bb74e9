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


def test_long_chain_converges_logarithmically(spark):
    """A 2000-node path graph: one-hop propagation would need ~2000 rounds;
    pointer doubling must finish within ~16."""
    n = 2000
    edges = [(f"v{i:05d}", f"v{i+1:05d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["a", "b"])
    from phenoscape_owl_tools_spark.operators.components import connected_components

    labels = connected_components(df, max_iterations=16)
    got = {r["node"]: r["component"] for r in labels.collect()}
    assert len(got) == n
    assert set(got.values()) == {"v00000"}


def test_unconverged_raises(spark):
    n = 300
    edges = [(f"v{i:05d}", f"v{i+1:05d}") for i in range(n - 1)]
    df = spark.createDataFrame(edges, ["a", "b"])
    from phenoscape_owl_tools_spark.operators.components import connected_components

    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iterations=2)
