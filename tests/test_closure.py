from __future__ import annotations

import random

from phenoscape_owl_tools_spark.operators import closure
from phenoscape_owl_tools_spark.oracle import pyoracle


def _edges_df(spark, edges):
    return spark.createDataFrame([(a, b) for a, b in edges], ["sub", "sup"])


def test_transitive_closure_random_dag(spark):
    rng = random.Random(7)
    nodes = [f"n{i}" for i in range(60)]
    edges = set()
    for i in range(1, 60):
        for _ in range(rng.randrange(1, 3)):
            edges.add((nodes[i], nodes[rng.randrange(i)]))
    got = {
        (r["sub"], r["sup"])
        for r in closure.transitive_closure(_edges_df(spark, edges)).collect()
    }
    assert got == pyoracle.transitive_closure(edges)


def test_transitive_closure_reflexive_chain(spark):
    edges = {("a", "b"), ("b", "c"), ("c", "d")}
    got = {
        (r["sub"], r["sup"])
        for r in closure.transitive_closure(_edges_df(spark, edges), reflexive=True).collect()
    }
    assert got == pyoracle.transitive_closure(edges, reflexive=True)


def test_el_closure_with_equiv(spark):
    sub = _edges_df(spark, {("b", "a"), ("c", "b")})
    eq = spark.createDataFrame([("b", "d")], ["a", "b"])
    got = {
        (r["sub"], r["sup"])
        for r in closure.el_closure(sub, equiv_edges=eq).collect()
    }
    # d == b => d subclass a, c subclass d, etc.
    assert ("d", "a") in got
    assert ("c", "d") in got
    assert ("c", "a") in got
    assert ("b", "d") in got and ("d", "b") in got


def test_restriction_monotonicity_inside_fixpoint(spark):
    """X<Y must propagate to (P some X) < (P some Y), and those new edges
    must feed further transitive steps (ELK-saturation parity)."""
    sub = _edges_df(spark, {("x", "y"), ("y", "z")})
    restr = spark.createDataFrame(
        [("rx", "P", "x"), ("ry", "P", "y"), ("rz", "P", "z"), ("top", "Q", "z")],
        ["iri", "prop", "filler"],
    )
    got = {
        (r["sub"], r["sup"])
        for r in closure.transitive_closure(_edges_df(spark, {("x", "y"), ("y", "z")}), restrictions=restr).collect()
    }
    assert ("rx", "ry") in got
    assert ("ry", "rz") in got
    assert ("rx", "rz") in got  # via transitivity over derived edges
    assert ("x", "z") in got
    assert not any(s == "top" or p == "top" for s, p in got)


def test_direct_hierarchy(spark):
    edges = {("c", "b"), ("b", "a"), ("c", "a")}  # c->a is redundant
    c = closure.transitive_closure(_edges_df(spark, edges))
    direct = {(r["sub"], r["sup"]) for r in closure.direct_hierarchy(c).collect()}
    assert direct == {("c", "b"), ("b", "a")}


def test_instance_closure(spark):
    types = spark.createDataFrame([("i1", "c")], ["individual", "cls"])
    cl = closure.transitive_closure(_edges_df(spark, {("c", "b"), ("b", "a")}))
    got = {(r["individual"], r["cls"]) for r in closure.instance_closure(types, cl).collect()}
    assert got == {("i1", "c"), ("i1", "b"), ("i1", "a")}


def _py_chain_closure(assertions, chains, subprops=()):
    """Sequential oracle: naive fixpoint over typed edges."""
    full = set(assertions)
    while True:
        new = set()
        for (p1, p2, r) in chains:
            left = [(s, o) for (p, s, o) in full if p == p1]
            right = {}
            for (p, s, o) in full:
                if p == p2:
                    right.setdefault(s, []).append(o)
            for s, m in left:
                for o in right.get(m, []):
                    if s != o:
                        new.add((r, s, o))
        for (sp, qp) in subprops:
            for (p, s, o) in list(full):
                if p == sp:
                    new.add((qp, s, o))
        if new <= full:
            return full
        full |= new


def test_property_chain_closure_vahm(spark):
    # VAHM-style: homologous_to ∘ part_of, plus part_of transitivity
    assertions = [
        ("part_of", "digit", "hand"), ("part_of", "hand", "arm"),
        ("part_of", "arm", "body"),
        ("hom", "fin", "hand"),
    ]
    chains = [("part_of", "part_of", "part_of"), ("hom", "part_of", "hom")]
    df = spark.createDataFrame(assertions, ["p", "s", "o"])
    got = {
        (r["p"], r["s"], r["o"])
        for r in closure.property_chain_closure(df, chains).collect()
    }
    assert got == _py_chain_closure(assertions, chains)
    assert ("hom", "fin", "body") in got  # needs derived∘derived composition
    assert ("part_of", "digit", "body") in got


def test_property_chain_closure_random_with_subprops(spark):
    rng = random.Random(11)
    nodes = [f"x{i}" for i in range(25)]
    assertions = set()
    for _ in range(60):
        p = rng.choice(["p", "q"])
        a, b = rng.sample(nodes, 2)
        assertions.add((p, a, b))
    chains = [("p", "p", "p"), ("q", "p", "q")]
    subprops = [("q", "p")]
    df = spark.createDataFrame(sorted(assertions), ["p", "s", "o"])
    sp = spark.createDataFrame(subprops, ["sub_p", "sup_p"])
    got = {
        (r["p"], r["s"], r["o"])
        for r in closure.property_chain_closure(df, chains, subprops=sp).collect()
    }
    assert got == _py_chain_closure(assertions, chains, subprops)


def test_property_chain_closure_subprops_only(spark):
    assertions = [("q", "a", "b"), ("q", "b", "c")]
    df = spark.createDataFrame(assertions, ["p", "s", "o"])
    sp = spark.createDataFrame([("q", "p")], ["sub_p", "sup_p"])
    got = {
        (r["p"], r["s"], r["o"])
        for r in closure.property_chain_closure(df, chains=[], subprops=sp).collect()
    }
    assert got == set(assertions) | {("p", "a", "b"), ("p", "b", "c")}


def test_derived_restriction_edges_compose_with_asserted_facts(spark):
    """ELK parity gap (found in review): rx < ry is DERIVED by monotonicity
    from x < y; an asserted a < rx must then compose to a < ry. Linear
    semi-naive against the base edge set misses this."""
    edges = _edges_df(spark, {("x", "y"), ("a", "rx")})
    restrictions = spark.createDataFrame(
        [("rx", "P", "x"), ("ry", "P", "y")], ["iri", "prop", "filler"]
    )
    got = {
        (r["sub"], r["sup"])
        for r in closure.transitive_closure(edges, restrictions=restrictions).collect()
    }
    assert ("rx", "ry") in got  # monotonicity
    assert ("a", "ry") in got  # composition through the DERIVED edge


def test_incremental_closure_matches_full_recompute(spark):
    """Insert a batch of edges into a materialized closure; result must
    equal transitive_closure over the unioned edge set."""
    base_edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q")], ["sub", "sup"]
    )
    base = closure.transitive_closure(base_edges)
    # new batch: bridges two old regions (c->x) and adds a fresh chain
    new = spark.createDataFrame([("c", "x"), ("y", "z"), ("m", "n")], ["sub", "sup"])
    inc = closure.incremental_closure_update(base, new)
    full = closure.transitive_closure(base_edges.unionByName(new))
    a = {(r["sub"], r["sup"]) for r in inc.collect()}
    b = {(r["sub"], r["sup"]) for r in full.collect()}
    assert a == b
    # the bridge must have closed old∘new∘old paths: a ->* z
    assert ("a", "z") in a


def test_incremental_closure_with_restrictions(spark):
    """Monotonicity fires on newly inserted subclass facts."""
    base_edges = spark.createDataFrame([("a", "b")], ["sub", "sup"])
    restrictions = spark.createDataFrame(
        [("r_a", "p", "a"), ("r_b", "p", "b"), ("r_c", "p", "c")],
        ["iri", "prop", "filler"],
    )
    base = closure.transitive_closure(base_edges, restrictions=restrictions)
    new = spark.createDataFrame([("b", "c")], ["sub", "sup"])
    inc = closure.incremental_closure_update(base, new, restrictions=restrictions)
    full = closure.transitive_closure(
        base_edges.unionByName(new), restrictions=restrictions
    )
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in full.collect()}
    got = {(r["sub"], r["sup"]) for r in inc.collect()}
    # monotonicity entailments through the new edge
    assert ("r_b", "r_c") in got and ("r_a", "r_c") in got


def test_incremental_closure_empty_batch_is_identity(spark):
    base_edges = spark.createDataFrame([("a", "b"), ("b", "c")], ["sub", "sup"])
    base = closure.transitive_closure(base_edges)
    empty = spark.createDataFrame([], "sub string, sup string")
    inc = closure.incremental_closure_update(base, empty)
    assert {tuple(r) for r in inc.collect()} == {tuple(r) for r in base.collect()}


def test_chain_saturation_derives_reflexive_entailments_with_self_loops(spark):
    """keep_self_loops must keep DERIVED self-loops too: role1 ∘ Top lands
    on (x, x) before extending — a self-homologous rolification row."""
    r1, top, r2, prop = "r1", "owl:Top", "r2", "hom"
    facts = spark.createDataFrame(
        [(r1, "x", "x"), (top, "x", "x"), (r2, "x", "x")],
        "p string, s string, o string",
    )
    chains = [(r1, top, "aux"), ("aux", r2, prop)]
    sat = closure.property_chain_closure(facts, chains, keep_self_loops=True)
    got = {(r["p"], r["s"], r["o"]) for r in sat.collect()}
    assert ("aux", "x", "x") in got       # derived reflexive intermediate
    assert (prop, "x", "x") in got        # self-homology entailed


def test_dred_deletion_matches_full_recompute(spark):
    """Diamond: a->b->d and a->c->d; deleting a->b must keep a->d alive
    (alternative derivation) while dropping a->b and facts only via it."""
    edges = [("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"), ("d", "e"), ("b", "x")]
    asserted = spark.createDataFrame(edges, ["sub", "sup"])
    full_before = closure.transitive_closure(asserted)
    deleted = spark.createDataFrame([("a", "b")], ["sub", "sup"])
    got = closure.incremental_closure_delete(full_before, asserted, deleted)
    expect = closure.transitive_closure(
        spark.createDataFrame(edges[1:], ["sub", "sup"])
    )
    a = {tuple(r) for r in got.collect()}
    b = {tuple(r) for r in expect.collect()}
    assert a == b
    assert ("a", "d") in a      # rederived through c
    assert ("a", "x") not in a  # only derivable via the deleted edge
    assert ("a", "b") not in a


def test_dred_deletion_with_restrictions(spark):
    edges = [("a", "b"), ("b", "c")]
    restrictions = spark.createDataFrame(
        [("r_a", "p", "a"), ("r_b", "p", "b"), ("r_c", "p", "c")],
        ["iri", "prop", "filler"],
    )
    asserted = spark.createDataFrame(edges, ["sub", "sup"])
    before = closure.transitive_closure(asserted, restrictions=restrictions)
    deleted = spark.createDataFrame([("b", "c")], ["sub", "sup"])
    got = closure.incremental_closure_delete(
        before, asserted, deleted, restrictions=restrictions
    )
    expect = closure.transitive_closure(
        spark.createDataFrame([("a", "b")], ["sub", "sup"]),
        restrictions=restrictions,
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in expect.collect()}
    # monotonicity entailments via the deleted edge are gone
    assert ("r_b", "r_c") not in {(r["sub"], r["sup"]) for r in got.collect()}


def test_dred_delete_then_insert_roundtrip(spark):
    """delete e then re-insert e returns exactly the original closure."""
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    asserted = spark.createDataFrame(edges, ["sub", "sup"])
    before = closure.transitive_closure(asserted)
    e = spark.createDataFrame([("b", "c")], ["sub", "sup"])
    after_del = closure.incremental_closure_delete(before, asserted, e)
    after_ins = closure.incremental_closure_update(after_del, e)
    assert ({tuple(r) for r in after_ins.collect()}
            == {tuple(r) for r in before.collect()})


def test_mixed_batch_randomized_equals_scratch(spark):
    """Randomized mixed batch (VERDICT r2 item 6): delete k existing edges
    AND insert k' fresh edges via the documented recipe (DRed delete, then
    semi-naive insert) == from-scratch closure of the mutated graph.
    Seeded DAG, edges always point to lower indices (acyclic by
    construction); the inserted edges reuse and bridge existing regions."""
    for seed in (3, 11):
        rng = random.Random(seed)
        nodes = [f"m{i}" for i in range(40)]
        edges = set()
        for i in range(1, 40):
            for _ in range(rng.randrange(1, 3)):
                edges.add((nodes[i], nodes[rng.randrange(i)]))
        edges = sorted(edges)
        deleted = set(rng.sample(edges, 5))
        inserted = set()
        while len(inserted) < 5:
            i = rng.randrange(1, 40)
            cand = (nodes[i], nodes[rng.randrange(i)])
            if cand not in edges or cand in deleted:
                inserted.add(cand)
        asserted = _edges_df(spark, edges)
        before = closure.transitive_closure(asserted)
        after_del = closure.incremental_closure_delete(
            before, asserted, _edges_df(spark, deleted)
        )
        got = closure.incremental_closure_update(
            after_del, _edges_df(spark, inserted)
        )
        final_edges = (set(edges) - deleted) | inserted
        want = pyoracle.transitive_closure(final_edges)
        assert {(r["sub"], r["sup"]) for r in got.collect()} == want, seed


def test_fused_apply_randomized_equals_scratch(spark):
    """incremental_closure_apply (ONE overdelete pass + ONE combined
    rederive/insert loop) == from-scratch closure of the mutated graph ==
    the sequential delete-then-update recipe, on seeded random DAGs."""
    for seed in (5, 23):
        rng = random.Random(seed)
        nodes = [f"f{i}" for i in range(40)]
        edges = set()
        for i in range(1, 40):
            for _ in range(rng.randrange(1, 3)):
                edges.add((nodes[i], nodes[rng.randrange(i)]))
        edges = sorted(edges)
        deleted = set(rng.sample(edges, 5))
        inserted = set()
        while len(inserted) < 5:
            i = rng.randrange(1, 40)
            cand = (nodes[i], nodes[rng.randrange(i)])
            if cand not in edges or cand in deleted:
                inserted.add(cand)
        asserted = _edges_df(spark, edges)
        before = closure.transitive_closure(asserted)
        got = closure.incremental_closure_apply(
            before, asserted, _edges_df(spark, deleted), _edges_df(spark, inserted)
        )
        final_edges = (set(edges) - deleted) | inserted
        want = pyoracle.transitive_closure(final_edges)
        assert {(r["sub"], r["sup"]) for r in got.collect()} == want, seed


def test_fused_apply_with_restrictions(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    restrictions = spark.createDataFrame(
        [(f"r_{x}", "p", x) for x in "abcd"], ["iri", "prop", "filler"]
    )
    asserted = spark.createDataFrame(edges, ["sub", "sup"])
    before = closure.transitive_closure(asserted, restrictions=restrictions)
    got = closure.incremental_closure_apply(
        before, asserted,
        spark.createDataFrame([("b", "c")], ["sub", "sup"]),      # delete
        spark.createDataFrame([("b", "d")], ["sub", "sup"]),      # insert
        restrictions=restrictions,
    )
    want = closure.transitive_closure(
        spark.createDataFrame([("a", "b"), ("c", "d"), ("b", "d")], ["sub", "sup"]),
        restrictions=restrictions,
    )
    assert ({tuple(r) for r in got.collect()}
            == {tuple(r) for r in want.collect()})


def test_fused_apply_insert_only_and_delete_only(spark):
    """Degenerate batches: empty delete == pure insert semantics; empty
    insert == pure DRed semantics."""
    edges = [("a", "b"), ("b", "c")]
    asserted = _edges_df(spark, edges)
    before = closure.transitive_closure(asserted)
    empty = spark.createDataFrame([], "sub string, sup string")
    ins = closure.incremental_closure_apply(
        before, asserted, empty, _edges_df(spark, [("c", "d")])
    )
    assert {tuple(r) for r in ins.collect()} == pyoracle.transitive_closure(
        set(edges) | {("c", "d")}
    )
    dele = closure.incremental_closure_apply(
        before, asserted, _edges_df(spark, [("b", "c")]), empty
    )
    assert {tuple(r) for r in dele.collect()} == pyoracle.transitive_closure(
        {("a", "b")}
    )


_DEEP = {"width": 8, "layers": 60}
_deep_closure_cache: dict[int, object] = {}


def _deep_graph():
    """Layered DAG: node (l, w) -> parent (l-1, w). Depth = layers,
    independent of width — the BENCH §9.2 'deep' shape at test scale
    (avg ancestors/node ~= layers/2 = 30 >= the 20 threshold)."""
    return [
        (f"d{l}_{w}", f"d{l - 1}_{w}")
        for l in range(1, _DEEP["layers"])
        for w in range(_DEEP["width"])
    ]


def _deep_closure(spark):
    """The deep graph's closure, computed once per session (two chooser
    tests probe the same frame; the fixpoint is the expensive part)."""
    key = id(spark)
    if key not in _deep_closure_cache:
        df = closure.transitive_closure(_edges_df(spark, _deep_graph()))
        _deep_closure_cache[key] = df.localCheckpoint(eager=True)
    return _deep_closure_cache[key]


def test_choose_strategy_bary_picks_scratch(spark):
    """Shallow branching DAG (avg ancestors ~3 << 20): recompute wins
    (BENCH §9.2 measured 0.38-0.47x for incremental) — chooser says so."""
    edges = [(f"b{i}", f"b{i // 10}") for i in range(1, 600)]
    before = closure.transitive_closure(_edges_df(spark, edges))
    deleted = _edges_df(spark, [("b599", "b59")])
    got = closure.choose_maintenance_strategy(before, deleted)
    assert got["strategy"] == "scratch"
    assert got["depth_proxy"] < closure.MAINTAIN_DEPTH_THRESHOLD


def test_choose_strategy_deep_recent_picks_incremental(spark):
    """Deep layered DAG + bottom-layer retraction (the continuous-ingest
    shape, BENCH §9.2 measured 1.72x win): chooser picks incremental."""
    last = _DEEP["layers"] - 1
    deleted = _edges_df(spark, [(f"d{last}_0", f"d{last - 1}_0")])  # no cone
    got = closure.choose_maintenance_strategy(_deep_closure(spark), deleted)
    assert got["strategy"] == "incremental", got
    assert got["depth_proxy"] >= closure.MAINTAIN_DEPTH_THRESHOLD
    assert got["cone_fraction"] <= closure.MAINTAIN_CONE_FRACTION_THRESHOLD


def test_choose_strategy_deep_structural_picks_scratch(spark):
    """Same deep graph, but MID-GRAPH structural deletes drag a whole
    descendant cone through overdelete/rederive (measured 0.67x): the
    cone probe overrides the depth signal."""
    mid = _DEEP["layers"] // 2
    deleted = _edges_df(
        spark, [(f"d{mid}_{w}", f"d{mid - 1}_{w}") for w in range(_DEEP["width"])]
    )
    got = closure.choose_maintenance_strategy(_deep_closure(spark), deleted)
    assert got["strategy"] == "scratch", got
    assert got["cone_fraction"] > closure.MAINTAIN_CONE_FRACTION_THRESHOLD


def test_maintain_closure_auto_randomized_equals_scratch(spark):
    """The auto entry point == from-scratch closure of the mutated graph
    on seeded random DAGs, whatever strategy it picks — and both FORCED
    strategies agree too (bit-identical maintenance guarantee)."""
    for seed in (7, 31):
        rng = random.Random(seed)
        nodes = [f"a{i}" for i in range(40)]
        edges = set()
        for i in range(1, 40):
            for _ in range(rng.randrange(1, 3)):
                edges.add((nodes[i], nodes[rng.randrange(i)]))
        edges = sorted(edges)
        deleted = set(rng.sample(edges, 5))
        inserted = set()
        while len(inserted) < 5:
            i = rng.randrange(1, 40)
            cand = (nodes[i], nodes[rng.randrange(i)])
            if cand not in edges or cand in deleted:
                inserted.add(cand)
        asserted = _edges_df(spark, edges)
        before = closure.transitive_closure(asserted)
        want = pyoracle.transitive_closure((set(edges) - deleted) | inserted)
        for strategy in (None, "incremental", "scratch"):
            got = closure.maintain_closure(
                before,
                asserted,
                _edges_df(spark, deleted),
                _edges_df(spark, inserted),
                strategy=strategy,
            )
            assert {(r["sub"], r["sup"]) for r in got.collect()} == want, (
                seed,
                strategy,
            )


def test_maintain_closure_empty_batch_is_identity(spark):
    edges = [("a", "b"), ("b", "c")]
    before = closure.transitive_closure(_edges_df(spark, edges))
    got = closure.maintain_closure(before, _edges_df(spark, edges))
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in before.collect()
    }


def test_maintain_closure_with_restrictions_auto(spark):
    edges = [("a", "b"), ("b", "c"), ("c", "d")]
    restrictions = spark.createDataFrame(
        [(f"r_{x}", "p", x) for x in "abcd"], ["iri", "prop", "filler"]
    )
    asserted = _edges_df(spark, edges)
    before = closure.transitive_closure(asserted, restrictions=restrictions)
    got = closure.maintain_closure(
        before,
        asserted,
        _edges_df(spark, [("b", "c")]),
        _edges_df(spark, [("b", "d")]),
        restrictions=restrictions,
    )
    want = closure.transitive_closure(
        _edges_df(spark, [("a", "b"), ("c", "d"), ("b", "d")]),
        restrictions=restrictions,
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}
