"""Golden-fixture test: Python port of NegationHierarchyAsserterTest
(src/test/scala/org/phenoscape/owl/NegationHierarchyAsserterTest.scala:9-68
over src/test/resources/NegationHierarchyAsserterTest.ofn:30-83)."""

from __future__ import annotations

from phenoscape_owl_tools_spark.operators import components, negation
from phenoscape_owl_tools_spark.oracle import pyoracle

BASE = "http://owl.phenoscape.org/NegationHierarchyAsserterTest#"


def _fixture(spark):
    subclass = spark.createDataFrame(
        [(BASE + "B", BASE + "A"), (BASE + "C", BASE + "B"), (BASE + "D", BASE + "A"),
         (BASE + "HasPartC", BASE + "HasPartB")],
        ["sub", "sup"],
    )
    # named-named equivalences (B == D)
    equiv = spark.createDataFrame([(BASE + "B", BASE + "D")], ["a", "b"])
    # EquivalentClasses(NotX, ObjectComplementOf(expr))
    complements = spark.createDataFrame(
        [
            (BASE + "NotA", BASE + "A"),
            (BASE + "NotB", BASE + "B"),
            (BASE + "NotC", BASE + "C"),
            (BASE + "NotD", BASE + "D"),
            (BASE + "NotHasPartB", "ObjectSomeValuesFrom(has_part B)"),
            (BASE + "NotHasPartC", "ObjectSomeValuesFrom(has_part C)"),
        ],
        ["negation_cls", "negated_expr"],
    )
    # classMap: named classes equivalent to expressions (HasPartB == has_part some B)
    class_expr = spark.createDataFrame(
        [
            (BASE + "HasPartB", "ObjectSomeValuesFrom(has_part B)"),
            (BASE + "HasPartC", "ObjectSomeValuesFrom(has_part C)"),
        ],
        ["named", "expr"],
    )
    return subclass, equiv, complements, class_expr


def test_negation_hierarchy_golden(spark):
    subclass, equiv, complements, class_expr = _fixture(spark)
    negates = negation.resolve_negates(complements, class_expr)

    got_negates = {(r["n"], r["c"]) for r in negates.collect()}
    assert (BASE + "NotHasPartB", BASE + "HasPartB") in got_negates  # J3 resolution

    sub_axioms = {
        (r["sub"], r["sup"])
        for r in negation.negation_subclass_axioms(negates, subclass).collect()
    }
    # reference test7/test8/test9 expectations
    assert (BASE + "NotA", BASE + "NotB") in sub_axioms
    assert (BASE + "NotB", BASE + "NotC") in sub_axioms
    assert (BASE + "NotHasPartB", BASE + "NotHasPartC") in sub_axioms
    # pre-state sanity (test2/test4): nothing asserts NotB < NotA etc.
    assert (BASE + "NotB", BASE + "NotA") not in sub_axioms

    comp = components.connected_components(equiv)
    equiv_axioms = {
        frozenset((r["a"], r["b"]))
        for r in negation.negation_equivalence_axioms(negates, comp).collect()
    }
    assert frozenset((BASE + "NotB", BASE + "NotD")) in equiv_axioms


def test_negation_matches_python_oracle(spark):
    subclass, equiv, complements, class_expr = _fixture(spark)
    negates_df = negation.resolve_negates(complements, class_expr)
    negates = {(r["n"], r["c"]) for r in negates_df.collect()}
    sub_edges = {(r["sub"], r["sup"]) for r in subclass.collect()}

    expected_subs, expected_equivs = pyoracle.negation_hierarchy(
        sub_edges, [{BASE + "B", BASE + "D"}], negates
    )
    got_subs = {
        (r["sub"], r["sup"])
        for r in negation.negation_subclass_axioms(negates_df, subclass).collect()
    }
    assert got_subs == {(a, b) for a, b in expected_subs if a != b}
