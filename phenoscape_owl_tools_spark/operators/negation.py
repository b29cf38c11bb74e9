"""Negation-hierarchy rule asserter (SURVEY.md §2.3 J1-J3).

Relational re-expression of NegationHierarchyAsserter.assertNegationHierarchy
(NegationHierarchyAsserter.scala:26-72):

- input ``negates(n, c)``: named negation class n == ObjectComplementOf(c),
  with the reference's classMap resolution (expression -> named class) done
  by :func:`resolve_negates` over canonical expression strings;
- rule 1 (J1, :52-61): for (n negates c), every subclass s of c, and every
  negation m of s: assert ``n SubClassOf m`` — a 3-way equi-join;
- rule 2 (J2, :63-70): equivalence groups with >1 named classes make all
  their negations mutually equivalent — expressed via the group key.

The reference's ``buildIndex`` (:74-75) Maps become plain joins; Spark's
partial aggregation replaces the fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_negates(
    complements: DataFrame,
    equiv_class_expr: DataFrame | None = None,
) -> DataFrame:
    """J3 — map ObjectComplementOf(expr) through the equivalence index.

    ``complements(negation_cls, negated_expr)``: equivalence axioms of shape
    EquivalentClasses(N, ObjectComplementOf(X)) with X as canonical string.
    ``equiv_class_expr(named, expr)``: named classes equivalent to each
    expression (the reference's classMap, :28-37).

    A negated expression that is itself a named class resolves to itself
    (``expressionAsNamed``, :46-47).
    """
    self_named = complements.where(
        F.col("negated_expr").startswith("http")
    ).select(F.col("negation_cls").alias("n"), F.col("negated_expr").alias("c"))
    if equiv_class_expr is None:
        return self_named.dropDuplicates()
    via_map = complements.join(
        equiv_class_expr, complements["negated_expr"] == equiv_class_expr["expr"]
    ).select(F.col("negation_cls").alias("n"), F.col("named").alias("c"))
    return self_named.unionByName(via_map).dropDuplicates()


def negation_subclass_axioms(negates: DataFrame, subclass_edges: DataFrame) -> DataFrame:
    """J1 — emit (n SubClassOf m) per the reference's subclassAxioms loop.

    negates(n, c) x subclass(sub, sup=c) x negates(m, sub) -> (n, m).
    """
    neg1 = negates.select(F.col("n").alias("negater"), F.col("c").alias("negated")).alias("n1")
    sub = subclass_edges.select(F.col("sub").alias("e_sub"), F.col("sup").alias("e_sup")).alias("s")
    neg2 = negates.select(F.col("n").alias("m"), F.col("c").alias("c2")).alias("n2")
    return (
        neg1.join(sub, F.col("n1.negated") == F.col("s.e_sup"))
        .join(neg2, F.col("s.e_sub") == F.col("n2.c2"))
        .select(F.col("n1.negater").alias("sub"), F.col("n2.m").alias("sup"))
        .where(F.col("sub") != F.col("sup"))
        .dropDuplicates()
    )


def negation_equivalence_axioms(negates: DataFrame, equiv_components: DataFrame) -> DataFrame:
    """J2 — negations of co-equivalent classes are equivalent (:63-70).

    ``equiv_components(node, component)`` — connected components over the
    named-class equivalence graph (operators/components.py). All negations
    of classes in one component become mutually equivalent; emitted as star
    edges (x, min_of_group) for a canonical, bounded representation.
    """
    joined = negates.join(
        equiv_components, negates["c"] == equiv_components["node"]
    ).select(F.col("n"), F.col("component"))
    grp = joined.groupBy("component").agg(
        F.collect_set("n").alias("negs"), F.min("n").alias("rep")
    )
    return (
        grp.where(F.size("negs") > 1)
        .select(F.explode("negs").alias("a"), F.col("rep").alias("b"))
        .where(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
