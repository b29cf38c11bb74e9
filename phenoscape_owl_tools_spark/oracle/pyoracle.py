"""Pure-Python reference oracle: direct ports of the reference semantics.

Each function re-implements, in plain in-memory Python, the algorithm the
Spark operators distribute — so tests compare the distributed implementation
against an independent sequential one (SURVEY.md §5):

- ``transitive_closure``          <- MaterializeSubClassOfClosure.scala:33-43
- ``connected_components``        <- OWLsim.scala:175-198 node condensation
- ``negation_hierarchy``          <- NegationHierarchyAsserter.scala:26-72
- ``fitch_postorder``             <- EvolutionaryProfiles.scala:107-165
- ``normalized_ic`` / ``median``  <- OWLsim.scala:80-92, 303-306
"""

from __future__ import annotations

import math
from collections import defaultdict


def transitive_closure(edges: set[tuple[str, str]], reflexive: bool = False) -> set[tuple[str, str]]:
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in edges:
        if a != b:
            adj[a].add(b)
    out: set[tuple[str, str]] = set()
    nodes = set(adj) | {b for _, b in edges}
    for start in nodes:
        seen: set[str] = set()
        stack = list(adj.get(start, ()))
        while stack:
            n = stack.pop()
            if n in seen:
                continue
            seen.add(n)
            stack.extend(adj.get(n, ()))
        for n in seen:
            if n != start:
                out.add((start, n))
    if reflexive:
        for n in nodes:
            out.add((n, n))
    return out


def connected_components(edges: set[tuple[str, str]]) -> dict[str, str]:
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    label: dict[str, str] = {}
    for start in adj:
        if start in label:
            continue
        comp = {start}
        stack = [start]
        while stack:
            n = stack.pop()
            for m in adj[n]:
                if m not in comp:
                    comp.add(m)
                    stack.append(m)
        rep = min(comp)
        for n in comp:
            label[n] = rep
    return label


def negation_hierarchy(
    subclass_edges: set[tuple[str, str]],
    equiv_groups: list[set[str]],
    negates: set[tuple[str, str]],
) -> tuple[set[tuple[str, str]], set[frozenset[str]]]:
    """Port of NegationHierarchyAsserter.assertNegationHierarchy.

    ``negates`` = (negation_class, negated_class) pairs (the resolved
    classMap of the reference). Returns (subClassOf pairs, equivalence
    groups of negations).
    """
    subclasses_of: dict[str, set[str]] = defaultdict(set)  # sup -> subs
    for sub, sup in subclass_edges:
        subclasses_of[sup].add(sub)
    negated_by: dict[str, set[str]] = defaultdict(set)  # class -> its negations
    for n, c in negates:
        negated_by[c].add(n)

    sub_axioms: set[tuple[str, str]] = set()
    for negater, negated in negates:
        for sub_of_negated in subclasses_of[negated]:
            for m in negated_by[sub_of_negated]:
                sub_axioms.add((negater, m))

    equiv_axioms: set[frozenset[str]] = set()
    for group in equiv_groups:
        if len(group) > 1:
            negs = set()
            for c in group:
                negs |= negated_by[c]
            if len(negs) > 1:
                equiv_axioms.add(frozenset(negs))
    return sub_axioms, equiv_axioms


def fitch_postorder(
    children_of: dict[str, list[str]],
    root: str,
    node_states: dict[str, dict[str, set[str]]],
) -> tuple[dict[str, dict[str, set[str]]], dict[str, dict[str, set[str]]]]:
    """Port of EvolutionaryProfiles.postorder (EvolutionaryProfiles.scala:112-165).

    Returns (associations, profiles), each node -> character -> state set.
    Note the reference's set-of-sets semantics: duplicate child state-sets
    collapse before the size checks.
    """
    associations: dict[str, dict[str, set[str]]] = {}
    profiles: dict[str, dict[str, set[str]]] = {}

    def rec(node: str) -> None:
        children = children_of.get(node, [])
        own = node_states.get(node, {})
        if not children:
            associations[node] = {k: set(v) for k, v in own.items()}
            return
        for ch in children:
            rec(ch)
        chars = set(own)
        for ch in children:
            chars |= set(associations.get(ch, {}))
        cur: dict[str, set[str]] = {}
        prof: dict[str, set[str]] = {}
        for char in chars:
            node_set = frozenset(own.get(char, set()))
            child_sets = [frozenset(associations[ch].get(char, set())) for ch in children]
            all_sets = set(child_sets) | {node_set}          # set-of-sets!
            non_empty = [s for s in all_sets if s]
            if len(non_empty) == 0:
                shared: frozenset[str] = frozenset()
            elif len(non_empty) == 1:
                shared = non_empty[0]
            else:
                shared = frozenset.intersection(*non_empty)
            if shared:
                cur[char] = set(shared)
            else:
                if len(all_sets) == 0:
                    continue
                elif len(all_sets) == 1:
                    states = set(next(iter(all_sets)))
                    if states:
                        cur[char] = states
                else:
                    union = set().union(*all_sets)
                    if union:
                        cur[char] = union
                        prof[char] = union
        associations[node] = cur
        if prof:
            profiles[node] = prof

    rec(root)
    return associations, profiles


def normalized_ic(freq: int, corpus_size: int) -> float:
    """OWLsim.scala:82-86: -log2(freq/corpus)/MaxIC with MaxIC = -log2(1/corpus)."""
    max_ic = -math.log(1.0 / corpus_size) / math.log(2)
    return (-math.log(freq / corpus_size) / math.log(2)) / max_ic


def median(values: list[float]) -> float:
    """Exact median incl. even-size average (OWLsim.scala:303-306)."""
    s = sorted(values)
    n = len(s)
    if n % 2 == 0:
        return (s[n // 2 - 1] + s[n // 2]) / 2.0
    return s[n // 2]
