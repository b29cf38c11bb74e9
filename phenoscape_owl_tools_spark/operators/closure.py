"""Join-based EL subclass-closure materialization (replaces ELK).

The reference classifies with the ELK reasoner and then materializes the
inferred hierarchy (MaterializeInferences.scala:44-57,
MaterializeSubClassOfClosure.scala:33-43; SPARQL flavor
src/main/sparql/subclass_closure_construct.rq). We materialize the same
closure with an iterative **semi-naive** fixpoint over DataFrames:

    closure_0 = E            (asserted edges, equivalences seeded both ways)
    delta_0   = E
    delta_i+1 = project(delta_i join E) minus closure_i     -- new facts only
    closure_i+1 = closure_i union delta_i+1

EL rules beyond transitivity run *inside the same fixpoint* (SURVEY.md §7.2):
restriction monotonicity (X subClassOf Y implies (P some X) subClassOf
(P some Y) for named restriction classes) fires on each delta, so GCI-derived
edges participate in subsequent transitive steps exactly as ELK's saturation
would.

Scale notes: iterations ~ graph diameter (20-40 for OBO); each iteration is
one shuffle on the join key. ``localCheckpoint`` truncates lineage per
iteration (mandatory: plan depth would otherwise grow linearly and overwhelm
the driver). Hub-class skew on the ``sup`` side (ANATOMICAL_ENTITY etc.) is
handled by AQE skew-join plus the explicit salting helper in
``operators/salting.py`` for the post-closure probe joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edges(df: DataFrame, sub: str = "sub", sup: str = "sup") -> DataFrame:
    return df.select(F.col(sub).alias("sub"), F.col(sup).alias("sup")).where(
        F.col("sub").isNotNull() & F.col("sup").isNotNull() & (F.col("sub") != F.col("sup"))
    )


def equiv_to_subclass(equiv: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """EquivalentClasses(a, b) == mutual SubClassOf (C4)."""
    fwd = equiv.select(F.col(a).alias("sub"), F.col(b).alias("sup"))
    rev = equiv.select(F.col(b).alias("sub"), F.col(a).alias("sup"))
    return fwd.unionByName(rev)


def _monotonicity_rule(delta: DataFrame, r1: DataFrame) -> DataFrame:
    """EL monotonicity: (X ⊑ Y) ∧ R1=(P some X) ∧ R2=(P some Y) ⟹ R1 ⊑ R2.

    ``r1`` columns: (r_prop, r_filler, r_iri). Shared by the batch fixpoint
    (:func:`transitive_closure`) and the insertion-delta path
    (:func:`incremental_closure_update`) so the rule cannot diverge.
    """
    lhs = delta.join(r1, delta["sub"] == r1["r_filler"]).select(
        F.col("r_iri").alias("m_sub"),
        F.col("r_prop").alias("m_prop"),
        F.col("sup").alias("m_sup_filler"),
    )
    r2 = r1.select(
        F.col("r_prop").alias("m_prop2"),
        F.col("r_filler").alias("m_filler2"),
        F.col("r_iri").alias("m_iri2"),
    )
    return lhs.join(
        r2,
        (lhs["m_prop"] == r2["m_prop2"]) & (lhs["m_sup_filler"] == r2["m_filler2"]),
    ).select(F.col("m_sub").alias("sub"), F.col("m_iri2").alias("sup"))


def transitive_closure(
    edges: DataFrame,
    restrictions: DataFrame | None = None,
    reflexive: bool = False,
    max_iterations: int = 100,
) -> DataFrame:
    """Transitive (optionally reflexive) closure of ``edges(sub, sup)``.

    ``restrictions(iri, prop, filler)`` — named classes standing for
    ``prop some filler`` (P2 generator output). When given, the EL
    monotonicity rule runs inside the fixpoint: for every new fact
    (X subClassOf Y) and named restrictions R1=(P some X), R2=(P some Y),
    emit (R1 subClassOf R2). Mirrors what ELK derives from
    NamedRestrictionGenerator axioms (NamedRestrictionGenerator.scala:33-43).
    """
    from phenoscape_owl_tools_spark.iterbarrier import IterationBarrier

    barrier = IterationBarrier("closure", adaptive_width=True)
    edges = barrier(_edges(edges).dropDuplicates(), "edges")

    if restrictions is not None:
        r1 = barrier(
            restrictions.select(
                F.col("prop").alias("r_prop"), F.col("filler").alias("r_filler"), F.col("iri").alias("r_iri")
            ),
            "restrictions",
        )

    def monotonicity(delta: DataFrame) -> DataFrame:
        if restrictions is None:
            return None
        return _monotonicity_rule(delta, r1)

    # The closure accumulates as a union of barrier-materialized deltas:
    # every branch is an independent parquet scan (iterbarrier.py — plain
    # checkpoints leak per-task state that doubles task time per iteration
    # on Spark 4.1), so plan depth stays bounded by the iteration count
    # (~graph diameter).
    closure = edges
    delta = edges
    first_mono = monotonicity(edges)
    if first_mono is not None:
        delta = barrier(delta.unionByName(first_mono).dropDuplicates(), "delta")
        closure = delta

    # Every COMPACT_EVERY rounds, rewrite the accumulated closure (a union
    # of all prior deltas) into one parquet scan: bounds union width — the
    # per-round anti-join otherwise scans O(iterations) branches — and lets
    # the barrier GC superseded files (superseded deltas become dead once
    # closure and the live delta are both freshly materialized).
    COMPACT_EVERY = 8
    converged = False
    for it in range(max_iterations):
        if restrictions is None:
            # plain transitivity over a static edge set: linear semi-naive
            # (delta ∘ base) is complete and cheapest — O(diameter) rounds
            step = (
                delta.alias("d")
                .join(edges.alias("e"), F.col("d.sup") == F.col("e.sub"))
                .select(F.col("d.sub").alias("sub"), F.col("e.sup").alias("sup"))
            )
        else:
            # monotonicity DERIVES NEW EDGES mid-fixpoint (rx ⊑ ry), so the
            # edge set is not static: linear semi-naive against the base
            # would never compose pre-existing facts with derived edges
            # (e.g. a ⊑ rx asserted, rx ⊑ ry derived ⟹ a ⊑ ry — which ELK
            # entails). Non-linear semi-naive closes over the FULL relation:
            # delta ∘ closure ∪ closure ∘ delta (also O(log d) rounds).
            step = (
                delta.alias("d")
                .join(closure.alias("c"), F.col("d.sup") == F.col("c.sub"))
                .select(F.col("d.sub").alias("sub"), F.col("c.sup").alias("sup"))
                .unionByName(
                    closure.alias("c2")
                    .join(delta.alias("d2"), F.col("c2.sup") == F.col("d2.sub"))
                    .select(F.col("c2.sub").alias("sub"), F.col("d2.sup").alias("sup"))
                )
            )
        mono = monotonicity(delta)
        if mono is not None:
            step = step.unionByName(mono)
        new = barrier(
            step.where(F.col("sub") != F.col("sup"))
            .dropDuplicates()
            .join(closure, on=["sub", "sup"], how="left_anti"),
            "delta",
        )
        if new.isEmpty():
            converged = True
            break
        closure = closure.unionByName(new)
        delta = new
        if (it + 1) % COMPACT_EVERY == 0:
            closure = barrier.materialize(closure, "closure")
            delta = barrier.materialize(delta, "delta")
            barrier.gc(keep=2)
    if not converged:
        raise RuntimeError(
            f"transitive_closure did not converge in {max_iterations} iterations"
        )

    if reflexive:
        nodes = (
            closure.select(F.col("sub").alias("n"))
            .unionByName(closure.select(F.col("sup").alias("n")))
            .dropDuplicates()
        )
        closure = closure.unionByName(
            nodes.select(F.col("n").alias("sub"), F.col("n").alias("sup"))
        )
    return closure


def el_closure(
    subclass_edges: DataFrame,
    equiv_edges: DataFrame | None = None,
    gci_edges: DataFrame | None = None,
    restrictions: DataFrame | None = None,
    reflexive: bool = False,
) -> DataFrame:
    """Full EL-fragment closure used by the KB build (C1-C4).

    Seeds = asserted SubClassOf + equivalences (both directions) + GCI rule
    edges from the P5 generators; monotonicity interleaved per iteration.
    """
    seed = _edges(subclass_edges)
    if equiv_edges is not None:
        seed = seed.unionByName(equiv_to_subclass(equiv_edges))
    if gci_edges is not None:
        seed = seed.unionByName(_edges(gci_edges))
    return transitive_closure(seed, restrictions=restrictions, reflexive=reflexive)


def direct_hierarchy(closure: DataFrame) -> DataFrame:
    """Nonredundant (direct) parent edges: closure minus closure-compose-closure.

    Mirrors OWLsim.scala:175-198 extracting direct super/subclass relations
    from the reasoner taxonomy (C6).

    Cost guard: the two-hop intermediate is the number of length-2 paths in
    the closure — O(|C| * avg-ancestor-fanout), i.e. quadratic in depth for
    chain-heavy graphs. Fine for a bounded TBox (OBO ontologies: |C| ~ 1e7,
    fanout ~ 40); for wider inputs derive direct edges from the asserted
    graph before closing instead.

    The self-join FANS OUT (|descendants(k)| x |ancestors(k)| per key k),
    and AQE sizes partitions from map-output bytes, so on a compact closure
    it would coalesce the join into a handful of tasks that then emit the
    whole two-hop product serially (same hazard as the pairwise rare join —
    BENCH §8). Both sides are explicitly co-partitioned on the join key;
    REPARTITION_BY_NUM shuffles are exempt from AQE coalescing.
    """
    c = _edges(closure)
    par = c.sparkSession.sparkContext.defaultParallelism
    two_hop = (
        c.repartition(par, "sup").alias("x")
        .join(c.repartition(par, "sub").alias("y"), F.col("x.sup") == F.col("y.sub"))
        .select(F.col("x.sub").alias("sub"), F.col("y.sup").alias("sup"))
        .dropDuplicates()
    )
    return c.join(two_hop, on=["sub", "sup"], how="left_anti")


def instance_closure(types: DataFrame, closure: DataFrame) -> DataFrame:
    """rdf:type / rdfs:subClassOf* (C3): one join once closure exists.

    ``types(individual, cls)`` joined through reflexive-transitive closure.
    Mirrors src/main/sparql/profile_instance_closure_construct.rq:10-13.
    """
    direct = types.select("individual", "cls")
    inferred = (
        types.join(closure, types["cls"] == closure["sub"])
        .select("individual", F.col("sup").alias("cls"))
    )
    return direct.unionByName(inferred).dropDuplicates()


def unsatisfiable_classes(closure: DataFrame, disjoints: DataFrame) -> DataFrame:
    """C7 — satisfiability check (PhenoscapeKB.scala:313-321, 344-349).

    A class is unsatisfiable iff its reflexive ancestor set contains both
    members of some DisjointClasses pair. ``disjoints(a, b)``. Two
    broadcast-sized joins against the materialized closure — no reasoner.
    """
    c = _edges(closure)
    nodes = (
        c.select(F.col("sub").alias("n"))
        .unionByName(c.select(F.col("sup").alias("n")))
        .dropDuplicates()
    )
    anc = c.unionByName(nodes.select(F.col("n").alias("sub"), F.col("n").alias("sup")))
    hit_a = anc.join(
        F.broadcast(disjoints), anc["sup"] == disjoints["a"]
    ).select(F.col("sub").alias("cls"), "a", "b")
    hit_b = anc.select(F.col("sub").alias("cls2"), F.col("sup").alias("anc2"))
    return (
        hit_a.join(
            hit_b,
            (hit_a["cls"] == hit_b["cls2"]) & (hit_a["b"] == hit_b["anc2"]),
            "leftsemi",
        )
        .select("cls")
        .dropDuplicates()
    )


def property_chain_closure(
    assertions: DataFrame,
    chains: list[tuple[str, str, str]],
    subprops: DataFrame | None = None,
    max_iterations: int = 100,
    keep_self_loops: bool = False,
) -> DataFrame:
    """EL property-chain saturation (SURVEY.md §7.3 extension, C4).

    ``assertions(p, s, o)`` — typed edges (property assertions / existential
    skeleton edges). ``chains`` — SubPropertyChainOf axioms as
    (p1, p2, r): p1 ∘ p2 ⊑ r (transitivity = (p, p, p)); the shape used by
    the reference's VAHM homology model (HomologyTableToOWLVAHM.scala:44-50)
    and rolification demo (HomologyTableDemoRolification.scala:70-80).
    ``subprops(sub_p, sup_p)`` — role hierarchy, applied per iteration.

    Semi-naive over the typed relation: each round joins the delta on BOTH
    chain positions against the accumulated set, so derived∘derived
    compositions are found (a recursive CTE could only re-join the base).
    """
    from phenoscape_owl_tools_spark.iterbarrier import IterationBarrier

    barrier = IterationBarrier("chains", adaptive_width=True)
    base = assertions.select("p", "s", "o")
    if not keep_self_loops:
        # cycle guard for the VAHM/closure paths; rolification (r.Self
        # encodings, HomologyTableDemoRolification.scala:72-73) needs the
        # reflexive edges and opts in via keep_self_loops=True.
        base = base.where(F.col("s") != F.col("o"))
    asrt = barrier(base.dropDuplicates(), "assertions")
    sp = asrt.sparkSession
    chain_df = (
        sp.createDataFrame(chains, ["c1", "c2", "cr"]) if chains else None
    )
    if subprops is not None:
        subprops = barrier(subprops.select("sub_p", "sup_p"), "subprops")

    def derive(delta: DataFrame, full: DataFrame) -> DataFrame:
        if chain_df is None:
            # role hierarchy only (legal EL ontology without chains)
            if subprops is None:
                return delta.limit(0)
            return delta.join(subprops, delta["p"] == subprops["sub_p"]).select(
                F.col("sup_p").alias("p"), "s", "o"
            )
        # delta in position 1 against full in position 2, and vice versa
        d1 = (
            delta.alias("d").join(F.broadcast(chain_df), F.col("d.p") == F.col("c1"))
            .join(full.alias("f"), (F.col("d.o") == F.col("f.s")) & (F.col("f.p") == F.col("c2")))
            .select(F.col("cr").alias("p"), F.col("d.s").alias("s"), F.col("f.o").alias("o"))
        )
        d2 = (
            delta.alias("d").join(F.broadcast(chain_df), F.col("d.p") == F.col("c2"))
            .join(full.alias("f"), (F.col("f.o") == F.col("d.s")) & (F.col("f.p") == F.col("c1")))
            .select(F.col("cr").alias("p"), F.col("f.s").alias("s"), F.col("d.o").alias("o"))
        )
        out = d1.unionByName(d2)
        if subprops is not None:
            out = out.unionByName(
                delta.join(subprops, delta["p"] == subprops["sub_p"]).select(
                    F.col("sup_p").alias("p"), "s", "o"
                )
            )
        return out

    COMPACT_EVERY = 8  # see transitive_closure: bound union width + GC temp files
    full = asrt
    delta = asrt
    for it in range(max_iterations):
        derived = derive(delta, full)
        if not keep_self_loops:
            # with keep_self_loops the DERIVED reflexive entailments must
            # survive too (rolification: prop ∘ Top compositions land on
            # (x, x) before extending to (x, y)); the filter is a cycle
            # guard for the VAHM/closure paths only
            derived = derived.where(F.col("s") != F.col("o"))
        new = barrier(
            derived
            .dropDuplicates()
            .join(full, on=["p", "s", "o"], how="left_anti"),
            "delta",
        )
        if new.isEmpty():
            break
        full = full.unionByName(new)
        delta = new
        if (it + 1) % COMPACT_EVERY == 0:
            full = barrier.materialize(full, "full")
            delta = barrier.materialize(delta, "delta")
            barrier.gc(keep=2)
    return full


def incremental_closure_update(
    closure: DataFrame,
    new_edges: DataFrame,
    restrictions: DataFrame | None = None,
    max_iterations: int = 100,
) -> DataFrame:
    """Maintain a materialized transitive closure under edge INSERTIONS.

    ``closure`` is an already-materialized transitive closure (what
    :func:`transitive_closure` returned, or the stage table the pipeline
    wrote); ``new_edges(sub, sup)`` is a batch of newly asserted edges
    (e.g. a streaming micro-batch of mention/subclass triples). Returns the
    closure of (old graph ∪ new edges) WITHOUT recomputing from scratch:
    the standard semi-naive insertion delta — seed the delta with
    TC-bridged copies of each new edge (old ∘ new, new ∘ old, old ∘ new ∘
    old) and iterate only the delta against the accumulated relation.
    Cost tracks the size of the NEW entailments (a batch touching one
    region of the graph closes in O(diameter-of-affected-region) rounds),
    not the closure size — at 10^12-doc scale the continuous-ingest path
    re-closes per checkpointed micro-batch this way.

    With ``restrictions``, the EL monotonicity rule runs inside the same
    delta loop (new subclass facts can mint new restriction edges, which
    compose further — same non-linear semi-naive shape as
    :func:`transitive_closure`).

    Deletions are NOT handled (DRed/counting would be needed); the
    pipeline's deletion story is stage-level rebuild, matching the
    reference's batch semantics.
    """
    from phenoscape_owl_tools_spark.iterbarrier import IterationBarrier

    barrier = IterationBarrier("closure_inc", adaptive_width=True)
    old = barrier(_edges(closure).dropDuplicates(), "closure")
    fresh = _edges(new_edges).dropDuplicates()

    if restrictions is not None:
        r1 = barrier(
            restrictions.select(
                F.col("prop").alias("r_prop"),
                F.col("filler").alias("r_filler"),
                F.col("iri").alias("r_iri"),
            ),
            "restrictions",
        )

    def monotonicity(delta: DataFrame) -> DataFrame | None:
        if restrictions is None:
            return None
        return _monotonicity_rule(delta, r1)

    def compose(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.alias("x").join(b.alias("y"), F.col("x.sup") == F.col("y.sub"))
            .select(F.col("x.sub").alias("sub"), F.col("y.sup").alias("sup"))
        )

    # insertion delta seed: new, old∘new, new∘old, old∘new∘old
    seed = (
        fresh.unionByName(compose(old, fresh))
        .unionByName(compose(fresh, old))
        .unionByName(compose(compose(old, fresh), old))
    )
    mono = monotonicity(fresh)
    if mono is not None:
        seed = seed.unionByName(mono)
    full = old
    delta = barrier(
        seed.where(F.col("sub") != F.col("sup"))
        .dropDuplicates()
        .join(full, on=["sub", "sup"], how="left_anti"),
        "delta",
    )
    COMPACT_EVERY = 8
    for it in range(max_iterations):
        if delta.isEmpty():
            return full
        full = full.unionByName(delta)
        # non-linear: delta composes with the full (old + new) relation on
        # both sides, so derived∘derived chains and restriction edges close
        step = compose(delta, full).unionByName(compose(full, delta))
        mono = monotonicity(delta)
        if mono is not None:
            step = step.unionByName(mono)
        delta = barrier(
            step.where(F.col("sub") != F.col("sup"))
            .dropDuplicates()
            .join(full, on=["sub", "sup"], how="left_anti"),
            "delta",
        )
        if (it + 1) % COMPACT_EVERY == 0:
            full = barrier.materialize(full, "full")
            delta = barrier.materialize(delta, "delta")
            barrier.gc(keep=2)
    raise RuntimeError(
        f"incremental_closure_update did not converge in {max_iterations} iterations"
    )


def incremental_closure_delete(
    closure: DataFrame,
    asserted_edges: DataFrame,
    deleted_edges: DataFrame,
    restrictions: DataFrame | None = None,
    max_iterations: int = 100,
) -> DataFrame:
    """Maintain a materialized transitive closure under edge DELETIONS —
    DRed (delete-and-rederive, Gupta/Mumick/Subrahmanian SIGMOD'93):

    1. **Overdelete**: everything whose derivation might use a deleted
       edge — close the deleted set against the old closure on both sides
       (and through the monotonicity rule) until fixpoint, intersecting
       with the old closure so only existing facts are marked.
    2. **Remainder** R = closure − overdeleted.
    3. **Rederive**: put back any overdeleted fact with an alternative
       derivation from the surviving asserted edges + R (one-step base
       membership, R∘R composition, monotonicity over R), to fixpoint.

    ``asserted_edges`` is the ASSERTED base graph (the closure alone cannot
    distinguish asserted from derived); ``deleted_edges`` the batch being
    retracted. Returns the closure of (asserted − deleted), computed
    without a from-scratch refixpoint when the deletion touches a small
    region. Insertions go through :func:`incremental_closure_update`;
    a mixed batch = delete first, then insert.
    """
    from phenoscape_owl_tools_spark.iterbarrier import IterationBarrier

    barrier = IterationBarrier("closure_del", adaptive_width=True)
    old = barrier(_edges(closure).dropDuplicates(), "closure")
    deleted = _edges(deleted_edges).dropDuplicates()
    base_new = barrier(
        _edges(asserted_edges).dropDuplicates()
        .join(deleted, on=["sub", "sup"], how="left_anti"),
        "base",
    )
    if restrictions is not None:
        r1 = barrier(
            restrictions.select(
                F.col("prop").alias("r_prop"),
                F.col("filler").alias("r_filler"),
                F.col("iri").alias("r_iri"),
            ),
            "restrictions",
        )

    def mono(delta: DataFrame) -> DataFrame | None:
        return None if restrictions is None else _monotonicity_rule(delta, r1)

    def compose(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.alias("x").join(b.alias("y"), F.col("x.sup") == F.col("y.sub"))
            .select(F.col("x.sub").alias("sub"), F.col("y.sup").alias("sup"))
        )

    # ---- phase 1: overdelete ----
    over = barrier(deleted.join(old, on=["sub", "sup"], how="leftsemi"), "over")
    delta = over
    for _ in range(max_iterations):
        if delta.isEmpty():
            break
        step = compose(delta, old).unionByName(compose(old, delta))
        m = mono(delta)
        if m is not None:
            step = step.unionByName(m)
        delta = barrier(
            step.dropDuplicates()
            .join(old, on=["sub", "sup"], how="leftsemi")  # only existing facts
            .join(over, on=["sub", "sup"], how="left_anti"),
            "over_delta",
        )
        over = over.unionByName(delta)
    else:
        raise RuntimeError("overdeletion did not converge")

    remainder = barrier(old.join(over, on=["sub", "sup"], how="left_anti"), "rem")

    # ---- phase 3: rederive ----
    # Only overdeleted facts can come back, so restrict every composition
    # to the overdeleted facts' endpoints: for a target (a, c) ∈ over,
    # look for (a, b) and (b, c) in R — cost ∝ |over| × fanout, never the
    # all-pairs R∘R (that would be the direct_hierarchy two-hop blowup and
    # strictly worse than the from-scratch refixpoint this path avoids).
    R = remainder
    targets = barrier(over.join(remainder, on=["sub", "sup"], how="left_anti"),
                      "targets")
    for _ in range(max_iterations):
        if targets.isEmpty():
            return R
        bridged = (
            targets.alias("t")
            .join(R.alias("x"), F.col("t.sub") == F.col("x.sub"))
            .join(
                R.alias("y"),
                (F.col("x.sup") == F.col("y.sub"))
                & (F.col("y.sup") == F.col("t.sup")),
            )
            .select(F.col("t.sub").alias("sub"), F.col("t.sup").alias("sup"))
        )
        candidates = base_new.join(targets, on=["sub", "sup"], how="leftsemi")             .unionByName(bridged)
        m = mono(R)
        if m is not None:
            candidates = candidates.unionByName(
                m.join(targets, on=["sub", "sup"], how="leftsemi")
            )
        new = barrier(
            candidates.where(F.col("sub") != F.col("sup")).dropDuplicates(),
            "rederive",
        )
        if new.isEmpty():
            return R
        R = barrier.materialize(R.unionByName(new), "rem")
        targets = barrier(targets.join(new, on=["sub", "sup"], how="left_anti"),
                          "targets")
    raise RuntimeError("rederivation did not converge")


def incremental_closure_apply(
    closure: DataFrame,
    asserted_edges: DataFrame,
    deleted_edges: DataFrame,
    inserted_edges: DataFrame,
    restrictions: DataFrame | None = None,
    max_iterations: int = 100,
) -> DataFrame:
    """FUSED mixed-batch maintenance: closure((asserted − deleted) ∪
    inserted) in one overdelete pass + ONE combined rederive/insert loop.

    The sequential recipe (:func:`incremental_closure_delete` then
    :func:`incremental_closure_update`) pays two full fixpoint loops and
    re-derives the insert seed against the already-updated closure; here
    the rederivation rule (endpoint-constrained ``targets ⨝ R ⨝ R`` +
    one-step base membership — never all-pairs R∘R) and the insertion
    delta rule (``delta∘R ∪ R∘delta``) run in the SAME loop over one
    growing accumulator, so each round's new facts — whether rederived or
    insert-derived — immediately feed both rules. Correctness: every
    added fact has a derivation from the new base (both rules only join
    against facts already proven), and every fact of the true closure is
    reached (insert-derived chains by the semi-naive argument; rederivable
    overdeleted facts by iterating the target-constrained bridge until no
    round adds anything). Result equals the from-scratch closure of the
    mutated graph — asserted by the randomized mixed-batch test.
    """
    from phenoscape_owl_tools_spark.iterbarrier import IterationBarrier

    barrier = IterationBarrier("closure_apply", adaptive_width=True)
    old = barrier(_edges(closure).dropDuplicates(), "closure")
    deleted = _edges(deleted_edges).dropDuplicates()
    fresh = _edges(inserted_edges).dropDuplicates()
    surviving = (
        _edges(asserted_edges).dropDuplicates()
        .join(deleted, on=["sub", "sup"], how="left_anti")
    )
    base_full = barrier(surviving.unionByName(fresh).dropDuplicates(), "base")

    if restrictions is not None:
        r1 = barrier(
            restrictions.select(
                F.col("prop").alias("r_prop"),
                F.col("filler").alias("r_filler"),
                F.col("iri").alias("r_iri"),
            ),
            "restrictions",
        )

    def mono(delta: DataFrame) -> DataFrame | None:
        return None if restrictions is None else _monotonicity_rule(delta, r1)

    def compose(a: DataFrame, b: DataFrame) -> DataFrame:
        return (
            a.alias("x").join(b.alias("y"), F.col("x.sup") == F.col("y.sub"))
            .select(F.col("x.sub").alias("sub"), F.col("y.sup").alias("sup"))
        )

    # ---- phase 1: overdelete (identical to incremental_closure_delete) ----
    over = barrier(deleted.join(old, on=["sub", "sup"], how="leftsemi"), "over")
    delta = over
    for _ in range(max_iterations):
        if delta.isEmpty():
            break
        step = compose(delta, old).unionByName(compose(old, delta))
        m = mono(delta)
        if m is not None:
            step = step.unionByName(m)
        delta = barrier(
            step.dropDuplicates()
            .join(old, on=["sub", "sup"], how="leftsemi")
            .join(over, on=["sub", "sup"], how="left_anti"),
            "over_delta",
        )
        over = over.unionByName(delta)
    else:
        raise RuntimeError("overdeletion did not converge")

    R = barrier(old.join(over, on=["sub", "sup"], how="left_anti"), "rem")
    targets = barrier(over.join(R, on=["sub", "sup"], how="left_anti"), "targets")

    # ---- phase 2: combined rederive + insert fixpoint ----
    # one-time insert seed bridged through the remainder (facts needing
    # overdeleted bridges arrive later through the loop once rederived)
    seed = (
        fresh.unionByName(compose(R, fresh))
        .unionByName(compose(fresh, R))
        .unionByName(compose(compose(R, fresh), R))
    )
    m = mono(fresh)
    if m is not None:
        seed = seed.unionByName(m)
    delta = barrier(
        seed.where(F.col("sub") != F.col("sup"))
        .dropDuplicates()
        .join(R, on=["sub", "sup"], how="left_anti"),
        "delta",
    )
    targets_live = not targets.isEmpty()
    COMPACT_EVERY = 8
    for it in range(max_iterations):
        grow = delta
        if targets_live:
            bridged = (
                targets.alias("t")
                .join(R.alias("x"), F.col("t.sub") == F.col("x.sub"))
                .join(
                    R.alias("y"),
                    (F.col("x.sup") == F.col("y.sub"))
                    & (F.col("y.sup") == F.col("t.sup")),
                )
                .select(F.col("t.sub").alias("sub"), F.col("t.sup").alias("sup"))
            )
            cand = base_full.join(targets, on=["sub", "sup"], how="leftsemi") \
                .unionByName(bridged)
            mR = mono(R)
            if mR is not None:
                cand = cand.unionByName(
                    mR.join(targets, on=["sub", "sup"], how="leftsemi")
                )
            grow = grow.unionByName(cand)
        grow = barrier(
            grow.where(F.col("sub") != F.col("sup"))
            .dropDuplicates()
            .join(R, on=["sub", "sup"], how="left_anti"),
            "grow",
        )
        if grow.isEmpty():
            return R
        R = R.unionByName(grow)
        if (it + 1) % COMPACT_EVERY == 0:
            R = barrier.materialize(R, "rem")
        if targets_live:
            targets = barrier(
                targets.join(grow, on=["sub", "sup"], how="left_anti"), "targets"
            )
            targets_live = not targets.isEmpty()
        step = compose(grow, R).unionByName(compose(R, grow))
        m = mono(grow)
        if m is not None:
            step = step.unionByName(m)
        delta = barrier(
            step.where(F.col("sub") != F.col("sup"))
            .dropDuplicates()
            .join(R, on=["sub", "sup"], how="left_anti"),
            "delta",
        )
    raise RuntimeError("fused maintenance did not converge")


# ---------------------------------------------------------------------------
# Auto-strategy maintenance entry point
# ---------------------------------------------------------------------------

# Measured crossover (BENCH.md §9.2, same-boot A/Bs on 150k-1.5M node
# graphs; every run row-identical between strategies):
#   B-ary(10), avg ~7 reflexive ancestors/node:        incremental 0.38-0.47x
#   deep-40, mid-graph deletes (cone ~3.5% of closure): incremental 0.67x
#   deep-40, last-layer deletes (cone < 0.2%):          incremental 1.72x
# The composed incremental recipe pays ~10 fixed full-closure scans
# (overdelete/rederive semijoins + the insert seed's old-compose passes);
# from-scratch pays one scan per semi-naive round (~ graph depth). So the
# decision variables are the DEPTH PROXY (avg ancestors per node — a lower
# bound on from-scratch rounds) and the OVERDELETE-CONE fraction (how much
# of the closure the deletes can touch). Thresholds sit between the
# measured losing and winning shapes, biased toward from-scratch: a wrong
# 'scratch' pick costs <=2.6x (the 1.72x win forgone), a wrong
# 'incremental' pick also bottoms out ~2.6x (0.38x) but additionally
# doubles plan depth under restrictions — ties go to the simpler plan.
MAINTAIN_DEPTH_THRESHOLD = 20.0
MAINTAIN_CONE_FRACTION_THRESHOLD = 0.01


def choose_maintenance_strategy(
    closure: DataFrame,
    deleted_edges: DataFrame | None = None,
) -> dict:
    """Pick 'incremental' vs 'scratch' for a maintenance batch from two
    measured decision variables (see the threshold comment above):

    - ``depth_proxy`` = |closure| / #distinct-subjects — average ancestors
      per node, tracking the semi-naive round count a from-scratch
      recompute would pay (B-ary(10): ~7; the deep-40 bench graph: ~79).
    - ``cone_fraction`` = (Σ over deleted edges (u,v) of
      |descendants(u)+1| x |ancestors(v)+1|) / |closure| — an UPPER bound
      on the overdeleted facts as a fraction of the closure (cones
      overlap, so the true cone is <= this; conservative toward scratch).
      Last-layer retractions (the continuous-ingest shape) score ~0;
      mid-graph structural edits score the whole descendant cone.

    Probe cost: two aggregate scans of the closure plus a broadcast-sized
    join against the (batch-sized) delete set — far below the ~10 fixed
    closure scans the incremental path itself pays, and independent of
    graph depth. Returns a dict with the decision and both variables so
    callers/benches can log WHY.
    """
    c = _edges(closure)
    stats = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct("sub").alias("nodes"),
    ).first()
    n_closure = int(stats["n"])
    n_nodes = max(1, int(stats["nodes"]))
    depth_proxy = n_closure / n_nodes
    cone = 0
    if deleted_edges is not None and n_closure > 0:
        d = _edges(deleted_edges).dropDuplicates()
        # facts (a, c) derivable through deleted edge (u, v) need
        # (a, u) and (v, c) in the closure: count closure rows per
        # endpoint, then one broadcast join against the small batch
        desc_u = c.groupBy(F.col("sup").alias("u")).agg(F.count(F.lit(1)).alias("du"))
        anc_v = c.groupBy(F.col("sub").alias("v")).agg(F.count(F.lit(1)).alias("av"))
        cone_row = (
            d.join(desc_u, d["sub"] == F.col("u"), "left")
            .join(anc_v, d["sup"] == F.col("v"), "left")
            .select(
                (
                    (F.coalesce(F.col("du"), F.lit(0)) + 1)
                    * (F.coalesce(F.col("av"), F.lit(0)) + 1)
                ).alias("cone")
            )
            .agg(F.sum("cone").alias("s"))
            .first()
        )
        cone = int(cone_row["s"] or 0)
    cone_fraction = cone / n_closure if n_closure else 1.0
    strategy = (
        "incremental"
        if depth_proxy >= MAINTAIN_DEPTH_THRESHOLD
        and cone_fraction <= MAINTAIN_CONE_FRACTION_THRESHOLD
        else "scratch"
    )
    return {
        "strategy": strategy,
        "depth_proxy": depth_proxy,
        "cone_fraction": cone_fraction,
        "closure_rows": n_closure,
        "cone_upper_bound": cone,
    }


def maintain_closure(
    closure: DataFrame,
    asserted_edges: DataFrame,
    deleted_edges: DataFrame | None = None,
    inserted_edges: DataFrame | None = None,
    restrictions: DataFrame | None = None,
    max_iterations: int = 100,
    strategy: str | None = None,
) -> DataFrame:
    """Single maintenance entry point: closure((asserted − deleted) ∪
    inserted), auto-selecting :func:`incremental_closure_apply` vs a
    from-scratch :func:`transitive_closure` from measured decision
    variables (:func:`choose_maintenance_strategy` — BENCH §9.2's
    crossover, encoded). ``strategy`` forces 'incremental' or 'scratch'.

    The reference re-materializes from scratch unconditionally
    (MaterializeInferences.scala:44-57, its only mode); this picks the
    from-scratch plan only when the batch shape says recompute actually
    wins (shallow graphs, structural deletes) and otherwise maintains
    incrementally (deep graphs, recent-ingest retractions — the
    continuous-ingest shape at 10^12-doc scale). Both paths produce
    bit-identical closures (randomized equivalence tests).
    """
    spark = closure.sparkSession
    empty = spark.createDataFrame([], "sub string, sup string")
    deleted = _edges(deleted_edges) if deleted_edges is not None else empty
    inserted = _edges(inserted_edges) if inserted_edges is not None else empty
    if deleted.isEmpty() and inserted.isEmpty():
        return _edges(closure)
    if strategy is None:
        strategy = choose_maintenance_strategy(closure, deleted)["strategy"]
    if strategy == "incremental":
        return incremental_closure_apply(
            closure,
            asserted_edges,
            deleted,
            inserted,
            restrictions=restrictions,
            max_iterations=max_iterations,
        )
    if strategy != "scratch":
        raise ValueError(f"unknown maintenance strategy {strategy!r}")
    mutated = (
        _edges(asserted_edges)
        .dropDuplicates()
        .join(deleted, on=["sub", "sup"], how="left_anti")
        .unionByName(inserted)
    )
    return transitive_closure(
        mutated, restrictions=restrictions, max_iterations=max_iterations
    )
