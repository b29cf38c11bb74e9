"""Minimal SPARQL frontend over (subj, pred, obj) triple DataFrames.

The reference pipeline runs arbitrary SPARQL files against its triple store
(RunSPARQLQuery.scala:1-30, RunSPARQLConstruct.scala, RunSPARQLUpdate.scala);
this module covers the language subset its shipped queries actually use
(src/main/sparql/*.rq):

- ``PREFIX`` declarations, ``SELECT ?v ...`` and ``CONSTRUCT { ... }`` forms,
- basic graph patterns: IRIs (``<...>`` or prefixed names), variables,
  ``a`` for rdf:type,
- property paths: sequence ``p/q``, star ``p*``, plus ``p+``, inverse
  ``^p`` (per segment), alternation ``p1|p2``. DEVIATION from SPARQL 1.1
  precedence: grouping parens are unsupported, alternation binds tighter
  than ``/``, and a trailing ``*``/``+`` applies to the WHOLE alternation
  segment — ``p|q+`` here means ``(p|q)+``, where the spec reads
  ``p | (q+)``. Queries needing spec grouping must be rewritten as
  separate patterns/unions,
- ``FILTER(isIRI(?v))``, ``OPTIONAL { ... }``, ``{ ... } UNION { ... }``
  (one level — no nesting inside OPTIONAL/UNION groups),
- ``FROM <graph>`` (ignored — the input DataFrame IS the graph),
- SPARQL 1.1 Update statements (:func:`update`): ``INSERT DATA``,
  ``DELETE DATA``, ``DELETE WHERE``, ``DELETE {..} INSERT {..} WHERE {..}``
  — functional (the updated graph is returned), covering the reference's
  ``RunSPARQLUpdate`` tool.

Path semantics follow the engine's KB-build convention rather than strict
SPARQL 1.1 zero-length-path semantics: a *bare* starred pattern
(``?s p* ?o``) evaluates to the transitive closure WITHOUT trivial (x, x)
pairs — matching the materialized `subclass_closure` convention — while a
star in sequence position (``p/q*``) includes the zero-length hop
(``R_p ∪ R_p ∘ TC(q)``), matching `instance_closure`
(profile_instance_closure_construct.rq:11). Deviation is documented here
because the reference consumes these queries against a reasoner-materialized
store where the distinction is already baked in.

Evaluation is pure DataFrame composition: each triple pattern becomes a
filtered projection of the triple table, patterns join on shared variables
(Catalyst picks broadcast vs shuffle), star paths reuse
``operators.closure.transitive_closure`` (semi-naive, barrier-checkpointed).
No driver-side row iteration — results stay distributed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

_IRI_RE = r"<[^<>\s]*>"
_PNAME_RE = r"[A-Za-z][\w.-]*:[\w.-]*"
_VAR_RE = r"\?[A-Za-z_]\w*"
_TOKEN_RE = re.compile(
    rf"({_IRI_RE}|{_VAR_RE}|{_PNAME_RE}|[{{}}()./*|^+]|[A-Za-z_]\w*)"
)
# matches an absolute IRI (scheme://... or urn:-style); used for isIRI()
_IS_IRI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


@dataclass(frozen=True)
class Term:
    kind: str  # 'iri' | 'var'
    value: str


@dataclass(frozen=True)
class PathElem:
    iri: str                      # first (or only) alternative
    star: bool                    # p* — closure; zero-hop only mid-sequence
    alts: tuple[str, ...] = ()    # p1|p2|... (includes iri); () = just iri
    inverse: bool = False         # ^p — swap subject/object
    plus: bool = False            # p+ — closure, never a zero-hop

    @property
    def iris(self) -> tuple[str, ...]:
        return self.alts or (self.iri,)


@dataclass(frozen=True)
class Pattern:
    subj: Term
    path: tuple[PathElem, ...] | Term  # Term only for a variable predicate
    obj: Term


@dataclass
class Query:
    form: str  # 'select' | 'construct' | 'update'
    projection: list[str]  # select vars, in order
    template: list[tuple[Term, Term, Term]]  # construct template triples
    patterns: list[Pattern]
    iri_filters: list[str]  # var names under FILTER(isIRI(?v))
    # update-only (SPARQL 1.1 Update, RunSPARQLUpdate.scala:1-29):
    delete_template: list[tuple[Term, Term, Term]] | None = None
    insert_template: list[tuple[Term, Term, Term]] | None = None
    # group algebra: OPTIONAL {..} groups (left-joined on shared vars) and
    # {..} UNION {..} blocks (each a list of arms)
    optionals: list[list[Pattern]] | None = None
    unions: list[list[list[Pattern]]] | None = None


def _strip_comments(text: str) -> str:
    out_lines = []
    for ln in text.splitlines():
        in_iri = False
        for i, ch in enumerate(ln):
            if ch == "<":
                in_iri = True
            elif ch == ">":
                in_iri = False
            elif ch == "#" and not in_iri:
                ln = ln[:i]
                break
        out_lines.append(ln)
    return "\n".join(out_lines)


def _tokens(text: str) -> list[str]:
    return _TOKEN_RE.findall(text)


class _Parser:
    def __init__(self, text: str):
        text = _strip_comments(text)
        self.prefixes: dict[str, str] = {}
        for m in re.finditer(
            rf"(?i)\bPREFIX\s+([A-Za-z][\w-]*)?\s*:\s*<([^>]*)>", text
        ):
            self.prefixes[m.group(1) or ""] = m.group(2)
        body = re.sub(rf"(?i)\bPREFIX\s+[\w-]*\s*:\s*<[^>]*>", " ", text)
        body = re.sub(rf"(?i)\bFROM\s+(NAMED\s+)?<[^>]*>", " ", body)
        self.toks = _tokens(body)
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, tok: str) -> None:
        got = self.next()
        if got.lower() != tok.lower():
            raise ValueError(f"SPARQL parse: expected {tok!r}, got {got!r}")

    def resolve(self, tok: str) -> str:
        if tok.startswith("<"):
            return tok[1:-1]
        pfx, _, local = tok.partition(":")
        if pfx not in self.prefixes:
            raise ValueError(f"SPARQL parse: unknown prefix {pfx!r} in {tok!r}")
        return self.prefixes[pfx] + local

    def term(self) -> Term:
        tok = self.next()
        if tok.startswith("?"):
            return Term("var", tok[1:])
        if tok == "a":
            return Term("iri", RDF_TYPE)
        return Term("iri", self.resolve(tok))

    def _path_elem(self, first: Term | None = None) -> PathElem:
        """One segment: [^]iri(|[^]iri)*[*+]. Alternation binds tighter
        than sequence here (``a|b/c`` = ``(a|b)/c``; SPARQL's grouping
        parens are not supported — deviation documented in the module
        docstring)."""
        inverse = False
        if first is None:
            if self.peek() == "^":
                self.next()
                inverse = True
            first = self.term()
        if first.kind != "iri":
            raise ValueError("SPARQL parse: variables not allowed inside paths")
        alts = [first.value]
        while self.peek() == "|":
            self.next()
            if self.peek() == "^":
                raise ValueError("SPARQL parse: ^ applies to a whole segment, "
                                 "not one alternative")
            nxt = self.term()
            if nxt.kind != "iri":
                raise ValueError("SPARQL parse: variables not allowed inside paths")
            alts.append(nxt.value)
        star = plus = False
        if self.peek() == "*":
            self.next()
            star = True
        elif self.peek() == "+":
            self.next()
            plus = True
        return PathElem(alts[0], star, tuple(alts), inverse, plus)

    def path(self) -> tuple[PathElem, ...] | Term:
        inverse_first = False
        if self.peek() == "^":
            self.next()
            inverse_first = True
        first = self.term()
        if (not inverse_first and first.kind == "var"
                and self.peek() not in ("/", "*", "+", "|")):
            return first  # variable predicate
        elems = [self._path_elem(first)]
        if inverse_first:
            elems[0] = PathElem(elems[0].iri, elems[0].star, elems[0].alts,
                                True, elems[0].plus)
        while self.peek() == "/":
            self.next()
            elems.append(self._path_elem())
        return tuple(elems)

    def group(self) -> tuple[list[Pattern], list[str], list, list]:
        """Parse { ... } into (patterns, isIRI-filter vars, optionals,
        unions). OPTIONAL / UNION sub-groups may contain only basic
        patterns and FILTER(isIRI) (no nesting)."""
        self.expect("{")
        patterns: list[Pattern] = []
        filters: list[str] = []
        optionals: list[list[Pattern]] = []
        unions: list[list[list[Pattern]]] = []
        def subgroup(kind: str):
            sub_p, sub_f, sub_o, sub_u = self.group()
            if sub_o or sub_u:
                raise ValueError("SPARQL parse: nested OPTIONAL/UNION unsupported")
            if not sub_p:
                raise ValueError(f"SPARQL parse: empty {kind} group")
            # sub-group filters stay WITH the group: applied to its own
            # solutions before the join, so an OPTIONAL's filter cannot
            # discard outer rows (SPARQL filter scope)
            return sub_p, sub_f

        while self.peek() is not None and self.peek() != "}":
            if self.peek().lower() == "optional":
                self.next()
                optionals.append(subgroup("OPTIONAL"))
                if self.peek() == ".":
                    self.next()
                continue
            if self.peek() == "{":
                arms = [subgroup("UNION")]
                while self.peek() is not None and self.peek().lower() == "union":
                    self.next()
                    arms.append(subgroup("UNION"))
                if len(arms) < 2:
                    raise ValueError("SPARQL parse: bare group braces need UNION")
                unions.append(arms)
                if self.peek() == ".":
                    self.next()
                continue
            if self.peek().lower() == "filter":
                self.next()
                self.expect("(")
                fn = self.next()
                if fn.lower() != "isiri":
                    raise ValueError(f"SPARQL parse: unsupported FILTER {fn!r}")
                self.expect("(")
                var = self.next()
                if not var.startswith("?"):
                    raise ValueError("SPARQL parse: FILTER(isIRI(..)) needs a var")
                filters.append(var[1:])
                self.expect(")")
                self.expect(")")
            else:
                subj = self.term()
                path = self.path()
                obj = self.term()
                patterns.append(Pattern(subj, path, obj))
            if self.peek() == ".":
                self.next()
        self.expect("}")
        return patterns, filters, optionals, unions

    def parse(self) -> Query:
        form = self.next().lower()
        if form == "select":
            projection = []
            if self.peek() and self.peek().lower() == "distinct":
                self.next()
            while self.peek() and self.peek().startswith("?"):
                projection.append(self.next()[1:])
            self.expect("where")
            patterns, filters, optionals, unions = self.group()
            return Query("select", projection, [], patterns, filters,
                         optionals=optionals, unions=unions)
        if form == "construct":
            self.expect("{")
            template = []
            while self.peek() != "}":
                s, p, o = self.term(), self.term(), self.term()
                template.append((s, p, o))
                if self.peek() == ".":
                    self.next()
            self.expect("}")
            if self.peek() and self.peek().lower() == "where":
                self.next()
            patterns, filters, optionals, unions = self.group()
            return Query("construct", [], template, patterns, filters,
                         optionals=optionals, unions=unions)
        if form in ("insert", "delete"):
            return self._parse_update(form)
        raise ValueError(f"SPARQL parse: unsupported query form {form!r}")

    def template_block(self) -> list[tuple[Term, Term, Term]]:
        self.expect("{")
        template = []
        while self.peek() != "}":
            s, p, o = self.term(), self.term(), self.term()
            template.append((s, p, o))
            if self.peek() == ".":
                self.next()
        self.expect("}")
        return template

    def _parse_update(self, form: str) -> Query:
        """INSERT DATA / DELETE DATA / DELETE [INSERT] WHERE / DELETE WHERE.

        One statement per document (no ';'-chaining); templates are
        IRI-term triples, matching the engine's IRI-valued triple frames.
        """
        delete_template: list | None = None
        insert_template: list | None = None
        nxt = self.peek()
        if nxt is not None and nxt.lower() == "data":
            self.next()
            tmpl = self.template_block()
            for s, p, o in tmpl:
                if "var" in (s.kind, p.kind, o.kind):
                    raise ValueError("SPARQL parse: variables in DATA block")
            if form == "insert":
                insert_template = tmpl
            else:
                delete_template = tmpl
            return Query("update", [], [], [], [], delete_template, insert_template)
        if form == "delete" and nxt is not None and nxt.lower() == "where":
            # DELETE WHERE { P } — the pattern doubles as the template
            self.next()
            patterns, filters, _opt, _uni = self.group()
            if _opt or _uni:
                raise ValueError("SPARQL parse: OPTIONAL/UNION not allowed in DELETE WHERE")
            delete_template = []
            for pat in patterns:
                if isinstance(pat.path, Term):
                    pred = pat.path
                elif (len(pat.path) == 1 and not pat.path[0].star
                      and not pat.path[0].plus and not pat.path[0].inverse
                      and len(pat.path[0].iris) == 1):
                    pred = Term("iri", pat.path[0].iri)
                else:
                    raise ValueError(
                        "SPARQL parse: property paths not allowed in DELETE WHERE")
                delete_template.append((pat.subj, pred, pat.obj))
            return Query("update", [], [], patterns, filters, delete_template, None)
        if form == "delete":
            delete_template = self.template_block()
            if self.peek() is not None and self.peek().lower() == "insert":
                self.next()
                insert_template = self.template_block()
        else:
            insert_template = self.template_block()
        self.expect("where")
        patterns, filters, optionals, unions = self.group()
        return Query("update", [], [], patterns, filters,
                     delete_template, insert_template,
                     optionals=optionals, unions=unions)


def parse(text: str) -> Query:
    return _Parser(text).parse()


def _path_relation(triples: DataFrame, path: tuple[PathElem, ...]) -> DataFrame:
    """Evaluate a property path to a binary relation (s, o)."""
    from phenoscape_owl_tools_spark.operators.closure import transitive_closure

    rel: DataFrame | None = None
    for elem in path:
        edges = triples.where(F.col("pred").isin(*elem.iris)).select(
            F.col("subj").alias("s"), F.col("obj").alias("o")
        )
        if elem.inverse:
            edges = edges.select(F.col("o").alias("s"), F.col("s").alias("o"))
        if elem.star or elem.plus:
            step = transitive_closure(
                edges.withColumnRenamed("s", "sub").withColumnRenamed("o", "sup")
            ).select(F.col("sub").alias("s"), F.col("sup").alias("o"))
        else:
            step = edges
        if rel is None:
            # leading elem; for a bare star this is the closure WITHOUT
            # trivial reflexive pairs (KB-build convention, module docstring)
            rel = step
        else:
            nxt = step.select(F.col("s").alias("m"), F.col("o").alias("o2"))
            composed = (
                rel.join(nxt, rel["o"] == nxt["m"])
                .select("s", F.col("o2").alias("o"))
            )
            if elem.star:
                # zero-length hop allowed mid-sequence: R ∪ R ∘ TC(q)
                rel = rel.unionByName(composed).dropDuplicates()
            else:
                rel = composed
    assert rel is not None
    return rel


def _bindings(triples: DataFrame, pat: Pattern) -> DataFrame:
    """One pattern -> DataFrame whose columns are the pattern's variables."""
    if isinstance(pat.path, Term):  # variable predicate
        rel = triples.select(
            F.col("subj").alias("s"), F.col("pred").alias("p"), F.col("obj").alias("o")
        )
        cols = {"s": pat.subj, "p": pat.path, "o": pat.obj}
    else:
        rel = _path_relation(triples, pat.path)
        cols = {"s": pat.subj, "o": pat.obj}
    out_cols = []
    for src, term in cols.items():
        if term.kind == "var":
            out_cols.append(F.col(src).alias(term.value))
        else:
            rel = rel.where(F.col(src) == term.value)
    if not out_cols:
        out_cols = [F.lit(1).alias("__const__")]
    return rel.select(*out_cols).dropDuplicates()


def evaluate(triples: DataFrame, query: Query | str) -> DataFrame:
    """Run a parsed (or raw-text) query against a (subj, pred, obj) frame.

    SELECT returns the projected variable columns (names without '?');
    CONSTRUCT returns a distinct (subj, pred, obj) frame.
    """
    if isinstance(query, str):
        query = parse(query)
    if query.form == "update":
        raise ValueError("SPARQL evaluate: use update() for update statements")
    if not query.patterns and not query.unions:
        raise ValueError("SPARQL evaluate: empty graph pattern")
    bound = _solve(triples, query)
    if query.form == "select":
        return bound.select(*query.projection)
    return _instantiate(bound, query.template)


def _join_patterns(triples: DataFrame, patterns: list,
                   filters: list[str] | None = None) -> DataFrame:
    bound: DataFrame | None = None
    for pat in patterns:
        b = _bindings(triples, pat)
        if bound is None:
            bound = b
        else:
            shared = sorted(set(bound.columns) & set(b.columns))
            bound = bound.join(b, on=shared) if shared else bound.crossJoin(b)
    assert bound is not None  # parser rejects empty groups
    for var in filters or []:
        if var in bound.columns:
            bound = bound.where(F.col(var).rlike(_IS_IRI_RE))
    return bound


def _merge(bound: DataFrame | None, other: DataFrame, how: str = "inner") -> DataFrame:
    if bound is None:
        return other
    shared = sorted(set(bound.columns) & set(other.columns))
    if not shared:
        if how == "inner":
            return bound.crossJoin(other)
        # OPTIONAL with no shared vars: every mapping is compatible (cross
        # product); an EMPTY optional must still keep bound's rows with the
        # group's vars unbound — a constant-true left join gives both
        return bound.join(other, F.lit(True), "left")
    return bound.join(other, on=shared, how=how)


def _solve(triples: DataFrame, query: Query) -> DataFrame:
    """Join the BGP's pattern bindings into one solution frame.

    Group algebra: a UNION block distributes over the join — each arm is
    solved (with its own filters) and merged with the main solutions
    independently, then the merged frames union (vars an arm never binds become
    nulls = SPARQL's unbound). Joining per-arm rather than after the union
    keeps every join an equi-join on genuinely bound vars — no null keys.
    OPTIONAL groups left-join on their shared vars.
    """
    bound = _join_patterns(triples, query.patterns) if query.patterns else None
    for arms in query.unions or []:
        merged = [
            _merge(bound, _join_patterns(triples, arm_p, arm_f))
            for arm_p, arm_f in arms
        ]
        u = merged[0]
        for f in merged[1:]:
            u = u.unionByName(f, allowMissingColumns=True)
        bound = u
    for opt_p, opt_f in query.optionals or []:
        bound = _merge(bound, _join_patterns(triples, opt_p, opt_f), how="left")
    assert bound is not None
    for var in query.iri_filters:
        if var in bound.columns:
            bound = bound.where(F.col(var).rlike(_IS_IRI_RE))
    return bound


def _instantiate(bound: DataFrame, template: list) -> DataFrame:
    """Apply solutions to a triple template (CONSTRUCT / update halves)."""

    def _tcol(term: Term, alias: str):
        return (
            F.col(term.value) if term.kind == "var" else F.lit(term.value)
        ).alias(alias)

    parts = [
        bound.select(_tcol(s, "subj"), _tcol(p, "pred"), _tcol(o, "obj"))
        for s, p, o in template
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.dropDuplicates()


def update(triples: DataFrame, statement: Query | str) -> DataFrame:
    """Apply a SPARQL 1.1 Update statement, returning the new graph.

    The reference's RunSPARQLUpdate (RunSPARQLUpdate.scala:1-29) mutates a
    Blazegraph store in place; DataFrames are immutable, so the updated
    graph is returned (set semantics — the result is distinct, as an RDF
    graph is a set of triples). Supported: INSERT DATA, DELETE DATA,
    DELETE WHERE, and DELETE/INSERT(/WHERE) with templates.
    """
    if isinstance(statement, str):
        statement = parse(statement)
    if statement.form != "update":
        raise ValueError("SPARQL update: not an update statement")
    spark = triples.sparkSession
    cols = ["subj", "pred", "obj"]

    def _ground(template: list) -> DataFrame:
        rows = [(s.value, p.value, o.value) for s, p, o in template]
        return spark.createDataFrame(rows, schema="subj string, pred string, obj string")

    if statement.patterns or statement.unions or statement.optionals:
        bound = _solve(triples, statement)
        delete_df = (
            _instantiate(bound, statement.delete_template)
            if statement.delete_template else None
        )
        insert_df = (
            _instantiate(bound, statement.insert_template)
            if statement.insert_template else None
        )
    else:  # INSERT DATA / DELETE DATA
        delete_df = _ground(statement.delete_template) if statement.delete_template else None
        insert_df = _ground(statement.insert_template) if statement.insert_template else None

    out = triples.select(*cols).dropDuplicates()
    if delete_df is not None:
        out = out.join(F.broadcast(delete_df) if not statement.patterns else delete_df,
                       on=cols, how="left_anti")
    if insert_df is not None:
        out = out.unionByName(insert_df.select(*cols)).dropDuplicates()
    return out


def run_update_file(triples: DataFrame, path: str) -> DataFrame:
    with open(path, "r", encoding="utf-8") as fh:
        return update(triples, fh.read())


def run_file(triples: DataFrame, path: str) -> DataFrame:
    with open(path, "r", encoding="utf-8") as fh:
        return evaluate(triples, fh.read())
