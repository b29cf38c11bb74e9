"""Minimal SPARQL frontend over (subj, pred, obj) triple DataFrames.

The reference pipeline runs arbitrary SPARQL files against its triple store
(RunSPARQLQuery.scala:1-30, RunSPARQLConstruct.scala, RunSPARQLUpdate.scala);
this module covers the language subset its shipped queries actually use
(src/main/sparql/*.rq):

- ``PREFIX`` declarations, ``SELECT ?v ...`` and ``CONSTRUCT { ... }`` forms,
- basic graph patterns: IRIs (``<...>`` or prefixed names), variables,
  ``a`` for rdf:type,
- property paths with SPARQL 1.1 grammar and precedence: grouping parens
  ``(p/q)*``, sequence ``p/q``, alternation ``p1|p2`` (binding LOOSER than
  ``/``, per spec — ``p|q+`` is ``p | (q+)``), star ``p*``, plus ``p+``,
  zero-or-one ``p?`` (sequence position only — a leading/bare ``p?`` has
  no bounded domain for its zero-length arm and raises), inverse ``^p``
  (applies to the following path element, including its modifier),
- ``FILTER`` with ``isIRI(?v)``, ``regex(?v, "pat"[, "flags"])``,
  comparisons ``?v OP term`` (``= != < <= > >=``; term = var, IRI, number,
  or string — numeric RHS compares numerically), ``!`` negation, ``&&``
  conjunction and ``||`` disjunction with spec precedence (``&&`` binds
  tighter) and parenthesized sub-expressions. A FILTER referencing a
  variable no pattern in scope binds raises (strict — a typo'd var must
  not silently return unfiltered rows),
- ``OPTIONAL { ... }`` (nests: an OPTIONAL may contain its own OPTIONAL
  groups, any depth), ``{ ... } UNION { ... }`` — multiple UNION blocks
  per group supported (the solver distributes the join over the blocks'
  arm product so no join ever sees a null key); a UNION arm may carry
  its own (nested) OPTIONAL groups — only a UNION nested inside another
  UNION arm is rejected. Group algebra LIMITATION:
  OPTIONAL groups are evaluated AFTER the basic patterns and UNION blocks
  regardless of textual order (left-associative SPARQL group ordering is
  not reproduced; for BGP+UNION+OPTIONAL shapes the results coincide),
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
_STR_RE = r'"(?:[^"\\]|\\.)*"'
_NUM_RE = r"\d+(?:\.\d+)?(?:[eE][+-]?\d+)?"
_TOKEN_RE = re.compile(
    rf"({_IRI_RE}|{_VAR_RE}|{_STR_RE}|{_NUM_RE}|!=|<=|>=|&&|\|\||"
    rf"{_PNAME_RE}|[{{}}()./*|^+<>=!?,]|[A-Za-z_]\w*)"
)
# matches an absolute IRI (scheme://... or urn:-style); used for isIRI()
_IS_IRI_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://"


@dataclass(frozen=True)
class Term:
    kind: str  # 'iri' | 'var'
    value: str


@dataclass(frozen=True)
class PathNode:
    """SPARQL 1.1 property-path AST with spec precedence:
    ``alt`` > ``seq`` > ``inv``/modifier > ``primary`` (iri or parens)."""

    op: str  # 'iri' | 'seq' | 'alt' | 'inv' | 'star' | 'plus' | 'opt'
    iri: str = ""
    kids: tuple["PathNode", ...] = ()


@dataclass(frozen=True)
class Pattern:
    subj: Term
    path: PathNode | Term  # Term only for a variable predicate
    obj: Term


@dataclass(frozen=True)
class Filter:
    """One FILTER condition, compiled to a Column over the solution frame.

    kinds: ``isiri`` (var matches absolute-IRI regex), ``regex``
    (rhs = pattern, flags = regex flags, 'i' supported), ``cmp``
    (var OP rhs; rhs_kind 'num' compares numerically via a double cast,
    'var' compares against another binding, else string comparison),
    ``and`` / ``or`` (boolean combinations of ``kids`` — a disjunction is a
    plain Column OR over the SAME solution frame, never a UNION rewrite)."""

    kind: str  # 'isiri' | 'regex' | 'cmp' | 'and' | 'or'
    var: str
    neg: bool = False
    op: str = ""          # cmp: '=' '!=' '<' '<=' '>' '>='
    rhs: str = ""         # cmp: value/var name; regex: pattern
    rhs_kind: str = ""    # cmp: 'var' | 'num' | 'str' | 'iri'
    flags: str = ""       # regex flags
    kids: tuple["Filter", ...] = ()  # and/or: sub-expressions

    @property
    def vars(self) -> tuple[str, ...]:
        if self.kind in ("and", "or"):
            seen: dict[str, None] = {}
            for k in self.kids:
                for v in k.vars:
                    seen[v] = None
            return tuple(seen)
        if self.kind == "cmp" and self.rhs_kind == "var":
            return (self.var, self.rhs)
        return (self.var,)

    def column(self):
        if self.kind in ("and", "or"):
            cond = self.kids[0].column()
            for k in self.kids[1:]:
                cond = (cond & k.column()) if self.kind == "and" else (cond | k.column())
            return ~cond if self.neg else cond
        c = F.col(self.var)
        if self.kind == "isiri":
            cond = c.rlike(_IS_IRI_RE)
        elif self.kind == "regex":
            pat = ("(?i)" + self.rhs) if "i" in self.flags else self.rhs
            cond = c.rlike(pat)
        else:
            if self.rhs_kind == "var":
                lhs, rhs = c, F.col(self.rhs)
            elif self.rhs_kind == "num":
                lhs, rhs = c.cast("double"), F.lit(float(self.rhs))
            else:
                lhs, rhs = c, F.lit(self.rhs)
            cond = {
                "=": lhs == rhs, "!=": lhs != rhs, "<": lhs < rhs,
                "<=": lhs <= rhs, ">": lhs > rhs, ">=": lhs >= rhs,
            }[self.op]
        return ~cond if self.neg else cond


@dataclass
class Query:
    form: str  # 'select' | 'construct' | 'update'
    projection: list[str]  # select vars, in order
    template: list[tuple[Term, Term, Term]]  # construct template triples
    patterns: list[Pattern]
    filters: list[Filter]
    # update-only (SPARQL 1.1 Update, RunSPARQLUpdate.scala:1-29):
    delete_template: list[tuple[Term, Term, Term]] | None = None
    insert_template: list[tuple[Term, Term, Term]] | None = None
    # group algebra: OPTIONAL {..} groups (left-joined on shared vars) and
    # {..} UNION {..} blocks (each a list of arms); every group/arm is a
    # (patterns, filters, sub_optionals) tuple — see _Parser.group
    optionals: list[tuple] | None = None
    unions: list[list[tuple]] | None = None

    @property
    def iri_filters(self) -> list[str]:
        """Vars under a positive FILTER(isIRI(?v)) — compat convenience."""
        return [f.var for f in self.filters if f.kind == "isiri" and not f.neg]


def _strip_comments(text: str) -> str:
    out_lines = []
    for ln in text.splitlines():
        in_iri = in_str = False
        i = 0
        while i < len(ln):
            ch = ln[i]
            if in_str:
                if ch == "\\":
                    i += 1  # skip escaped char
                elif ch == '"':
                    in_str = False
            elif ch == '"':
                in_str = True
            elif ch == "<":
                in_iri = True
            elif ch == ">":
                in_iri = False
            elif ch == "#" and not in_iri:
                ln = ln[:i]
                break
            i += 1
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

    def path(self) -> PathNode | Term:
        """SPARQL 1.1 Path grammar, spec precedence:
        Path := Seq ('|' Seq)* ; Seq := EltOrInv ('/' EltOrInv)* ;
        EltOrInv := '^' Elt | Elt ; Elt := Primary ('*'|'+'|'?')? ;
        Primary := iri | 'a' | '(' Path ')'."""
        nxt = self.peek()
        if nxt is not None and nxt.startswith("?"):
            var = self.term()
            if self.peek() in ("/", "*", "+", "|", "?", "^"):
                raise ValueError("SPARQL parse: variables not allowed inside paths")
            return var  # variable predicate
        return self._path_alt()

    def _path_alt(self) -> PathNode:
        kids = [self._path_seq()]
        while self.peek() == "|":
            self.next()
            kids.append(self._path_seq())
        return kids[0] if len(kids) == 1 else PathNode("alt", kids=tuple(kids))

    def _path_seq(self) -> PathNode:
        kids = [self._path_elt_or_inv()]
        while self.peek() == "/":
            self.next()
            kids.append(self._path_elt_or_inv())
        return kids[0] if len(kids) == 1 else PathNode("seq", kids=tuple(kids))

    def _path_elt_or_inv(self) -> PathNode:
        if self.peek() == "^":
            self.next()
            return PathNode("inv", kids=(self._path_elt(),))
        return self._path_elt()

    def _path_elt(self) -> PathNode:
        node = self._path_primary()
        if self.peek() == "*":
            self.next()
            return PathNode("star", kids=(node,))
        if self.peek() == "+":
            self.next()
            return PathNode("plus", kids=(node,))
        if self.peek() == "?":
            self.next()
            return PathNode("opt", kids=(node,))
        return node

    def _path_primary(self) -> PathNode:
        if self.peek() == "(":
            self.next()
            node = self._path_alt()
            self.expect(")")
            return node
        t = self.term()
        if t.kind != "iri":
            raise ValueError("SPARQL parse: variables not allowed inside paths")
        return PathNode("iri", iri=t.value)

    def group(self) -> tuple[list[Pattern], list, list, list]:
        """Parse { ... } into (patterns, filters, optionals, unions).

        OPTIONAL groups nest: each optionals entry is
        ``(patterns, filters, sub_optionals)`` where sub_optionals is the
        same shape recursively (``OPTIONAL { .. OPTIONAL { .. } }``).
        UNION arms are ``(patterns, filters, optionals)`` — an arm may
        carry its own (nested) OPTIONAL groups; only a UNION nested
        inside another UNION arm is still rejected. Multiple UNION
        blocks per group are supported: the solver distributes the join
        over the blocks' arm product, so every join stays an equi-join
        on genuinely-bound vars (no null keys)."""
        self.expect("{")
        patterns: list[Pattern] = []
        filters: list[Filter] = []
        optionals: list[tuple] = []
        unions: list[list[tuple]] = []
        def subgroup(kind: str):
            sub_p, sub_f, sub_o, sub_u = self.group()
            if sub_u:
                raise ValueError(f"SPARQL parse: UNION nested in {kind} unsupported")
            if not sub_p:
                raise ValueError(f"SPARQL parse: empty {kind} group")
            # sub-group filters stay WITH the group: applied to its own
            # solutions before the join, so an OPTIONAL's filter cannot
            # discard outer rows (SPARQL filter scope)
            return sub_p, sub_f, sub_o

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
                filters.extend(self._filter_constraint())
            else:
                subj = self.term()
                path = self.path()
                obj = self.term()
                patterns.append(Pattern(subj, path, obj))
            if self.peek() == ".":
                self.next()
        self.expect("}")
        return patterns, filters, optionals, unions

    def _filter_constraint(self) -> list[Filter]:
        """After the FILTER keyword: ``(expr)`` with full ``&&``/``||``
        boolean structure (``&&`` binds tighter than ``||``, per the SPARQL
        grammar), or a bare function call ``regex(..)`` / ``isIRI(..)``.
        A top-level conjunction is flattened into the filter list (each
        conjunct its own Filter); a disjunction stays one ``or`` Filter."""
        if self.peek() == "(":
            self.next()
            f = self._filter_or()
            self.expect(")")
            if f.kind == "and" and not f.neg:
                return list(f.kids)
            return [f]
        return [self._filter_expr()]

    def _filter_or(self) -> Filter:
        out = [self._filter_and()]
        while self.peek() == "||":
            self.next()
            out.append(self._filter_and())
        return out[0] if len(out) == 1 else Filter("or", "", kids=tuple(out))

    def _filter_and(self) -> Filter:
        out = [self._filter_expr()]
        while self.peek() == "&&":
            self.next()
            out.append(self._filter_expr())
        return out[0] if len(out) == 1 else Filter("and", "", kids=tuple(out))

    def _filter_var(self) -> str:
        tok = self.next()
        if not tok.startswith("?"):
            raise ValueError(f"SPARQL parse: FILTER expected a ?var, got {tok!r}")
        return tok[1:]

    def _filter_expr(self) -> Filter:
        neg = False
        while self.peek() == "!":
            self.next()
            neg = not neg
        tok = self.peek()
        if tok is not None and tok.lower() == "isiri":
            self.next()
            self.expect("(")
            var = self._filter_var()
            self.expect(")")
            return Filter("isiri", var, neg=neg)
        if tok is not None and tok.lower() == "regex":
            self.next()
            self.expect("(")
            var = self._filter_var()
            self.expect(",")
            pat = self.next()
            if not pat.startswith('"'):
                raise ValueError("SPARQL parse: regex pattern must be a string")
            flags = ""
            if self.peek() == ",":
                self.next()
                ftok = self.next()
                if not ftok.startswith('"'):
                    raise ValueError("SPARQL parse: regex flags must be a string")
                flags = ftok[1:-1]
            self.expect(")")
            return Filter("regex", var, neg=neg, rhs=pat[1:-1], flags=flags)
        if self.peek() == "(":  # parenthesized sub-expression (full &&/|| grammar)
            self.next()
            inner = self._filter_or()
            self.expect(")")
            import dataclasses

            return dataclasses.replace(inner, neg=inner.neg != neg)
        var = self._filter_var()
        op = self.next()
        if op not in ("=", "!=", "<", "<=", ">", ">="):
            raise ValueError(f"SPARQL parse: unsupported FILTER operator {op!r}")
        rhs = self.next()
        if rhs.startswith("?"):
            kind, val = "var", rhs[1:]
        elif rhs.startswith('"'):
            kind, val = "str", rhs[1:-1]
        elif re.fullmatch(_NUM_RE, rhs):
            kind, val = "num", rhs
        else:
            kind, val = "iri", self.resolve(rhs)
        return Filter("cmp", var, neg=neg, op=op, rhs=val, rhs_kind=kind)

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
                elif pat.path.op == "iri":
                    pred = Term("iri", pat.path.iri)
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


def _alt_leaf_iris(node: PathNode) -> list[str] | None:
    """If ``node`` is an iri or an alternation of plain iris (possibly
    nested), the flat iri list — the single-``isin``-scan fast path."""
    if node.op == "iri":
        return [node.iri]
    if node.op == "alt":
        out: list[str] = []
        for k in node.kids:
            leaf = _alt_leaf_iris(k)
            if leaf is None:
                return None
            out.extend(leaf)
        return out
    return None


def _path_relation(triples: DataFrame, node: PathNode) -> DataFrame:
    """Evaluate a property-path AST to a binary relation (s, o).

    Closure semantics follow the engine's KB-build convention (module
    docstring): ``star``/``plus`` evaluate to the transitive closure of the
    sub-path's relation WITHOUT reflexive pairs; a star or ``?`` in
    SEQUENCE position contributes its zero-length arm as ``R ∪ R∘TC(q)``.
    A leading/bare ``p?`` has no bounded domain for the zero-length arm and
    raises."""
    from phenoscape_owl_tools_spark.operators.closure import transitive_closure

    leaves = _alt_leaf_iris(node)
    if leaves is not None:
        return triples.where(F.col("pred").isin(*leaves)).select(
            F.col("subj").alias("s"), F.col("obj").alias("o")
        )
    if node.op == "alt":
        rel = _path_relation(triples, node.kids[0])
        for k in node.kids[1:]:
            rel = rel.unionByName(_path_relation(triples, k))
        return rel.dropDuplicates()
    if node.op == "inv":
        sub = _path_relation(triples, node.kids[0])
        return sub.select(F.col("o").alias("s"), F.col("s").alias("o"))
    if node.op in ("star", "plus"):
        sub = _path_relation(triples, node.kids[0])
        return transitive_closure(
            sub.withColumnRenamed("s", "sub").withColumnRenamed("o", "sup")
        ).select(F.col("sub").alias("s"), F.col("sup").alias("o"))
    if node.op == "opt":
        raise ValueError(
            "SPARQL evaluate: zero-or-one path 'p?' needs a sequence context "
            "for its zero-length arm (bare/leading 'p?' has no bounded domain)"
        )
    assert node.op == "seq", node.op
    rel: DataFrame | None = None
    for kid in node.kids:
        zero_ok = kid.op in ("star", "opt")
        step = _path_relation(triples, kid.kids[0] if kid.op == "opt" else kid)
        if rel is None:
            if kid.op == "opt":
                raise ValueError(
                    "SPARQL evaluate: leading 'p?' in a sequence is unsupported "
                    "(zero-length arm has no bounded domain)"
                )
            # leading elem; for a star this is the closure WITHOUT trivial
            # reflexive pairs (KB-build convention, module docstring)
            rel = step
        else:
            nxt = step.select(F.col("s").alias("m"), F.col("o").alias("o2"))
            composed = (
                rel.join(nxt, rel["o"] == nxt["m"])
                .select("s", F.col("o2").alias("o"))
            )
            if zero_ok:
                # zero-length hop allowed mid-sequence: R ∪ R ∘ step
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
    return _apply_filters(bound, filters)


def _apply_filters(bound: DataFrame, filters: list | None) -> DataFrame:
    """Apply Filter constraints. A filter naming a variable no pattern in
    scope binds raises — it is statically detectable and almost always a
    typo'd query (strict SPARQL evaluates the unbound reference as an
    error that removes every row, i.e. silently empty; silently
    UNfiltered, the previous lenient behavior, was worse)."""
    for f in filters or []:
        missing = [v for v in f.vars if v not in bound.columns]
        if missing:
            raise ValueError(
                "SPARQL: FILTER references variable(s) not bound by any "
                f"pattern in scope: {', '.join('?' + v for v in missing)}"
            )
        bound = bound.where(f.column())
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


def _solve_optional(triples: DataFrame, opt: tuple) -> DataFrame:
    """Solve one OPTIONAL group — its BGP + filters, then its own nested
    OPTIONALs left-merged recursively (an inner OPTIONAL extends the
    group's solutions; it cannot remove them)."""
    opt_p, opt_f, sub_opts = opt
    bound = _join_patterns(triples, opt_p, opt_f)
    for sub in sub_opts:
        bound = _merge(bound, _solve_optional(triples, sub), how="left")
    return bound


def _solve(triples: DataFrame, query: Query) -> DataFrame:
    """Join the BGP's pattern bindings into one solution frame.

    Group algebra: UNION blocks distribute over the join — Join(P, U(a1,
    a2), U(b1, b2)) = U over the arm PRODUCT of Join(P, a_i, b_j). Each
    combination is solved with every arm's own filters, then the
    combinations union (vars a combination never binds become nulls =
    SPARQL's unbound). Joining per-combination rather than after the
    union keeps every join an equi-join on genuinely bound vars — no null
    keys, which is why multiple blocks are safe. OPTIONAL groups (possibly
    nested) left-join on their shared vars afterwards.
    """
    from itertools import product

    base = _join_patterns(triples, query.patterns) if query.patterns else None
    if query.unions:
        combos = []
        for arm_combo in product(*query.unions):
            bound = base
            for arm in arm_combo:
                # an arm has the same (patterns, filters, optionals) shape
                # as an OPTIONAL group — its own optionals left-merge into
                # the arm's solutions BEFORE the arm joins the base
                bound = _merge(bound, _solve_optional(triples, arm))
            combos.append(bound)
        u = combos[0]
        for f in combos[1:]:
            u = u.unionByName(f, allowMissingColumns=True)
        bound = u
    else:
        bound = base
    for opt in query.optionals or []:
        bound = _merge(bound, _solve_optional(triples, opt), how="left")
    assert bound is not None
    return _apply_filters(bound, query.filters)


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
