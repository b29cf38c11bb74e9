"""SPARQL built-in function library — FILTER/BIND/IF scalar + boolean
builtins over the string-typed store.

Reference surface: the reference runs arbitrary user SPARQL through
Blazegraph (RunSPARQLQuery.scala:12-33); these builtins are the SPARQL 1.1
operator library (spec §17.4) its users can write. Engine conventions
under test (sparql.py module docstring):

- string builtins operate on canonical string forms; numeric builtins on
  double try_casts (a non-numeric term is null, never an ANSI error);
- a comparison with a statically-numeric side compares numerically;
- BIND values land in the frame in canonical STRING form;
- ROUND is the spec's half-toward-+inf (not Spark's half-away-from-zero);
- LANG/DATATYPE/... are rejected loudly (the store erases what they
  inspect), as are boolean builtins in scalar position.
"""
from __future__ import annotations

import pytest

from phenoscape_owl_tools_spark import sparql

EX = "http://example.org/"
P = f"PREFIX ex: <{EX}>\n"


def _t(spark, rows):
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


@pytest.fixture()
def words(spark):
    return _t(spark, [
        (EX + "n1", EX + "p", "abc"),
        (EX + "n2", EX + "p", "ABCD"),
        (EX + "n3", EX + "p", "12"),
        (EX + "n4", EX + "p", "5"),
        (EX + "n1", EX + "q", EX + "n2"),
    ])


def _run(t, q):
    return sorted(tuple(r) for r in sparql.evaluate(t, P + q).collect())


def _subjs(t, q):
    return [r[0].rsplit("/n", 1)[1] for r in _run(t, q)]


# ---------------------------------------------------------------- strings


def test_strlen_filter_numeric_comparison(words):
    q = 'SELECT ?s WHERE { ?s ex:p ?o . FILTER(STRLEN(?o) > 2) }'
    assert _subjs(words, q) == ["1", "2"]


def test_ucase_lcase_strstarts(words):
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(STRSTARTS(UCASE(?o), "AB")) }') == ["1", "2"]
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(STRENDS(LCASE(?o), "cd")) }') == ["2"]


def test_contains_and_sameterm(words):
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(CONTAINS(?o, "b")) }') == ["1"]
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(sameTerm(?s, ex:n3)) }') == ["3"]


def test_substr_two_and_three_arg(words):
    got = _run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                      'BIND(SUBSTR(?o, 2) AS ?b) }')
    assert [b for _, b in got] == ["bc", "BCD", "2", ""]
    got = _run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                      'BIND(SUBSTR(?o, 1, 2) AS ?b) }')
    assert [b for _, b in got] == ["ab", "AB", "12", "5"]


def test_strbefore_strafter_spec_edges(words):
    # needle absent -> "" (spec), not null; empty needle: STRBEFORE -> "",
    # STRAFTER -> the whole string
    got = dict(_run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                           'BIND(STRBEFORE(?o, "b") AS ?b) }'))
    assert got[EX + "n1"] == "a" and got[EX + "n3"] == ""
    got = dict(_run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                           'BIND(STRAFTER(?o, "b") AS ?b) }'))
    assert got[EX + "n1"] == "c" and got[EX + "n2"] == ""
    got = dict(_run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                           'BIND(STRAFTER(?o, "") AS ?b) }'))
    assert got[EX + "n1"] == "abc"
    got = dict(_run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                           'BIND(STRBEFORE(?o, "") AS ?b) }'))
    assert got[EX + "n1"] == ""


def test_replace_with_flags(words):
    got = dict(_run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                           'BIND(REPLACE(?o, "[0-9]", "#") AS ?b) }'))
    assert got[EX + "n3"] == "##" and got[EX + "n1"] == "abc"
    got = dict(_run(words, 'SELECT ?s ?b WHERE { ?s ex:p ?o . '
                           'BIND(REPLACE(?o, "abc", "-", "i") AS ?b) }'))
    assert got[EX + "n2"] == "-D" and got[EX + "n1"] == "-"


def test_replace_pattern_must_be_literal(words):
    with pytest.raises(ValueError, match="string literal"):
        sparql.evaluate(words, P + 'SELECT ?s WHERE { ?s ex:p ?o . '
                                   'BIND(REPLACE(?o, ?o, "x") AS ?b) }')


# ---------------------------------------------------------------- numbers


def test_round_half_toward_positive_infinity(spark):
    t = _t(spark, [
        (EX + "a", EX + "v", "2.5"), (EX + "b", EX + "v", "-2.5"),
        (EX + "c", EX + "v", "2.4"), (EX + "d", EX + "v", "xyz"),
    ])
    got = dict(_run(t, 'SELECT ?s ?r WHERE { ?s ex:v ?o . '
                       'BIND(ROUND(?o) AS ?r) }'))
    # spec §17.4.4.1: ROUND(2.5)=3, ROUND(-2.5)=-2 (toward +inf);
    # a non-numeric input is null (try_cast), never an ANSI error
    assert got[EX + "a"] == "3.0" and got[EX + "b"] == "-2.0"
    assert got[EX + "c"] == "2.0" and got[EX + "d"] is None


def test_abs_ceil_floor(spark):
    t = _t(spark, [(EX + "a", EX + "v", "-1.2")])
    got = _run(t, 'SELECT ?x ?y ?z WHERE { ?s ex:v ?o . '
                  'BIND(ABS(?o) AS ?x) BIND(CEIL(?o) AS ?y) '
                  'BIND(FLOOR(?o) AS ?z) }')
    assert got == [("1.2", "-1.0", "-2.0")]


def test_parenthesized_arithmetic_comparison(words):
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER((?o + 1) > 6) }') == ["3"]


def test_numeric_vs_string_comparison_typing(words):
    # STRLEN is statically numeric -> numeric comparison: "12" has length
    # 2 != 12, "5" length 1 != 5 -> no row survives
    assert _run(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                       'FILTER(STRLEN(?o) = ?o) }') == []
    # UCASE is string-valued -> canonical-string comparison
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(UCASE(?o) = "ABC") }') == ["1"]


# ------------------------------------------------------- bound/if/coalesce


def test_bound_over_optional(words):
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'OPTIONAL { ?s ex:q ?z } FILTER(BOUND(?z)) }') == ["1"]
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . OPTIONAL '
                         '{ ?s ex:q ?z } FILTER(!BOUND(?z)) }') == ["2", "3", "4"]


def test_coalesce_fills_optional_gap(words):
    got = dict(_run(words, 'SELECT ?s ?c WHERE { ?s ex:p ?o . '
                           'OPTIONAL { ?s ex:q ?z } '
                           'BIND(COALESCE(?z, ?o) AS ?c) }'))
    assert got[EX + "n1"] == EX + "n2" and got[EX + "n3"] == "12"


def test_if_with_boolean_condition(words):
    got = dict(_run(words, 'SELECT ?s ?k WHERE { ?s ex:p ?o . '
                           'BIND(IF(isNumeric(?o), "num", "txt") AS ?k) }'))
    assert got[EX + "n3"] == "num" and got[EX + "n1"] == "txt"


def test_if_null_condition_takes_else(words):
    # ?z unbound for n2..n4: BOUND-less condition (?z = "x") is null ->
    # else branch (Spark's when), never an error
    got = dict(_run(words, 'SELECT ?s ?k WHERE { ?s ex:p ?o . '
                           'OPTIONAL { ?s ex:q ?z } '
                           'BIND(IF(?z = ex:n2, "hit", "miss") AS ?k) }'))
    assert got[EX + "n1"] == "hit" and got[EX + "n2"] == "miss"


def test_isliteral_isnumeric(words):
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(isLiteral(?o) && isNumeric(?o)) }') == ["3", "4"]


# ------------------------------------------------------------------- IN


def test_in_and_not_in(words):
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(?o IN ("abc", "12")) }') == ["1", "3"]
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(?o NOT IN ("abc", "12")) }') == ["2", "4"]
    # IRI members resolve through prefixes
    assert _subjs(words, 'SELECT ?s WHERE { ?s ex:p ?o . '
                         'FILTER(?s IN (ex:n1, ex:n4)) }') == ["1", "4"]


def test_in_null_lhs_drops_row(words):
    # unbound lhs -> null (Spark isin) -> row dropped under both IN and
    # NOT IN (three-valued: ~null is null)
    assert _run(words, 'SELECT ?s WHERE { ?s ex:p ?o . OPTIONAL '
                       '{ ?s ex:q ?z } FILTER(?z NOT IN (ex:nope)) }') \
        == [(EX + "n1",)]


# ------------------------------------------------------------- rejections


def test_lang_datatype_rejected(words):
    for fn in ("LANG(?o)", "DATATYPE(?o)"):
        with pytest.raises(ValueError, match="not supported"):
            sparql.evaluate(words, P + "SELECT ?s WHERE { ?s ex:p ?o . "
                                       f"FILTER({fn} = \"x\") }}")


def test_boolean_builtin_in_scalar_position_rejected(words):
    with pytest.raises(ValueError, match="boolean builtin"):
        sparql.evaluate(words, P + 'SELECT ?s WHERE { ?s ex:p ?o . '
                                   'BIND(CONTAINS(?o, "b") AS ?x) }')


def test_arity_error(words):
    with pytest.raises(ValueError, match="argument"):
        sparql.evaluate(words, P + 'SELECT ?s WHERE { ?s ex:p ?o . '
                                   'BIND(SUBSTR(?o) AS ?x) }')


def test_function_arg_unbound_var_raises(words):
    with pytest.raises(ValueError, match="unbound"):
        sparql.evaluate(words, P + 'SELECT ?s WHERE { ?s ex:p ?o . '
                                   'BIND(UCASE(?nope) AS ?x) }')


# --------------------------------------- HAVING aggregates, trailing VALUES


@pytest.fixture()
def groups(spark):
    return _t(spark, [
        (EX + "m1", EX + "group", "a"), (EX + "m2", EX + "group", "a"),
        (EX + "m3", EX + "group", "b"),
        (EX + "m1", EX + "score", "5"), (EX + "m2", EX + "score", "7"),
        (EX + "m3", EX + "score", "9"),
    ])


def test_having_direct_aggregate_call(groups):
    # the spec form — no projected aggregate needed
    q = ('SELECT ?g WHERE { ?m ex:group ?g } GROUP BY ?g '
         'HAVING(COUNT(*) > 1)')
    assert _run(groups, q) == [("a",)]


def test_having_direct_aggregate_over_other_var(groups):
    q = ('SELECT ?g (COUNT(*) AS ?n) WHERE { ?m ex:group ?g . '
         '?m ex:score ?s } GROUP BY ?g HAVING(SUM(?s) > 10)')
    assert _run(groups, q) == [("a", 2)]


def test_having_two_aggregate_calls_conjunction(groups):
    q = ('SELECT ?g WHERE { ?m ex:group ?g } GROUP BY ?g '
         'HAVING(COUNT(*) > 1 && COUNT(*) < 3)')
    assert _run(groups, q) == [("a",)]


def test_having_string_aggregate_comparison(groups):
    # MAX over the string store compares lexicographically
    q = ('SELECT ?g WHERE { ?m ex:group ?g } GROUP BY ?g '
         'HAVING(MAX(?m) > ex:m2)')
    assert _run(groups, q) == [("b",)]


def test_aggregate_outside_having_or_projection_rejected(groups):
    with pytest.raises(ValueError, match="only valid in SELECT"):
        sparql.evaluate(groups, P + 'SELECT ?m WHERE { ?m ex:group ?g . '
                                    'BIND(COUNT(?g) AS ?x) }')


def test_trailing_values_clause(groups):
    q = 'SELECT ?m WHERE { ?m ex:group ?g } VALUES ?g { "a" }'
    assert _run(groups, q) == [(EX + "m1",), (EX + "m2",)]


def test_trailing_values_multi_var_undef(groups):
    q = ('SELECT ?m ?s WHERE { ?m ex:group ?g . ?m ex:score ?s } '
         'VALUES (?g ?s) { ("a" "5") ("b" UNDEF) }')
    assert _run(groups, q) == [(EX + "m1", "5"), (EX + "m3", "9")]


def test_trailing_values_with_modifiers(groups):
    q = ('SELECT ?m WHERE { ?m ex:group ?g } ORDER BY ?m LIMIT 1 '
         'VALUES ?g { "a" }')
    assert _run(groups, q) == [(EX + "m1",)]


def test_prefixed_name_is_not_a_function_call(spark):
    # ex:substr used as a predicate must stay a prefixed name even though
    # its local part collides with a builtin
    t = _t(spark, [(EX + "n1", EX + "substr", "v")])
    q = P + 'SELECT ?s WHERE { ?s ex:substr ?o }'
    assert [r[0] for r in sparql.evaluate(t, q).collect()] == [EX + "n1"]


# --------------------------------------------------- CONSTRUCT WHERE


def test_construct_where_shorthand(words):
    out = sparql.evaluate(words, P + 'CONSTRUCT WHERE { ?s ex:q ?o }')
    assert sorted(tuple(r) for r in out.collect()) == [
        (EX + "n1", EX + "q", EX + "n2")]


def test_construct_where_rejects_paths_and_groups(words):
    with pytest.raises(ValueError, match="property paths"):
        sparql.evaluate(words, P + 'CONSTRUCT WHERE { ?s ex:q* ?o }')
    with pytest.raises(ValueError, match="plain triple patterns"):
        sparql.evaluate(
            words, P + 'CONSTRUCT WHERE { ?s ex:q ?o . FILTER(?o = "x") }')


# ------------------------------------ GROUP BY / ORDER BY expressions


def test_group_by_expression_with_alias(groups):
    q = ('SELECT ?k (COUNT(*) AS ?n) WHERE { ?m ex:group ?g } '
         'GROUP BY (UCASE(?g) AS ?k) ORDER BY ?k')
    assert _run(groups, q) == [("A", 2), ("B", 1)]


def test_group_by_bare_expression(groups):
    # synthesized grouping var — only the aggregate is projectable
    q = ('SELECT (COUNT(*) AS ?n) WHERE { ?m ex:score ?s } '
         'GROUP BY STRLEN(?s)')
    assert sorted(_run(groups, q)) == [(3,)]  # "5","7","9" all length 1


def test_order_by_expression_key(groups):
    q = ('SELECT ?m ?s WHERE { ?m ex:score ?s } '
         'ORDER BY DESC(STRLEN(?s)) DESC(?s) LIMIT 1')
    assert _run(groups, q) == [(EX + "m3", "9")]


def test_order_by_expression_unprojected_var_raises(groups):
    with pytest.raises(ValueError, match="non-projected"):
        sparql.evaluate(groups, P + 'SELECT ?m WHERE { ?m ex:score ?s } '
                                    'ORDER BY DESC(STRLEN(?x))')
