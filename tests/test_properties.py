"""Property-based tests (hypothesis) for the pure-Python hot paths: the
phrase-trie longest-match scanner against a brute-force oracle, and the
sessionization fold against a single-pass reference."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from phenoscape_owl_tools_spark.operators.mention import _PhraseTrie, tokenize

WORDS = ["fin", "fin ray", "dorsal fin", "dorsal", "ray", "scale", "eye"]


def _oracle_longest_match(tokens, entries):
    """Greedy longest non-overlapping match, leftmost-first."""
    surf = {tuple(tokenize(s)): iri for s, iri in entries if tokenize(s)}
    out = []
    i = 0
    while i < len(tokens):
        best = None
        for toks, iri in surf.items():
            n = len(toks)
            if tuple(tokens[i : i + n]) == toks:
                if best is None or n > best[0]:
                    best = (n, iri, " ".join(toks))
        if best:
            n, iri, s = best
            out.append((i, n, s, iri))
            i += n
        else:
            i += 1
    return out


@st.composite
def dict_and_text(draw):
    surfaces = draw(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=5, unique=True)
    )
    entries = [(s, f"iri:{j}") for j, s in enumerate(surfaces)]
    tokens = draw(st.lists(st.sampled_from(
        ["fin", "ray", "dorsal", "scale", "eye", "the", "with"]), max_size=12))
    return entries, tokens


@settings(max_examples=300, deadline=None)
@given(dict_and_text())
def test_trie_matches_oracle(case):
    entries, tokens = case
    trie = _PhraseTrie(entries)
    got = trie.find(tokens)
    assert got == _oracle_longest_match(tokens, entries)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["fin", "ray", "dorsal"]), max_size=10))
def test_trie_matches_are_non_overlapping_and_in_range(tokens):
    trie = _PhraseTrie([("fin ray", "a"), ("ray", "b"), ("dorsal fin", "c")])
    matches = trie.find(tokens)
    last_end = -1
    for start, n, surface, iri in matches:
        assert start > last_end
        assert start + n <= len(tokens)
        assert surface == " ".join(tokens[start : start + n])
        last_end = start + n - 1


@settings(max_examples=300, deadline=None)
@given(st.lists(st.floats(min_value=0, max_value=10_000, allow_nan=False), max_size=30),
       st.floats(min_value=1, max_value=1000))
def test_session_fold_invariants(ts, gap):
    """Sessionizing a sorted event list: counts partition the events, each
    session spans <= its event gaps, consecutive sessions separated > gap."""
    from phenoscape_owl_tools_spark.streaming.ingest import _sessionize_group

    class FakeState:
        exists = False
        hasTimedOut = False

        def update(self, v):
            self.exists, self.got = True, v

        def setTimeoutDuration(self, ms):
            pass

    import pandas as pd

    state = FakeState()
    (out,) = list(
        _sessionize_group((1,), iter([pd.DataFrame({"ts_sec": ts})]), state, gap)
    )
    if not ts:
        assert out.empty
        return
    assert out["n_events"].sum() == len(ts)
    rows = out.sort_values("session_start").reset_index(drop=True)
    for i in range(len(rows) - 1):
        assert rows["session_start"][i + 1] - rows["session_end"][i] > gap
    assert (rows["session_end"] >= rows["session_start"]).all()
    # exactly one open session (the last), the rest closed
    assert (~rows["closed"]).sum() == 1
    assert not rows["closed"].iloc[-1]


# ---------------------------------------------------------------------------
# Ontology-serialization round-trips (pure Python: parser/renderer pairs)
# ---------------------------------------------------------------------------

_IRI_CHARS = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789_", min_size=1, max_size=8
)
_iri = st.builds(lambda s: f"http://ex.org/{s}", _IRI_CHARS)


@st.composite
def _expr(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(_iri)
    ctor = draw(st.sampled_from(["some", "and", "not"]))
    if ctor == "some":
        return (f"ObjectSomeValuesFrom({draw(_iri)} "
                f"{draw(_expr(depth + 1))})")  # noqa: B023
    if ctor == "not":
        return f"ObjectComplementOf({draw(_expr(depth + 1))})"
    args = sorted({draw(_expr(depth + 1)), draw(_expr(depth + 1))})
    if len(args) == 1:
        return args[0]
    return f"ObjectIntersectionOf({' '.join(args)})"


_axiom_row = st.one_of(
    st.builds(lambda s, k: ("declaration", s, None, k), _iri,
              st.sampled_from(["Class", "ObjectProperty", "AnnotationProperty",
                               "NamedIndividual"])),
    st.builds(lambda s, o: ("subclass_of", s, None, o), _expr(), _expr()),
    st.builds(lambda s, o: ("equivalent_classes", s, None, o), _iri, _expr()),
    st.builds(lambda s, o: ("disjoint_classes", s, None, o), _iri, _expr()),
    st.builds(lambda s, o: ("sub_object_property", s, None, o), _iri, _iri),
    st.builds(lambda a, b, o: ("property_chain", f"{a} {b}", None, o),
              _iri, _iri, _iri),
    st.builds(lambda s, p, o: ("annotation", s, p, o), _iri, _iri,
              st.text(alphabet=st.characters(blacklist_categories=("Cs",),
                                             blacklist_characters="\x00"),
                      max_size=20)),
    st.builds(lambda s, o: ("class_assertion", s, None, o), _iri, _expr()),
)


@settings(max_examples=60, deadline=None)
@given(st.lists(_axiom_row, min_size=1, max_size=12))
def test_ofn_render_parse_roundtrip(rows):
    from phenoscape_owl_tools_spark.sources import ofn

    text = ofn.render_document(rows)
    again = [r[1:] for r in ofn.parse_document(text, src="x")]
    # renderer sorts; annotation literal values that LOOK like absolute
    # IRIs round-trip as IRIs (documented heuristic) — normalize both ways
    assert sorted(set(again)) == sorted(set(tuple(r) for r in rows))


@settings(max_examples=60, deadline=None)
@given(st.lists(_axiom_row, min_size=1, max_size=12))
def test_ttl_render_parse_roundtrip(rows):
    from phenoscape_owl_tools_spark.sources import ttl

    text = ttl.render_turtle_document(rows)
    again = [r[1:] for r in ttl.parse_document(text, src="x")]
    assert sorted(set(again)) == sorted(set(tuple(r) for r in rows))


@settings(max_examples=60, deadline=None)
@given(st.lists(_axiom_row, min_size=1, max_size=10))
def test_ofn_ttl_cross_serialization_agree(rows):
    """OFN and Turtle renderings of the same axiom frame parse back to the
    SAME rows — the serialization-agnostic contract both readers share."""
    from phenoscape_owl_tools_spark.sources import ofn, ttl

    via_ofn = sorted(r[1:] for r in ofn.parse_document(
        ofn.render_document(rows), src="x"))
    via_ttl = sorted(r[1:] for r in ttl.parse_document(
        ttl.render_turtle_document(rows), src="x"))
    assert via_ofn == via_ttl
