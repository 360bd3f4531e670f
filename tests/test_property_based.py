"""Property-based tests (hypothesis): term encoding injectivity/round-trip,
Turtle literal round-trip, compare_terms ordering laws."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from shacl_js_spark.terms import (
    RDF_LANGSTRING,
    Term,
    bnode,
    compare_terms,
    decode_term,
    iri,
    literal,
)
from shacl_js_spark.turtle import parse_turtle

text_values = st.text(min_size=0, max_size=40)
iri_values = st.text(
    alphabet=string.ascii_letters + string.digits + ":/#.-_", min_size=1, max_size=40
).map(lambda s: "http://e/" + s)
langs = st.sampled_from(["en", "en-US", "de", "fr-CA"])
dts = st.sampled_from([
    "http://www.w3.org/2001/XMLSchema#string",
    "http://www.w3.org/2001/XMLSchema#integer",
    "http://www.w3.org/2001/XMLSchema#boolean",
    "http://e/custom",
])


@st.composite
def terms(draw):
    kind = draw(st.sampled_from(["iri", "bnode", "lit", "langlit"]))
    if kind == "iri":
        return iri(draw(iri_values))
    if kind == "bnode":
        return bnode("_:b" + str(draw(st.integers(0, 999))))
    if kind == "langlit":
        return literal(draw(text_values), lang=draw(langs))
    return literal(draw(text_values), draw(dts))


@given(terms())
@settings(max_examples=300, deadline=None)
def test_encode_decode_roundtrip(t: Term):
    assert decode_term(t.encoded()) == t


@given(terms(), terms())
@settings(max_examples=300, deadline=None)
def test_encoding_injective(a: Term, b: Term):
    assert (a.encoded() == b.encoded()) == (a == b)


@given(terms(), terms(), terms())
@settings(max_examples=200, deadline=None)
def test_compare_terms_total_order(a, b, c):
    # antisymmetry + reflexivity
    assert compare_terms(a, a) == 0
    assert compare_terms(a, b) == -compare_terms(b, a)
    # transitivity of <=
    if compare_terms(a, b) <= 0 and compare_terms(b, c) <= 0:
        assert compare_terms(a, c) <= 0


@given(st.lists(st.tuples(text_values, st.sampled_from(["plain", "en", "int"])), min_size=1, max_size=5))
@settings(max_examples=150, deadline=None)
def test_turtle_literal_roundtrip(items):
    """Literals written as Turtle parse back to the same terms."""
    lines = ["@prefix ex: <http://e/> .", "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> ."]
    expected = []
    for i, (val, kind) in enumerate(items):
        esc = (
            val.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r").replace("\t", "\\t")
        )
        if kind == "plain":
            lines.append(f'ex:s{i} ex:p "{esc}" .')
            expected.append(literal(val))
        elif kind == "en":
            lines.append(f'ex:s{i} ex:p "{esc}"@en .')
            expected.append(literal(val, lang="en"))
        else:
            lines.append(f'ex:s{i} ex:p "{esc}"^^xsd:integer .')
            expected.append(literal(val, "http://www.w3.org/2001/XMLSchema#integer"))
    triples, _ = parse_turtle("\n".join(lines))
    got = [t[2] for t in triples]
    assert got == expected
