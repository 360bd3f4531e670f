from shacl_js_spark.terms import (
    T,
    XSD_BOOLEAN,
    XSD_INTEGER,
    bnode,
    compare_nodes,
    compare_terms,
    decode_term,
    encode_term,
    iri,
    literal,
    local_name,
)


def test_encode_decode_roundtrip():
    cases = [
        iri("http://ex.org/a"),
        bnode("_:b1"),
        literal("plain"),
        literal("42", XSD_INTEGER),
        literal("hello", lang="en-US"),
        literal('quo"te\\and\nnewline'),
        literal("true", XSD_BOOLEAN),
    ]
    for t in cases:
        assert decode_term(t.encoded()) == t, t


def test_encoding_injective():
    # '"a"' as plain literal vs iri named "a" vs bnode must all differ
    encs = {
        literal("a").encoded(),
        iri("a").encoded(),
        bnode("_:a").encoded(),
        literal("a", lang="en").encoded(),
        literal("a", XSD_INTEGER).encoded(),
    }
    assert len(encs) == 5


def test_ttl_shortcut():
    # ref: term-factory.js:30-56
    assert T("true") == literal("true", XSD_BOOLEAN)
    assert T("42") == literal("42", XSD_INTEGER)
    assert T("rdf:type").value.endswith("#type")
    assert T("hello world").is_literal


def test_compare_terms_ordering():
    # termType name order: BlankNode < Literal < NamedNode (rdfquery.js:910)
    assert compare_terms(bnode("_:x"), literal("a")) < 0
    assert compare_terms(literal("a"), iri("a")) < 0
    # string ordering (not numeric): "10" < "9"
    assert compare_terms(literal("10", XSD_INTEGER), literal("9", XSD_INTEGER)) < 0


def test_compare_nodes_incomparable():
    # mixed datatypes -> None (index.js:66-76)
    assert compare_nodes(literal("1", XSD_INTEGER), literal("1")) is None
    assert compare_nodes(literal("a"), literal("b")) == -1


def test_local_name():
    assert local_name("http://www.w3.org/ns/shacl#minCount") == "minCount"
    assert local_name("http://ex.org/path/leaf") == "leaf"
