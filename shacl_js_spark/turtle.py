"""Driver-side Turtle parser (subset sufficient for the reference's 85 test
fixtures and shapes documents; ref behavior: rdflib parse invoked from
/root/reference/src/rdflib-graph.js:55-82 plus postProcessGraph normalization
at rdflib-graph.js:119-150).

Shapes documents are KB-sized, so parsing happens on the driver; the resulting
triple list feeds either a LocalGraph (shapes) or spark.createDataFrame (data).

Supported: @prefix/@base (and SPARQL-style PREFIX/BASE), IRIREF with \\u
escapes, prefixed names, bnode labels, [] / [ ... ] property lists,
( ... ) collections (exploded to rdf:first/rdf:rest, ref:
rdflib-graph.js:137-140 + index.js:35-45), all literal quote forms, @lang,
^^datatype, numeric shorthand (xsd:integer/decimal/double), booleans, 'a',
';' ',' '.' punctuation, comments.

Normalization applied (ref postProcessGraph):
  * xsd:boolean literals "0"/"1" canonicalized to "false"/"true"
  * blank node ids normalized to "_:<id>"
"""

from __future__ import annotations

import re

from .terms import (
    NAMESPACES,
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    XSD_STRING,
    Term,
    bnode,
    iri,
    literal,
)

RDF_NS = NAMESPACES["rdf"]
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

Triple = tuple[Term, Term, Term]

_TOKEN_RE = re.compile(
    r"""
      (?P<ws>\s+)
    | (?P<comment>\#[^\n]*)
    | (?P<iriref><[^<>"{}|^`\\\s]*>)
    | (?P<long_dquote>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\")
    | (?P<long_squote>'''(?:[^'\\]|\\.|'(?!''))*''')
    | (?P<dquote>"(?:[^"\\\n]|\\.)*")
    | (?P<squote>'(?:[^'\\\n]|\\.)*')
    | (?P<hathat>\^\^)
    | (?P<atkw>@(?:prefix|base)\b)
    | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
    | (?P<double>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.?\d+[eE][+-]?\d+|\d*\.\d+[eE][+-]?\d+))
    | (?P<decimal>[+-]?\d*\.\d+)
    | (?P<integer>[+-]?\d+)
    | (?P<bnode_label>_:[A-Za-z0-9_.-]+)
    | (?P<punct>[;,.()\[\]])
    | (?P<pname>[A-Za-z0-9_][A-Za-z0-9_.-]*?:[A-Za-z0-9_:%\\-][A-Za-z0-9_.:%\\-]*|[A-Za-z0-9_][A-Za-z0-9_.-]*?:|:[A-Za-z0-9_.:%\\-]+|:)
    | (?P<keyword>a\b|true\b|false\b|(?i:PREFIX|BASE)\b)
    | (?P<other>\S)
    """,
    re.VERBOSE,
)

_STRING_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape_string(s: str) -> str:
    out, i, n = [], 0, len(s)
    while i < n:
        c = s[i]
        if c == "\\" and i + 1 < n:
            nxt = s[i + 1]
            if nxt == "u" and i + 6 <= n:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= n:
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            mapped = _STRING_ESCAPES.get(nxt)
            if mapped is not None:
                out.append(mapped)
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


class TurtleParseError(ValueError):
    pass


class _Tok:
    __slots__ = ("kind", "text")

    def __init__(self, kind: str, text: str):
        self.kind = kind
        self.text = text

    def __repr__(self):
        return f"{self.kind}({self.text!r})"


def _tokenize(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        if m.start() != pos:
            raise TurtleParseError(f"unexpected input at {pos}: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        if kind == "other":
            raise TurtleParseError(f"unexpected char {m.group()!r} at {m.start()}")
        toks.append(_Tok(kind, m.group()))
    if pos != len(text):
        raise TurtleParseError(f"trailing input at {pos}: {text[pos:pos+40]!r}")
    return toks


class TurtleParser:
    def __init__(self, text: str, base: str | None = None, bnode_prefix: str = "b"):
        self.toks = _tokenize(text)
        self.i = 0
        self.base = base or ""
        self.prefixes: dict[str, str] = {}
        self.triples: list[Triple] = []
        self._bn = 0
        self._bnode_prefix = bnode_prefix
        self._bnode_labels: dict[str, Term] = {}

    # --- token helpers ---
    def _peek(self) -> _Tok | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self) -> _Tok:
        t = self._peek()
        if t is None:
            raise TurtleParseError("unexpected EOF")
        self.i += 1
        return t

    def _expect_punct(self, ch: str) -> None:
        t = self._next()
        if t.kind != "punct" or t.text != ch:
            raise TurtleParseError(f"expected {ch!r}, got {t!r}")

    def _fresh_bnode(self) -> Term:
        self._bn += 1
        return bnode(f"_:{self._bnode_prefix}{self._bn}")

    def _label_bnode(self, label: str) -> Term:
        t = self._bnode_labels.get(label)
        if t is None:
            t = bnode(label)
            self._bnode_labels[label] = t
        return t

    # --- grammar ---
    def parse(self) -> list[Triple]:
        while self._peek() is not None:
            t = self._peek()
            if t.kind == "atkw" or (t.kind == "keyword" and t.text.upper() in ("PREFIX", "BASE")):
                self._directive()
            else:
                self._triples_block()
        return self.triples

    def _directive(self) -> None:
        t = self._next()
        word = t.text.lstrip("@").lower()
        if word == "prefix":
            pn = self._next()
            if pn.kind != "pname":
                raise TurtleParseError(f"expected prefix name, got {pn!r}")
            prefix = pn.text[:-1] if pn.text.endswith(":") else pn.text.split(":", 1)[0]
            ir = self._next()
            if ir.kind != "iriref":
                raise TurtleParseError(f"expected IRI in @prefix, got {ir!r}")
            self.prefixes[prefix] = self._resolve_iri(ir.text[1:-1])
        elif word == "base":
            ir = self._next()
            if ir.kind != "iriref":
                raise TurtleParseError(f"expected IRI in @base, got {ir!r}")
            self.base = self._resolve_iri(ir.text[1:-1])
        else:
            raise TurtleParseError(f"unknown directive {t.text}")
        if t.kind == "atkw":
            self._expect_punct(".")
        else:
            nxt = self._peek()
            if nxt is not None and nxt.kind == "punct" and nxt.text == ".":
                self._next()

    def _resolve_iri(self, raw: str) -> str:
        raw = _unescape_string(raw)
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", raw):
            return raw
        if raw.startswith("#") or raw == "":
            return self.base + raw
        # minimal relative resolution (fixtures use absolute IRIs)
        return self.base.rsplit("/", 1)[0] + "/" + raw if self.base else raw

    def _triples_block(self) -> None:
        subj = self._node(allow_literal=False)
        nxt = self._peek()
        if subj.kind == "bnode" and nxt is not None and nxt.kind == "punct" and nxt.text == ".":
            # bare blankNodePropertyList statement
            self._next()
            return
        self._predicate_object_list(subj)
        self._expect_punct(".")

    def _predicate_object_list(self, subj: Term) -> None:
        while True:
            pred = self._verb()
            self._object_list(subj, pred)
            nxt = self._peek()
            if nxt is not None and nxt.kind == "punct" and nxt.text == ";":
                self._next()
                # allow trailing ';' before '.' or ']'
                nxt = self._peek()
                if nxt is not None and (
                    (nxt.kind == "punct" and nxt.text in (".", "]", ";"))
                ):
                    while nxt is not None and nxt.kind == "punct" and nxt.text == ";":
                        self._next()
                        nxt = self._peek()
                    return self._predicate_object_list_tail(subj)
                continue
            return

    def _predicate_object_list_tail(self, subj: Term) -> None:
        nxt = self._peek()
        if nxt is not None and not (nxt.kind == "punct" and nxt.text in (".", "]")):
            self._predicate_object_list(subj)

    def _verb(self) -> Term:
        t = self._peek()
        if t is not None and t.kind == "keyword" and t.text == "a":
            self._next()
            return iri(RDF_TYPE)
        v = self._node(allow_literal=False)
        if v.kind == "bnode":
            raise TurtleParseError("blank node as predicate unsupported")
        return v

    def _object_list(self, subj: Term, pred: Term) -> None:
        while True:
            obj = self._node(allow_literal=True)
            self.triples.append((subj, pred, obj))
            nxt = self._peek()
            if nxt is not None and nxt.kind == "punct" and nxt.text == ",":
                self._next()
                continue
            return

    def _node(self, allow_literal: bool) -> Term:
        t = self._next()
        if t.kind == "iriref":
            return iri(self._resolve_iri(t.text[1:-1]))
        if t.kind == "pname":
            prefix, _, local = t.text.partition(":")
            ns = self.prefixes.get(prefix)
            if ns is None:
                raise TurtleParseError(f"unknown prefix {prefix!r} in {t.text!r}")
            local = re.sub(r"\\(.)", r"\1", local)  # PN_LOCAL escapes
            return iri(ns + local)
        if t.kind == "bnode_label":
            return self._label_bnode(t.text)
        if t.kind == "punct" and t.text == "[":
            nxt = self._peek()
            node = self._fresh_bnode()
            if nxt is not None and nxt.kind == "punct" and nxt.text == "]":
                self._next()
                return node
            self._predicate_object_list(node)
            self._expect_punct("]")
            return node
        if t.kind == "punct" and t.text == "(":
            return self._collection()
        if not allow_literal:
            raise TurtleParseError(f"expected subject/predicate node, got {t!r}")
        if t.kind in ("dquote", "squote", "long_dquote", "long_squote"):
            q = 3 if t.kind.startswith("long") else 1
            value = _unescape_string(t.text[q:-q])
            nxt = self._peek()
            if nxt is not None and nxt.kind == "langtag":
                self._next()
                return literal(value, lang=nxt.text[1:])
            if nxt is not None and nxt.kind == "hathat":
                self._next()
                dt = self._node(allow_literal=False)
                return self._typed_literal(value, dt.value)
            return literal(value)
        if t.kind == "integer":
            return literal(t.text, XSD_INTEGER)
        if t.kind == "decimal":
            return literal(t.text, XSD_DECIMAL)
        if t.kind == "double":
            return literal(t.text, XSD_DOUBLE)
        if t.kind == "keyword" and t.text in ("true", "false"):
            return literal(t.text, XSD_BOOLEAN)
        raise TurtleParseError(f"unexpected token {t!r}")

    def _typed_literal(self, value: str, dt: str) -> Term:
        # boolean canonicalization (ref: rdflib-graph.js:127-136)
        if dt == XSD_BOOLEAN:
            if value in ("0", "false"):
                return literal("false", XSD_BOOLEAN)
            if value in ("1", "true"):
                return literal("true", XSD_BOOLEAN)
        if dt == RDF_LANGSTRING:
            return literal(value, RDF_LANGSTRING)
        if dt == XSD_STRING:
            return literal(value)
        return literal(value, dt)

    def _collection(self) -> Term:
        items: list[Term] = []
        while True:
            t = self._peek()
            if t is None:
                raise TurtleParseError("unterminated collection")
            if t.kind == "punct" and t.text == ")":
                self._next()
                break
            items.append(self._node(allow_literal=True))
        # explode to rdf:first/rdf:rest list (ref: index.js:35-45)
        if not items:
            return iri(RDF_NIL)
        head = self._fresh_bnode()
        cur = head
        for idx, item in enumerate(items):
            self.triples.append((cur, iri(RDF_FIRST), item))
            if idx + 1 < len(items):
                nxt_node = self._fresh_bnode()
                self.triples.append((cur, iri(RDF_REST), nxt_node))
                cur = nxt_node
            else:
                self.triples.append((cur, iri(RDF_REST), iri(RDF_NIL)))
        return head


def parse_turtle(text: str, base: str | None = None, bnode_prefix: str = "b") -> tuple[list[Triple], dict[str, str]]:
    """Parse Turtle text -> (triples, prefix map)."""
    p = TurtleParser(text, base=base, bnode_prefix=bnode_prefix)
    triples = p.parse()
    return triples, p.prefixes
