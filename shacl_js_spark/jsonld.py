"""Minimal JSON-LD subset parser (driver side).

Behavioral reference: the reference accepts "application/ld+json" via
rdflib + the jsonld package (src/rdflib-graph.js:59-70, index.js:175-187).
This covers the flat/expanded subset sufficient for data documents:

  * @context with simple "prefix": "iri" mappings (term definitions with
    plain string values)
  * node objects with @id / @type, nested node objects (blank nodes when no
    @id), arrays, value objects {"@value", "@type"|"@language"}, @graph
  * @list (exploded to rdf:first/rdf:rest chains, same encoding as the
    Turtle collection path, turtle.py _collection) and @reverse

Not covered (raises): remote contexts, @index/@container maps.
"""

from __future__ import annotations

import json

from .terms import Term, XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, bnode, iri, literal
from .turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, Triple


class JsonLdError(ValueError):
    pass


class _Parser:
    def __init__(self):
        self.triples: list[Triple] = []
        self.ctx: dict[str, str] = {}
        self._bn = 0

    def _fresh(self) -> Term:
        self._bn += 1
        return bnode(f"_:jb{self._bn}")

    def _expand(self, key: str) -> str:
        if key.startswith(("http://", "https://", "urn:")):
            return key
        if ":" in key:
            pfx, _, local = key.partition(":")
            if pfx in self.ctx:
                return self.ctx[pfx] + local
        if key in self.ctx:
            return self.ctx[key]
        return key

    def _node_term(self, ref: str) -> Term:
        return bnode(ref) if ref.startswith("_:") else iri(self._expand(ref))

    def parse_node(self, obj: dict) -> Term:
        subj = self._node_term(obj["@id"]) if "@id" in obj else self._fresh()
        for key, value in obj.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                for t in value if isinstance(value, list) else [value]:
                    self.triples.append((subj, iri(RDF_TYPE), self._node_term(t)))
                continue
            if key == "@reverse":
                # {"@reverse": {p: o}} states (o, p, subj); o must be a node
                # object / IRI reference — a literal or @list here is an
                # 'invalid reverse property value' per the JSON-LD spec
                if not isinstance(value, dict):
                    raise JsonLdError("@reverse must map predicates to nodes")
                for rkey, rval in value.items():
                    pred = iri(self._expand(rkey))
                    for v in rval if isinstance(rval, list) else [rval]:
                        if not isinstance(v, dict) or "@value" in v or "@list" in v:
                            raise JsonLdError(
                                f"invalid reverse property value for {rkey}: "
                                "must be a node object"
                            )
                        self.triples.append((self.parse_value(v), pred, subj))
                continue
            if key.startswith("@"):
                raise JsonLdError(f"unsupported JSON-LD keyword {key}")
            pred = iri(self._expand(key))
            for v in value if isinstance(value, list) else [value]:
                self.triples.append((subj, pred, self.parse_value(v)))
        return subj

    def _list(self, items: list) -> Term:
        """rdf:first/rdf:rest chain, mirroring turtle.py _collection."""
        if not items:
            return iri(RDF_NIL)
        head = self._fresh()
        cur = head
        for i, item in enumerate(items):
            self.triples.append((cur, iri(RDF_FIRST), self.parse_value(item)))
            if i + 1 < len(items):
                nxt = self._fresh()
                self.triples.append((cur, iri(RDF_REST), nxt))
                cur = nxt
            else:
                self.triples.append((cur, iri(RDF_REST), iri(RDF_NIL)))
        return head

    def parse_value(self, v) -> Term:
        if isinstance(v, dict):
            if "@list" in v:
                if not isinstance(v["@list"], list):
                    raise JsonLdError("@list value must be an array")
                return self._list(v["@list"])
            if "@value" in v:
                val = v["@value"]
                if "@language" in v:
                    return literal(str(val), lang=v["@language"])
                if "@type" in v:
                    return literal(str(val), self._expand(v["@type"]))
                return self._scalar(val)
            return self.parse_node(v)
        return self._scalar(v)

    def _scalar(self, val) -> Term:
        if isinstance(val, bool):
            return literal("true" if val else "false", XSD_BOOLEAN)
        if isinstance(val, int):
            return literal(str(val), XSD_INTEGER)
        if isinstance(val, float):
            return literal(repr(val), XSD_DOUBLE)
        return literal(str(val))


def parse_jsonld(text: str) -> tuple[list[Triple], dict[str, str]]:
    doc = json.loads(text)
    p = _Parser()
    items = doc if isinstance(doc, list) else [doc]
    for item in items:
        ctx = item.get("@context", {}) if isinstance(item, dict) else {}
        if isinstance(ctx, dict):
            for k, v in ctx.items():
                if isinstance(v, str):
                    p.ctx[k] = v
        nodes = item.get("@graph", [item]) if isinstance(item, dict) else []
        for n in nodes:
            if isinstance(n, dict):
                p.parse_node(n)
    return p.triples, dict(p.ctx)
