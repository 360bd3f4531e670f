"""JSON-LD subset parser (driver side).

Behavioral reference: the reference accepts "application/ld+json" via
rdflib + the jsonld package (src/rdflib-graph.js:59-70, index.js:175-187).
This covers the subset sufficient for data documents in the wild:

  * @context with simple "prefix": "iri" mappings AND expanded term
    definitions {"@id", "@type" ("@id" or a datatype), "@language",
    "@container" ("@index" | "@language" | "@list")}
  * @vocab and a context-level default @language
  * REMOTE context URLs, resolved OFFLINE through a caller-supplied
    `contexts` dict (url -> context value) — mirroring the library-registry
    pattern used for registerJSLibrary (no network I/O ever happens here;
    an unregistered URL raises).  Context values may nest (a registered URL
    may itself resolve to a list containing further registered URLs).
  * node objects with @id / @type, nested node objects (blank nodes when no
    @id), arrays, value objects {"@value", "@type"|"@language"}, @graph
  * @list (exploded to rdf:first/rdf:rest chains, same encoding as the
    Turtle collection path, turtle.py _collection) and @reverse
  * @container: @index  — index keys are content-free map keys (dropped),
    values parsed normally (JSON-LD 1.1 data-indexing)
  * @container: @language — map keys become language tags on string values
  * @nest (keyword and term-aliased) — nested maps whose members belong to
    the enclosing node (syntactic grouping, no triple for the nest itself)
  * named-graph node objects ({"@id": g, "@graph": [...]}) and
    @container: @graph — contents are FLATTENED into the single data graph,
    matching the reference, which loads every input statement into one
    graph URI (src/rdflib-graph.js:55-82); graph containers still emit the
    (subject, predicate, graph-name) link per JSON-LD 1.1 expansion
  * @id references resolve WITHOUT @vocab (vocab applies to terms and
    @type only); relative IRI references resolve against @base (context
    @base, itself possibly relative to an outer @base, RFC 3986 merge —
    scheme-independent, so non-hierarchical bases like urn:/tag:/did:
    resolve too, which urllib.urljoin alone would silently skip); without
    a @base in scope, relative refs pass through unchanged as before.  A
    relative @base with no outer base stays relative and refs join onto it
    ("people/" + "alice" -> "people/alice"), matching jsonld.js prependBase

Intentional subset restrictions (stricter than JSON-LD 1.1):
  * @nest values containing @id are rejected ("invalid @nest value") —
    full 1.1 expansion would merge a nested @id into the enclosing node
    (colliding-keys error if both set one); this parser requires the @id
    on the enclosing node itself, where it is unambiguous
"""

from __future__ import annotations

import json
from urllib.parse import urljoin, urlsplit

from .terms import Term, XSD_BOOLEAN, XSD_DOUBLE, XSD_INTEGER, bnode, iri, literal
from .turtle import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, Triple


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1] != "":
                out.pop()
                if not out:
                    out.append("")
        elif seg != ".":
            out.append(seg)
    # trailing "." / ".." keep the slash they collapsed
    if path.endswith(("/.", "/..")) and (not out or out[-1] != ""):
        out.append("")
    joined = "/".join(out)
    if joined == "" and "/" in path:
        # fully-collapsed hierarchical path: RFC 3986 rule C leaves the
        # slash it collapsed (e.g. 'a/..' -> '/', so resolve('urn:a/b','..')
        # is 'urn:/', not 'urn:') — r5 advice; bare '.'/'..' (no slash)
        # still collapse to ''.
        return "/"
    return joined


def resolve_iri(base: str, ref: str) -> str:
    """RFC 3986 §5 reference resolution, scheme-independent.

    urllib.parse.urljoin only merges when the base's scheme is registered in
    `uses_relative` — for urn:/tag:/did: bases it silently drops the base
    (code-review r5 finding), and placeholder-scheme tricks mangle rootless
    paths ('tag:x' -> 'tag:///x').  RFC 3986 resolution does not depend on
    the scheme, so unregistered schemes get the §5.3 algorithm directly;
    hierarchical (http/https/file/ftp and scheme-less) bases keep the stdlib
    fast path, whose output this matches."""
    if not base:
        return ref
    if urlsplit(ref).scheme:  # absolute ref: base never applies (§5.2.2)
        return ref
    scheme = urlsplit(base).scheme
    if not scheme or scheme in ("http", "https", "file", "ftp"):
        return urljoin(base, ref)
    # --- §5.3 target composition for a non-hierarchical base ---
    b_rest = base[len(scheme) + 1 :]
    b_frag = b_rest.split("#", 1)[0]
    b_path, b_query = (b_frag.split("?", 1) + [None])[:2]
    r_frag = None
    r = ref
    if "#" in r:
        r, r_frag = r.split("#", 1)
    r_path, r_query = (r.split("?", 1) + [None])[:2]
    if r_path.startswith("//"):  # ref supplies its own authority
        t = r_path if r_query is None else f"{r_path}?{r_query}"
    elif r_path == "":
        q = r_query if r_query is not None else b_query
        t = b_path if q is None else f"{b_path}?{q}"
    else:
        if r_path.startswith("/"):
            merged = _remove_dot_segments(r_path)
        elif "/" in b_path:
            merged = _remove_dot_segments(b_path.rsplit("/", 1)[0] + "/" + r_path)
        else:  # rootless base path with no slash: ref replaces it (merge = ref)
            merged = _remove_dot_segments(r_path)
        t = merged if r_query is None else f"{merged}?{r_query}"
    out = f"{scheme}:{t}"
    return out if r_frag is None else f"{out}#{r_frag}"


class JsonLdError(ValueError):
    pass


_ABS_PREFIXES = ("http://", "https://", "urn:")


class _Parser:
    def __init__(self, contexts: dict | None = None):
        self.triples: list[Triple] = []
        #: term -> {"id": str, "type": str|None, "language": str|None,
        #:          "container": str|None}
        self.ctx: dict[str, dict] = {}
        self.vocab: str | None = None
        self.base: str | None = None
        self.default_lang: str | None = None
        self.contexts = contexts or {}
        self._bn = 0

    # ---- context processing -------------------------------------------
    def apply_context(self, ctx_value, _depth: int = 0) -> None:
        if _depth > 8:
            raise JsonLdError("remote context nesting too deep (cycle?)")
        if ctx_value is None:
            return
        if isinstance(ctx_value, str):
            if ctx_value not in self.contexts:
                raise JsonLdError(
                    f"remote context {ctx_value!r} is not registered; pass it "
                    "via parse_jsonld(contexts={url: context_dict}) — remote "
                    "fetching is intentionally offline"
                )
            self.apply_context(self.contexts[ctx_value], _depth + 1)
            return
        if isinstance(ctx_value, list):
            for item in ctx_value:
                self.apply_context(item, _depth)
            return
        if not isinstance(ctx_value, dict):
            raise JsonLdError(f"invalid @context entry: {ctx_value!r}")
        for k, v in ctx_value.items():
            if k == "@vocab":
                self.vocab = v
            elif k == "@language":
                self.default_lang = v
            elif k == "@base":
                if v is None:
                    self.base = None  # explicit null clears the base
                elif not isinstance(v, str):
                    raise JsonLdError(f"invalid @base: {v!r}")
                else:
                    # a relative @base resolves against the outer base; with
                    # no outer base it stays relative (jsonld.js parity —
                    # refs then join onto the relative base)
                    self.base = resolve_iri(self.base, v) if self.base else v
            elif v is None:
                self.ctx.pop(k, None)
            elif isinstance(v, str):
                self.ctx[k] = {"id": v, "type": None, "language": None, "container": None}
            elif isinstance(v, dict):
                if "@id" not in v:
                    raise JsonLdError(f"term definition for {k!r} lacks @id")
                cont = v.get("@container")
                if isinstance(cont, list):  # 1.1 allows sets like ["@index","@set"]
                    cont = next(
                        (c for c in cont if c in ("@index", "@language", "@list", "@graph")),
                        None,
                    )
                if cont not in (None, "@index", "@language", "@list", "@set", "@graph"):
                    raise JsonLdError(f"unsupported @container {cont!r} for {k!r}")
                self.ctx[k] = {
                    "id": v["@id"],
                    "type": v.get("@type"),
                    "language": v.get("@language"),
                    "container": None if cont == "@set" else cont,
                }
            else:
                raise JsonLdError(f"invalid term definition for {k!r}: {v!r}")

    def prefix_map(self) -> dict[str, str]:
        # keyword-aliased terms (e.g. "label": "@nest") are syntax, not
        # namespace prefixes — emitting them would map term -> "@nest"
        return {
            k: self._expand(d["id"])
            for k, d in self.ctx.items()
            if not d["id"].startswith("@")
        }

    # ---- node/value parsing --------------------------------------------
    def _fresh(self) -> Term:
        self._bn += 1
        return bnode(f"_:jb{self._bn}")

    def _expand(
        self,
        key: str,
        _depth: int = 0,
        vocab: bool = True,
        doc_relative: bool = False,
    ) -> str:
        if _depth > 8 or key.startswith(_ABS_PREFIXES):
            return key
        if ":" in key:
            pfx, _, local = key.partition(":")
            if pfx in self.ctx:
                return self._expand(self.ctx[pfx]["id"], _depth + 1) + local
            # colon-containing values are IRIs in some other scheme
            # (mailto:, did:, ...): JSON-LD never vocab-expands those
            return key
        # plain (no-colon) term definitions are consulted only in vocab
        # position (JSON-LD IRI expansion gates the term-definition branch
        # on vocab=true; compact prefix:suffix IRIs expand regardless) — an
        # @id that merely collides with a context term name must NOT be
        # rewritten to that term's IRI
        if vocab and key in self.ctx:
            return self._expand(self.ctx[key]["id"], _depth + 1)
        if vocab and self.vocab and not key.startswith("@"):
            return self.vocab + key
        # document-relative positions (@id refs; @type after vocab fails)
        # resolve against @base per RFC 3986 (JSON-LD §5.2 IRI expansion);
        # with no base in scope a relative ref passes through unchanged
        if doc_relative and self.base and not key.startswith("@"):
            return resolve_iri(self.base, key)
        return key

    def _node_term(self, ref: str, vocab: bool = False) -> Term:
        """IRI reference -> term.  @id positions resolve against @base, NOT
        @vocab (JSON-LD §IRI expansion) — vocab expansion is bypassed by
        default and relative refs join onto the in-scope @base (pass-through
        when none is set).  @type positions are vocab-relative first, then
        base-relative — those call sites pass vocab=True."""
        if ref.startswith("_:"):
            return bnode(ref)
        return iri(self._expand(ref, vocab=vocab, doc_relative=True))

    def _property_values(self, key: str, value) -> list:
        """Normalize a property's JSON value per its term @container."""
        td = self.ctx.get(key)
        container = td["container"] if td else None
        if container == "@index":
            if not isinstance(value, dict):
                raise JsonLdError(f"@index container for {key!r} requires a map")
            return [
                x
                for sub in value.values()
                for x in (sub if isinstance(sub, list) else [sub])
            ]
        if container == "@language":
            if not isinstance(value, dict):
                raise JsonLdError(f"@language container for {key!r} requires a map")
            out = []
            for lang, sub in value.items():
                for s in sub if isinstance(sub, list) else [sub]:
                    if not isinstance(s, str):
                        raise JsonLdError(
                            f"@language map values for {key!r} must be strings"
                        )
                    out.append({"@value": s, "@language": lang})
            return out
        if container == "@list":
            if isinstance(value, dict) and "@list" in value:
                return [value]
            return [{"@list": value if isinstance(value, list) else [value]}]
        return value if isinstance(value, list) else [value]

    def parse_node(self, obj: dict) -> Term:
        local_ctx = "@context" in obj
        if local_ctx:
            saved = (dict(self.ctx), self.vocab, self.default_lang, self.base)
            self.apply_context(obj["@context"])
        subj = self._node_term(obj["@id"]) if "@id" in obj else self._fresh()
        self._parse_members(subj, obj)
        if local_ctx:
            self.ctx, self.vocab, self.default_lang, self.base = saved
        return subj

    def _nest(self, subj: Term, value) -> None:
        """@nest: the nested map's members are members of the ENCLOSING node
        (pure syntactic grouping — no node, no triple for the nest itself)."""
        for nv in value if isinstance(value, list) else [value]:
            if not isinstance(nv, dict) or any(
                k in nv for k in ("@value", "@id", "@list")
            ):
                raise JsonLdError(
                    "invalid @nest value: must be a node object without @id"
                )
            self._parse_members(subj, nv)

    def _parse_members(self, subj: Term, obj: dict) -> None:
        for key, value in obj.items():
            if key in ("@id", "@context"):
                continue
            if key == "@type":
                for t in value if isinstance(value, list) else [value]:
                    self.triples.append(
                        (subj, iri(RDF_TYPE), self._node_term(t, vocab=True))
                    )
                continue
            if key == "@graph":
                # named-graph node object: contents are flattened into the
                # single data graph — the reference loads every input quad
                # into one graph URI anyway (src/rdflib-graph.js:55-82 with
                # graphURI=urn:x-shacl:dataGraph), so validation verdicts
                # are identical
                for n in value if isinstance(value, list) else [value]:
                    if isinstance(n, dict):
                        self.parse_node(n)
                continue
            if key == "@nest":
                self._nest(subj, value)
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
            td = self.ctx.get(key)
            if td and td["id"] == "@nest":  # term aliased to @nest
                self._nest(subj, value)
                continue
            pred = iri(self._expand(key))
            if td and td["container"] == "@graph":
                # graph container: each value is a graph object — emit the
                # (subj, pred, graph-name) link with a fresh graph name per
                # value (JSON-LD 1.1 expansion) and flatten the contents
                # into the data graph, same as the @graph key above
                for v in value if isinstance(value, list) else [value]:
                    if not isinstance(v, dict) or any(
                        k in v for k in ("@value", "@list")
                    ):
                        raise JsonLdError(
                            f"@graph container value for {key!r} must be a node object"
                        )
                    gname = self._fresh()
                    self.triples.append((subj, pred, gname))
                    self.parse_node(v)
                continue
            for v in self._property_values(key, value):
                self.triples.append((subj, pred, self.parse_value(v, td)))

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

    def parse_value(self, v, td: dict | None = None) -> Term:
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
                    return literal(
                        str(val), self._expand(v["@type"], doc_relative=True)
                    )
                # explicit value objects opt out of term/default language
                return self._scalar(val, lang=None)
            return self.parse_node(v)
        # term-scoped coercion: "@type": "@id" makes strings node refs;
        # a datatype @type makes them typed literals; @language tags them
        if isinstance(v, str):
            t = td.get("type") if td else None
            if t == "@id":
                return self._node_term(v)
            if t:
                return literal(v, self._expand(t))
            lang = (td.get("language") if td else None) or self.default_lang
            return self._scalar(v, lang=lang)
        return self._scalar(v, lang=None)

    def _scalar(self, val, lang: str | None = None) -> Term:
        if isinstance(val, bool):
            return literal("true" if val else "false", XSD_BOOLEAN)
        if isinstance(val, int):
            return literal(str(val), XSD_INTEGER)
        if isinstance(val, float):
            return literal(repr(val), XSD_DOUBLE)
        if isinstance(val, str) and lang:
            return literal(val, lang=lang)
        return literal(str(val))


def parse_jsonld(
    text: str, contexts: dict | None = None
) -> tuple[list[Triple], dict[str, str]]:
    """Parse a JSON-LD document to triples + a prefix map.

    `contexts` registers remote-context URLs offline: {url: context-value},
    where a context value is whatever could appear inside "@context"
    (a dict of term definitions, a list, or another registered URL)."""
    doc = json.loads(text)
    p = _Parser(contexts)
    items = doc if isinstance(doc, list) else [doc]
    for item in items:
        if not isinstance(item, dict):
            continue
        if item.get("@context") is not None:
            # top-level contexts persist across sibling items (parse_node's
            # local-context save/restore would roll them back)
            p.apply_context(item["@context"])
            item = {k: v for k, v in item.items() if k != "@context"}
        # parse_node handles @graph members itself; a pure wrapper object
        # ({"@graph": [...]}) emits no triple for the wrapper node
        p.parse_node(item)
    return p.triples, p.prefix_map()
