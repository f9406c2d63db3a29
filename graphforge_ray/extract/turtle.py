"""Turtle parser (full grammar for the constructs real corpora use).

The reference parses Turtle with N3.js (``parseWithN3`` at
/root/reference/docs/scripts/document.js:702-717). We hand-roll a
recursive-descent parser (no external RDF libraries exist in this
environment) covering:

* ``@prefix p: <iri> .`` / SPARQL-style ``PREFIX p: <iri>``
* triple statements with ``;`` (predicate lists) and ``,`` (object lists)
* terms: ``<iri>``, ``prefix:local`` CURIEs, ``a`` (→ rdf:type),
  ``"literal"`` / ``'literal'`` with ``\\``-escapes, triple-quoted
  ``\"\"\"…\"\"\"`` / ``'''…'''`` long strings, ``@lang`` tags,
  ``^^datatype``, numeric literals incl. exponents (``4.2e-3`` →
  xsd:double), booleans, blank node labels ``_:name``
* anonymous blank nodes ``[ pred obj ; … ]`` (fresh ``_:anonN`` labels,
  nested to any depth — every OWL restriction is one of these)
* collections ``( a b c )`` → rdf:first / rdf:rest / rdf:nil chains
* ``#`` comments outside quoted strings

* ``@base <iri>`` / SPARQL-style ``BASE`` with RFC 3986 relative-IRI
  resolution (the reference gets this from N3.js's documentIRI handling,
  document.js:702-717): relative ``<iri>`` terms and relative prefix
  IRIs resolve against the innermost base; ``parse_turtle`` also accepts
  a ``base_iri`` (the document URL) so base-less documents with relative
  IRIs resolve the way a browser-side parser would.

All token access is bounds-checked: truncated payloads raise
``TurtleParseError`` (never IndexError), so poison rows quarantine instead
of killing the extract task.

Terms are returned as ``(subj, pred, obj, obj_is_iri, obj_lang,
obj_datatype)``; literal values carry their lexical form.
"""

from __future__ import annotations

import re

__all__ = ["parse_turtle", "resolve_iri", "TurtleParseError"]

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDF_TYPE = RDF_NS + "type"
RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"
XSD = "http://www.w3.org/2001/XMLSchema#"


class TurtleParseError(ValueError):
    pass


_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.\-]*:")


def resolve_iri(base: str | None, ref: str) -> str:
    """RFC 3986 §5.2 reference resolution. Absolute refs (scheme-prefixed)
    pass through; without a base the ref is kept as-is (lenient — N3.js
    keeps relative IRIs unresolved when no documentIRI is supplied, so
    base-less fixtures keep their historical output)."""
    if not base or _ABS_IRI.match(ref):
        return ref
    m = _ABS_IRI.match(base)
    if not m:
        return ref  # base itself isn't absolute: nothing to resolve with
    from urllib.parse import urljoin

    def join(b: str, r: str) -> str:
        out = urljoin(b, r)
        if r.endswith("#") and not out.endswith("#"):
            # urlunsplit drops an EMPTY fragment; hash-namespace prefix
            # IRIs ('terms#') must keep it or CURIEs concat wrong
            out += "#"
        return out

    scheme = m.group(0)[:-1]
    if scheme in ("http", "https", "file", "ftp"):
        return join(base, ref)
    # urljoin only merges for schemes on its allowlist; alias unknown
    # schemes (ex:, urn:, tag:) to http for the merge, then restore
    joined = join("http" + base[len(scheme):], ref)
    return scheme + joined[4:] if joined.startswith("http") else joined


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<literal3>\"\"\"(?:[^"\\]|\\.|"(?!""))*\"\"\"|'''(?:[^'\\]|\\.|'(?!''))*''')
  | (?P<literal>"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<prefix_kw>@prefix\b|@base\b)
  | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<number>[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+|\d*\.\d+|\d+))
  | (?P<punct>[.;,\[\]()])
  | (?P<curie_or_word>[^\s.;,"'<>@^\[\]()]+\b:?[^\s.;,"'<>@^\[\]()]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}

_NUMBER = re.compile(
    r"^[+-]?(?:\d+\.\d*[eE][+-]?\d+|\.\d+[eE][+-]?\d+|\d+[eE][+-]?\d+"
    r"|\d*\.\d+|\d+)$"
)
_EXPONENT = re.compile(r"[eE][+-]?\d+")


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u" and i + 6 <= len(s) - 0:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 10 <= len(s):
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _number_datatype(lexical: str) -> str:
    if _EXPONENT.search(lexical):
        return XSD + "double"
    if "." in lexical:
        return XSD + "decimal"
    return XSD + "integer"


def _tokens(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if not m:
            raise TurtleParseError(
                f"lex error at offset {pos}: {text[pos:pos+40]!r}"
            )
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()


class _Parser:
    """Recursive-descent Turtle parser. Every token access goes through
    ``tok()`` which raises TurtleParseError on EOF — truncated documents
    can never escape as IndexError."""

    def __init__(self, text: str, base_iri: str | None = None):
        self.toks = list(_tokens(text))
        self.i = 0
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[str, str, str, bool, str, str]] = []
        self._anon = 0
        self.base = base_iri

    # -- token plumbing ----------------------------------------------------

    def at_end(self) -> bool:
        return self.i >= len(self.toks)

    def tok(self) -> tuple[str, str]:
        if self.i >= len(self.toks):
            raise TurtleParseError("unexpected end of input")
        return self.toks[self.i]

    def advance(self) -> tuple[str, str]:
        t = self.tok()
        self.i += 1
        return t

    def is_punct(self, ch: str) -> bool:
        return not self.at_end() and self.toks[self.i] == ("punct", ch)

    def expect_punct(self, ch: str) -> None:
        if not self.is_punct(ch):
            got = None if self.at_end() else self.toks[self.i]
            raise TurtleParseError(f"expected {ch!r}, got {got!r}")
        self.i += 1

    def fresh_bnode(self) -> str:
        label = f"_:anon{self._anon}"
        self._anon += 1
        return label

    # -- term resolution ---------------------------------------------------

    def expand(self, kind: str, val: str) -> tuple[str, bool]:
        """Resolve an IRI-ish token → (value, is_iri)."""
        if kind == "iri":
            return resolve_iri(self.base, val[1:-1]), True
        if kind == "curie_or_word":
            if val == "a":
                return RDF_TYPE, True
            if val.startswith("_:"):
                return val, True  # blank node label (IRI-kind term)
            if ":" in val:
                pfx, local = val.split(":", 1)
                base = self.prefixes.get(pfx)
                if base is None:
                    raise TurtleParseError(f"undefined prefix {pfx!r}")
                return base + local, True
            raise TurtleParseError(f"bare word {val!r}")
        raise TurtleParseError(f"unexpected term token {kind}:{val!r}")

    def node(self, allow_literal: bool) -> tuple[str, bool, str, str]:
        """Parse one node (term, anon bnode, or collection) →
        (value, is_iri, lang, datatype)."""
        kind, val = self.tok()
        if kind == "punct" and val == "[":
            self.i += 1
            label = self.fresh_bnode()
            if not self.is_punct("]"):
                self.predicate_object_list(label)
            self.expect_punct("]")
            return label, True, "", ""
        if kind == "punct" and val == "(":
            return self.collection(), True, "", ""
        if kind in ("literal", "literal3"):
            self.i += 1
            q = 3 if kind == "literal3" else 1
            obj = _unescape(val[q:-q])
            lang, dtype = "", ""
            if not self.at_end():
                nk, nv = self.toks[self.i]
                if nk == "langtag":
                    lang = nv[1:]
                    self.i += 1
                elif nk == "dtype":
                    self.i += 1
                    dk, dv = self.advance()
                    dtype, _ = self.expand(dk, dv)
            if not allow_literal:
                raise TurtleParseError("literal not allowed as subject")
            return obj, False, lang, dtype
        if kind == "number" or (kind == "curie_or_word" and _NUMBER.match(val)):
            if not allow_literal:
                raise TurtleParseError("literal not allowed as subject")
            self.i += 1
            return val, False, "", _number_datatype(val)
        if kind == "curie_or_word" and val in ("true", "false"):
            if not allow_literal:
                raise TurtleParseError("literal not allowed as subject")
            self.i += 1
            return val, False, "", XSD + "boolean"
        value, is_iri = self.expand(kind, val)
        self.i += 1
        return value, is_iri, "", ""

    def collection(self) -> str:
        """``( item item … )`` → rdf:first/rdf:rest chain; returns the head
        term (rdf:nil for the empty collection)."""
        self.expect_punct("(")
        items: list[tuple[str, bool, str, str]] = []
        while not self.is_punct(")"):
            items.append(self.node(allow_literal=True))
        self.expect_punct(")")
        if not items:
            return RDF_NIL
        labels = [self.fresh_bnode() for _ in items]
        for idx, (label, item) in enumerate(zip(labels, items)):
            value, is_iri, lang, dtype = item
            self.triples.append((label, RDF_FIRST, value, is_iri, lang, dtype))
            rest = labels[idx + 1] if idx + 1 < len(labels) else RDF_NIL
            self.triples.append((label, RDF_REST, rest, True, "", ""))
        return labels[0]

    # -- grammar -----------------------------------------------------------

    def predicate_object_list(self, subj: str) -> None:
        while True:
            pk, pv = self.advance()
            pred, _ = self.expand(pk, pv)
            while True:
                value, is_iri, lang, dtype = self.node(allow_literal=True)
                self.triples.append((subj, pred, value, is_iri, lang, dtype))
                if self.is_punct(","):
                    self.i += 1
                    continue
                break
            if self.is_punct(";"):
                self.i += 1
                while self.is_punct(";"):  # N3.js tolerates ';;'
                    self.i += 1
                # trailing ';' before '.' or ']'
                if self.at_end() or self.is_punct(".") or self.is_punct("]"):
                    return
                continue
            return

    def directive(self) -> None:
        kind, val = self.advance()
        is_at = kind == "prefix_kw"
        if val == "@base" or val.upper() == "BASE":
            ik, iv = self.advance()
            if ik != "iri":
                raise TurtleParseError(f"bad base iri {iv!r}")
            # a relative @base resolves against the base in force (spec
            # §6.3: each directive rebinds for the REST of the document)
            self.base = resolve_iri(self.base, iv[1:-1])
            if is_at:
                self.expect_punct(".")
            elif self.is_punct("."):
                self.i += 1
            return
        pk, pv = self.advance()
        if pk != "curie_or_word" or not pv.endswith(":"):
            raise TurtleParseError(f"bad prefix name {pv!r}")
        ik, iv = self.advance()
        if ik != "iri":
            raise TurtleParseError(f"bad prefix iri {iv!r}")
        # prefix IRIs resolve against the base too (spec 2.4)
        self.prefixes[pv[:-1]] = resolve_iri(self.base, iv[1:-1])
        if is_at:
            self.expect_punct(".")
        elif self.is_punct("."):
            self.i += 1

    def parse(self):
        while not self.at_end():
            kind, val = self.tok()
            if kind == "prefix_kw" or (
                kind == "curie_or_word" and val.upper() in ("PREFIX", "BASE")
            ):
                self.directive()
                continue
            subj, is_iri, _lang, _dtype = self.node(allow_literal=False)
            # a bare '[ … ] .' statement needs no predicate-object list
            if not self.is_punct("."):
                self.predicate_object_list(subj)
            self.expect_punct(".")
        return self.triples, self.prefixes


def parse_turtle(
    text: str, base_iri: str | None = None
) -> tuple[list[tuple[str, str, str, bool, str, str]], dict[str, str]]:
    """Parse a Turtle document. Returns ``(triples, prefixes)`` where each
    triple is ``(subj, pred, obj, obj_is_iri, obj_lang, obj_datatype)``.
    ``base_iri`` (typically the document URL) seeds relative-IRI
    resolution; an ``@base`` directive in the document overrides it."""
    return _Parser(text, base_iri).parse()
