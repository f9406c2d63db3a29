"""Turtle subset parser.

The reference parses Turtle with N3.js (``parseWithN3`` at
/root/reference/docs/scripts/document.js:702-717). We hand-roll a parser for
the well-defined subset our corpus uses (no external RDF libraries exist in
this environment):

* ``@prefix p: <iri> .`` / SPARQL-style ``PREFIX p: <iri>``
* triple statements with ``;`` (predicate lists) and ``,`` (object lists)
* terms: ``<iri>``, ``prefix:local`` CURIEs, ``a`` (→ rdf:type),
  ``"literal"`` with ``\\``-escapes, ``@lang`` tags, ``^^datatype``,
  bare integers / decimals / booleans (typed literals, like N3.js),
  blank node labels ``_:name``
* ``#`` comments outside quoted strings

Out of scope (documented): collections ``( .. )``, anonymous bnodes
``[ .. ]``, triple-quoted strings, numeric exponents. The fixture generator
stays inside the subset; real-corpus rows that fail to parse are routed to a
quarantine count rather than failing the job (reference rejects the file:
document.js:673-676).

Terms are returned as ``(subj, pred, obj, obj_is_iri, obj_lang,
obj_datatype)``; literal values carry their lexical form.
"""

from __future__ import annotations

import re

__all__ = ["parse_turtle", "TurtleParseError"]

RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
XSD = "http://www.w3.org/2001/XMLSchema#"


class TurtleParseError(ValueError):
    pass


_TOKEN = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<literal>"(?:[^"\\]|\\.)*")
  | (?P<prefix_kw>@prefix\b|@base\b)
  | (?P<langtag>@[a-zA-Z][a-zA-Z0-9-]*)
  | (?P<dtype>\^\^)
  | (?P<number>[+-]?\d+\.\d+|[+-]?\d+(?=[\s;,]|\.\s|$))
  | (?P<punct>[.;,])
  | (?P<curie_or_word>[^\s.;,"<>@^]+\b:?[^\s.;,"<>@^]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}

_NUMBER = re.compile(r"^[+-]?\d+(\.\d+)?$")


def _unescape(s: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u" and i + 5 < len(s) + 1:
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U" and i + 9 < len(s) + 1:
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokens(text: str):
    pos = 0
    n = len(text)
    while pos < n:
        m = _TOKEN.match(text, pos)
        if not m:
            raise TurtleParseError(f"lex error at offset {pos}: {text[pos:pos+40]!r}")
        pos = m.end()
        kind = m.lastgroup
        if kind in ("ws", "comment"):
            continue
        yield kind, m.group()


def parse_turtle(
    text: str,
) -> tuple[list[tuple[str, str, str, bool, str, str]], dict[str, str]]:
    """Parse a Turtle document (subset). Returns ``(triples, prefixes)``
    where each triple is ``(subj, pred, obj, obj_is_iri, obj_lang,
    obj_datatype)``."""
    prefixes: dict[str, str] = {}
    triples: list[tuple[str, str, str, bool, str, str]] = []
    toks = list(_tokens(text))
    i = 0
    n = len(toks)

    def expand(kind: str, val: str) -> tuple[str, bool]:
        """Resolve a term token → (value, is_iri)."""
        if kind == "iri":
            return val[1:-1], True
        if kind == "curie_or_word":
            if val == "a":
                return RDF_TYPE, True
            if val.startswith("_:"):
                return val, True  # blank node label (IRI-kind term)
            if ":" in val:
                pfx, local = val.split(":", 1)
                base = prefixes.get(pfx)
                if base is None:
                    raise TurtleParseError(f"undefined prefix {pfx!r}")
                return base + local, True
            raise TurtleParseError(f"bare word {val!r}")
        raise TurtleParseError(f"unexpected term token {kind}:{val!r}")

    while i < n:
        kind, val = toks[i]
        # prefix directives
        if kind == "prefix_kw" or (kind == "curie_or_word" and val.upper() == "PREFIX"):
            is_at = kind == "prefix_kw"
            if val == "@base":
                raise TurtleParseError("@base not supported")
            pk, pv = toks[i + 1]
            if pk != "curie_or_word" or not pv.endswith(":"):
                raise TurtleParseError(f"bad prefix name {pv!r}")
            ik, iv = toks[i + 2]
            if ik != "iri":
                raise TurtleParseError(f"bad prefix iri {iv!r}")
            prefixes[pv[:-1]] = iv[1:-1]
            i += 3
            if is_at:
                if i >= n or toks[i] != ("punct", "."):
                    raise TurtleParseError("@prefix missing terminating '.'")
                i += 1
            elif i < n and toks[i] == ("punct", "."):
                i += 1
            continue

        # subject
        subj, _ = expand(kind, val)
        i += 1
        while True:
            # predicate
            pk, pv = toks[i]
            pred, _ = expand(pk, pv)
            i += 1
            while True:
                # object
                ok, ov = toks[i]
                i += 1
                lang, dtype = "", ""
                if ok == "literal":
                    obj, is_iri = _unescape(ov[1:-1]), False
                    if i < n and toks[i][0] == "langtag":
                        lang = toks[i][1][1:]
                        i += 1
                    elif i < n and toks[i][0] == "dtype":
                        dk, dv = toks[i + 1]
                        dtype, _ = expand(dk, dv)
                        i += 2
                elif ok == "number" or (ok == "curie_or_word" and _NUMBER.match(ov)):
                    obj, is_iri = ov, False
                    dtype = XSD + ("decimal" if "." in ov else "integer")
                elif ok == "curie_or_word" and ov in ("true", "false"):
                    obj, is_iri = ov, False
                    dtype = XSD + "boolean"
                else:
                    obj, is_iri = expand(ok, ov)
                triples.append((subj, pred, obj, is_iri, lang, dtype))
                if toks[i] == ("punct", ","):
                    i += 1
                    continue
                break
            if toks[i] == ("punct", ";"):
                i += 1
                # allow trailing ';' before '.'
                if toks[i] == ("punct", "."):
                    i += 1
                    break
                continue
            if toks[i] == ("punct", "."):
                i += 1
                break
            raise TurtleParseError(f"expected . ; or , got {toks[i]!r}")
        continue

    return triples, prefixes
