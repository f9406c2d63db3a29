"""N-Triples / N-Quads line-oriented serializer + parser.

Reference writes the materialized graph as N-Quads via
``N3.Writer({format:'application/n-quads'})``
(/root/reference/docs/scripts/document.js:168-198) and loads it back with a
streaming N-Quads parse (document.js:849-863). Here both directions are pure
string functions usable inside ``map_batches`` — one line per triple/quad,
canonical escaping per the W3C N-Triples grammar.
"""

from __future__ import annotations

import re

__all__ = ["format_term", "format_triple_line", "parse_nquads_line", "parse_nquads"]

_ESC = {
    "\\": "\\\\",
    '"': '\\"',
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}
_ESC_RE = re.compile(r'[\\"\n\r\t]')


def _escape_literal(value: str) -> str:
    return _ESC_RE.sub(lambda m: _ESC[m.group()], value)


def format_term(value: str, is_iri: bool, lang: str = "", datatype: str = "") -> str:
    if is_iri:
        if value.startswith("_:"):
            return value
        return f"<{value}>"
    lit = f'"{_escape_literal(value)}"'
    if lang:
        return f"{lit}@{lang}"
    if datatype:
        return f"{lit}^^<{datatype}>"
    return lit


def format_triple_line(
    subj: str,
    pred: str,
    obj: str,
    obj_is_iri: bool,
    obj_lang: str = "",
    obj_datatype: str = "",
    graph: str = "",
) -> str:
    s = format_term(subj, True)
    p = format_term(pred, True)
    o = format_term(obj, obj_is_iri, obj_lang, obj_datatype)
    if graph:
        return f"{s} {p} {o} {format_term(graph, True)} ."
    return f"{s} {p} {o} ."


_UNESC = {
    "\\\\": "\\",
    '\\"': '"',
    "\\n": "\n",
    "\\r": "\r",
    "\\t": "\t",
}
_UNESC_RE = re.compile(r'\\[\\"nrt]|\\u[0-9a-fA-F]{4}|\\U[0-9a-fA-F]{8}')

_LINE = re.compile(
    r"""^\s*
    (?:<(?P<s_iri>[^>]*)>|(?P<s_bn>_:\S+))\s+
    <(?P<p>[^>]*)>\s+
    (?:
        <(?P<o_iri>[^>]*)>
      | (?P<o_bn>_:\S+)
      | "(?P<o_lit>(?:[^"\\]|\\.)*)"
        (?:@(?P<lang>[a-zA-Z0-9-]+)|\^\^<(?P<dtype>[^>]*)>)?
    )
    (?:\s+(?:<(?P<g_iri>[^>]*)>|(?P<g_bn>_:\S+)))?
    \s*\.\s*$""",
    re.VERBOSE,
)


def _unescape(value: str) -> str:
    def sub(m: re.Match) -> str:
        t = m.group()
        if t in _UNESC:
            return _UNESC[t]
        return chr(int(t[2:], 16))

    return _UNESC_RE.sub(sub, value)


def parse_nquads_line(
    line: str,
) -> tuple[str, str, str, bool, str, str, str] | None:
    """Parse one N-Triples/N-Quads line →
    ``(subj, pred, obj, obj_is_iri, obj_lang, obj_datatype, graph)`` or
    ``None`` for blank/comment lines. Raises ValueError on malformed lines."""
    stripped = line.strip()
    if not stripped or stripped.startswith("#"):
        return None
    m = _LINE.match(stripped)
    if not m:
        raise ValueError(f"malformed N-Quads line: {line!r}")
    subj = m.group("s_iri") if m.group("s_iri") is not None else m.group("s_bn")
    pred = m.group("p")
    if m.group("o_iri") is not None:
        obj, is_iri, lang, dtype = m.group("o_iri"), True, "", ""
    elif m.group("o_bn") is not None:
        obj, is_iri, lang, dtype = m.group("o_bn"), True, "", ""
    else:
        obj = _unescape(m.group("o_lit"))
        is_iri = False
        lang = m.group("lang") or ""
        dtype = m.group("dtype") or ""
    graph = m.group("g_iri") or m.group("g_bn") or ""
    return (subj, pred, obj, is_iri, lang, dtype, graph)


def parse_nquads(text: str) -> list[tuple[str, str, str, bool, str, str, str]]:
    out = []
    for line in text.splitlines():
        parsed = parse_nquads_line(line)
        if parsed is not None:
            out.append(parsed)
    return out
