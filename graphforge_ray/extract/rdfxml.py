"""Reference-faithful RDF/XML triple extractor.

Reproduces, rule for rule, the custom DOM walker of the reference
(``parseWithRdfParser`` at /root/reference/docs/scripts/document.js:720-821;
variants graphProcessor.js:203-304, test HTML/SPARQL.html:90-172). The
reference's behavior — including its idiosyncrasies — is the P/R contract:

* object value = ``rdf:resource`` attribute if present and non-empty, else
  ``textContent.trim()`` (attribute-first, then trimmed concatenated
  descendant text) — document.js:731;
* empty object value → the triple is dropped — document.js:733;
* subject = ``rdf:about`` || ``rdf:ID`` || inherited subject, with the
  literal sentinel ``'_:blank'`` when no subject is in scope —
  document.js:748, :735;
* object typed as IRI iff ``value.startsWith('http')`` — document.js:739;
* ``owl:Class``: each element child becomes a triple off the class subject
  (no recursion into children); ``owl:equivalentClass`` children are routed
  to the ``owl:oneOf`` enumeration expansion — document.js:750-759;
* ``owl:equivalentClass / owl:Class / (descendant) owl:oneOf / (descendant)
  rdf:Description[@rdf:about]`` members each yield
  ``(member, 'rdf:type', classSubject)`` — document.js:782-799;
* generic elements: an element child with an ``rdf:resource`` attribute
  emits a triple; a child with ANY child nodes (including text) is recursed
  into (so plain-text properties under generic elements emit NOTHING — a
  load-bearing reference quirk); a fully-empty child attempts
  ``textContent.trim()`` which is empty → dropped — document.js:764-771;
* ``rdf:RDF`` and ``rdf:Description`` are transparent containers: children
  are recursed with the (possibly re-minted) subject, and their property
  children therefore also emit nothing unless they nest deeper structure —
  document.js:773-777.

Implementation: a small expat-built tree (tag names and attribute names kept
exactly as written, no namespace expansion — matching browser
``DOMParser``'s ``nodeName``/``getAttribute`` behavior), then an iterative
walk implementing the rules above. Pure function; safe to call from
stateless ``map_batches`` tasks.
"""

from __future__ import annotations

import xml.parsers.expat
from dataclasses import dataclass, field

__all__ = ["extract_rdfxml_triples", "RdfXmlParseError"]

BLANK = "_:blank"
_SPECIAL_CONTAINERS = ("rdf:RDF", "rdf:Description")

# JS String.prototype.trim() strips Unicode WhiteSpace + LineTerminator,
# which includes BOM (U+FEFF). Python str.strip() with this explicit set
# matches it for all practical inputs.
_JS_WS = (
    " \t\n\r\x0b\x0c﻿        "
    "         　"
)


def js_trim(s: str) -> str:
    return s.strip(_JS_WS)


class RdfXmlParseError(ValueError):
    """Raised when the payload is not well-formed XML."""


@dataclass
class _El:
    name: str
    attrs: dict[str, str]
    # children holds _El nodes and str text nodes, in document order —
    # mirroring DOM childNodes (whitespace text nodes preserved, as
    # browser DOMParser does).
    children: list = field(default_factory=list)

    def get_attr(self, name: str) -> str | None:
        return self.attrs.get(name)

    def element_children(self):
        return [c for c in self.children if isinstance(c, _El)]

    def text_content(self) -> str:
        """DOM textContent: concatenated descendant text, document order."""
        out: list[str] = []
        stack = [self]
        # iterative DFS preserving document order
        while stack:
            node = stack.pop()
            if isinstance(node, str):
                out.append(node)
            else:
                stack.extend(reversed(node.children))
        return "".join(out)

    def descendants_named(self, name: str):
        """getElementsByTagName: all descendant elements with this tag name,
        document order (does not include self)."""
        found = []
        stack = list(reversed(self.element_children()))
        while stack:
            node = stack.pop()
            if node.name == name:
                found.append(node)
            stack.extend(reversed(node.element_children()))
        return found


def _build_tree(content: bytes | str) -> _El:
    """Parse XML into an _El tree with qualified names as written."""
    parser = xml.parsers.expat.ParserCreate()  # no namespace processing
    parser.buffer_text = True
    root: list[_El] = []
    stack: list[_El] = []

    def start(name, attrs):
        el = _El(name, attrs)
        if stack:
            stack[-1].children.append(el)
        else:
            root.append(el)
        stack.append(el)

    def end(name):
        stack.pop()

    def chars(data):
        if stack:
            stack[-1].children.append(data)

    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    try:
        if isinstance(content, str):
            parser.Parse(content, True)
        else:
            parser.Parse(content, True)
    except xml.parsers.expat.ExpatError as e:  # malformed document
        raise RdfXmlParseError(str(e)) from e
    if not root:
        raise RdfXmlParseError("no document element")
    return root[0]


def _emit(out: list, subject: str, predicate: str, object_value: str | None):
    """extractTriples — document.js:726-742. Returns nothing; appends
    (subj, pred, obj, obj_is_iri) or drops when the object is empty."""
    if not object_value:
        return
    safe_subject = subject or BLANK
    is_iri = object_value.startswith("http")
    out.append((safe_subject, predicate, object_value, is_iri))


def _object_value(el: _El) -> str | None:
    """rdf:resource attribute first (falsy empty string falls through,
    matching JS ``||``), else trimmed textContent — document.js:731."""
    return el.get_attr("rdf:resource") or js_trim(el.text_content())


def _handle_equivalent_class(out: list, node: _El, subject: str):
    """handleEquivalentClass — document.js:782-799."""
    for child in node.element_children():
        if child.name == "owl:Class":
            one_of_list = child.descendants_named("owl:oneOf")
            if one_of_list:
                for member in one_of_list[0].descendants_named("rdf:Description"):
                    member_uri = member.get_attr("rdf:about")
                    if member_uri:
                        _emit(out, member_uri, "rdf:type", subject)


def _traverse(out: list, el: _El, subject: str):
    """traverseXML — document.js:745-779. Recursive like the reference so
    emission order matches document order exactly (depth bounded by the
    XML nesting of one page; pages are small after decode)."""
    new_subject = el.get_attr("rdf:about") or el.get_attr("rdf:ID") or subject
    if el.name == "owl:Class":
        for child in el.element_children():
            if child.name == "owl:equivalentClass":
                _handle_equivalent_class(out, child, new_subject)
            else:
                _emit(out, new_subject, child.name, _object_value(child))
    elif el.name not in _SPECIAL_CONTAINERS:
        for child in el.element_children():
            if child.get_attr("rdf:resource") is not None:
                # hasAttribute — even an empty rdf:resource takes this
                # branch; _object_value then falls through to text.
                _emit(out, new_subject, child.name, _object_value(child))
            elif child.children:
                # ANY child nodes (incl. text) → recurse, emit nothing
                _traverse(out, child, new_subject)
            else:
                _emit(out, new_subject, child.name, _object_value(child))
    else:
        # rdf:RDF / rdf:Description: transparent container
        for child in el.element_children():
            _traverse(out, child, new_subject)


def extract_rdfxml_triples(content: bytes | str) -> list[tuple[str, str, str, bool]]:
    """Extract ``(subj, pred, obj, obj_is_iri)`` tuples from an RDF/XML
    document, preserving emission order (duplicates preserved; set semantics
    are applied downstream by the dedup shuffle, mirroring N3.Store's
    set-insert at document.js:710)."""
    root = _build_tree(content)
    out: list[tuple[str, str, str, bool]] = []
    _traverse(out, root, "")
    return out
