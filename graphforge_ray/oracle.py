"""Single-threaded reference-faithful oracle.

Independent re-implementation of the reference pipeline's visible semantics,
used ONLY as the golden comparator for P/R tests (FIXTURES.md §3). Written
against ``xml.dom.minidom`` — the closest stdlib analog of the browser DOM
the reference walks — and deliberately structured as a 1:1 transliteration
of ``parseWithRdfParser`` (/root/reference/docs/scripts/document.js:720-821)
so reviewers can diff it against the JS line by line. The distributed
extractor (graphforge_ray/extract/rdfxml.py) is an independent expat-based
implementation; tests assert set-level agreement between the two.

Net visible semantics of the reference (SURVEY.md §2.3 quirk note): the
loaded graph is the DEDUPLICATED UNION of all source documents' triples
(N3.Store set-insert, document.js:710/:857), so the oracle exposes a
set-valued API.
"""

from __future__ import annotations

import xml.dom.minidom

from .extract.rdfxml import js_trim
from .extract.turtle import parse_turtle

__all__ = ["oracle_rdfxml_triples", "oracle_store_for_docs"]

ELEMENT_NODE = xml.dom.minidom.Node.ELEMENT_NODE


def oracle_rdfxml_triples(content: str) -> list[tuple[str, str, str, bool]]:
    """parseWithRdfParser — document.js:720-821, transliterated."""
    xml_doc = xml.dom.minidom.parseString(content)
    out: list[tuple[str, str, str, bool]] = []

    def get_attribute(node, name):
        # DOM getAttribute returns "" when absent; JS code relies on ||
        # falsiness, which Python's `or` mirrors for "".
        return node.getAttribute(name) if node.attributes is not None else ""

    def text_content(node) -> str:
        parts = []
        for child in node.childNodes:
            if child.nodeType in (child.TEXT_NODE, child.CDATA_SECTION_NODE):
                parts.append(child.data)
            elif child.nodeType == ELEMENT_NODE:
                parts.append(text_content(child))
        return "".join(parts)

    def extract_triples(subject, predicate, obj):
        # document.js:726-742
        if isinstance(obj, str):
            object_value = obj
        else:
            object_value = get_attribute(obj, "rdf:resource") or js_trim(
                text_content(obj)
            )
        if object_value:
            safe_subject = subject or "_:blank"
            out.append(
                (safe_subject, predicate, object_value,
                 object_value.startswith("http"))
            )

    def handle_equivalent_class(node, subject):
        # document.js:782-799
        for child in node.childNodes:
            if child.nodeType == ELEMENT_NODE:
                if child.nodeName == "owl:Class":
                    one_of = child.getElementsByTagName("owl:oneOf")
                    if one_of:
                        members = one_of[0].getElementsByTagName("rdf:Description")
                        for member in members:
                            member_uri = get_attribute(member, "rdf:about")
                            if member_uri:
                                extract_triples(member_uri, "rdf:type", subject)

    def traverse_xml(node, subject):
        # document.js:745-779
        if node.nodeType == ELEMENT_NODE:
            node_name = node.nodeName
            new_subject = (
                get_attribute(node, "rdf:about")
                or get_attribute(node, "rdf:ID")
                or subject
            )
            if node_name == "owl:Class":
                for child in node.childNodes:
                    if child.nodeType == ELEMENT_NODE:
                        if child.nodeName == "owl:equivalentClass":
                            handle_equivalent_class(child, new_subject)
                        else:
                            extract_triples(new_subject, child.nodeName, child)
            elif node_name not in ("rdf:RDF", "rdf:Description"):
                for child in node.childNodes:
                    if child.nodeType == ELEMENT_NODE:
                        predicate = child.nodeName
                        if child.attributes is not None and child.hasAttribute(
                            "rdf:resource"
                        ):
                            extract_triples(new_subject, predicate, child)
                        elif child.childNodes.length > 0:
                            traverse_xml(child, new_subject)
                        else:
                            extract_triples(new_subject, predicate, child)
            else:
                for child in node.childNodes:
                    traverse_xml(child, new_subject)

    rdf_root = xml_doc.documentElement
    if rdf_root is not None:
        traverse_xml(rdf_root, "")
    return out


def oracle_store_for_docs(
    docs: list[tuple[str, str]]
) -> set[tuple[str, str, str, bool]]:
    """Triplify a list of (kind, content) docs (kind ∈ {rdfxml, turtle})
    into the deduplicated-union store the reference would hold after
    loading them all (checkAndTriplify → loadQuadsToStore semantics)."""
    store: set[tuple[str, str, str, bool]] = set()
    for kind, content in docs:
        if kind == "rdfxml":
            store.update(oracle_rdfxml_triples(content))
        elif kind == "turtle":
            for s, p, o, is_iri, _lang, _dt in parse_turtle(content)[0]:
                store.add((s, p, o, is_iri))
        else:
            raise ValueError(f"unsupported doc kind {kind!r}")
    return store
