"""Unit tests for the reference-faithful RDF/XML extractor rules (SURVEY
§2.2 P2–P8), each pinned to the reference behavior it replicates
(/root/reference/docs/scripts/document.js:720-821)."""

import pytest

from graphforge_ray.extract.rdfxml import (
    RdfXmlParseError,
    extract_rdfxml_triples,
    js_trim,
)

NS = (
    'xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
    'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
    'xmlns:owl="http://www.w3.org/2002/07/owl#" '
    'xmlns:ex="http://ex.org/"'
)


def wrap(body: str) -> str:
    return f'<?xml version="1.0"?><rdf:RDF {NS}>{body}</rdf:RDF>'


def test_owl_class_text_child_trimmed():
    # P2: attr-first, then textContent.trim() (document.js:731)
    t = extract_rdfxml_triples(
        wrap('<owl:Class rdf:about="http://ex.org/A">'
             "<rdfs:label>  hi there \n</rdfs:label></owl:Class>")
    )
    assert t == [("http://ex.org/A", "rdfs:label", "hi there", False)]


def test_rdf_resource_attr_wins_over_text():
    t = extract_rdfxml_triples(
        wrap('<owl:Class rdf:about="http://ex.org/A">'
             '<rdfs:seeAlso rdf:resource="http://ex.org/B">text ignored'
             "</rdfs:seeAlso></owl:Class>")
    )
    assert t == [("http://ex.org/A", "rdfs:seeAlso", "http://ex.org/B", True)]


def test_empty_object_dropped():
    # document.js:733 — falsy objectValue emits nothing
    t = extract_rdfxml_triples(
        wrap('<owl:Class rdf:about="http://ex.org/A">'
             "<rdfs:label>   </rdfs:label><rdfs:comment/></owl:Class>")
    )
    assert t == []


def test_iri_vs_literal_startswith_http():
    # P3 (document.js:739): startsWith('http') — includes https and even
    # bare 'httpfoo'
    t = extract_rdfxml_triples(
        wrap('<owl:Class rdf:about="http://ex.org/A">'
             "<ex:a>https://x</ex:a><ex:b>httpmash</ex:b><ex:c>ftp://x</ex:c>"
             "</owl:Class>")
    )
    assert [(x[2], x[3]) for x in t] == [
        ("https://x", True), ("httpmash", True), ("ftp://x", False)
    ]


def test_blank_subject_fallback():
    # P4 (document.js:735): no rdf:about/rdf:ID in scope → '_:blank'
    t = extract_rdfxml_triples(
        wrap('<ex:Widget><ex:rel rdf:resource="http://ex.org/B"/></ex:Widget>')
    )
    assert t == [("_:blank", "ex:rel", "http://ex.org/B", True)]


def test_rdf_id_minting_and_inheritance():
    t = extract_rdfxml_triples(
        wrap('<ex:Widget rdf:ID="w1">'
             '<ex:rel rdf:resource="http://ex.org/B"/></ex:Widget>')
    )
    assert t == [("w1", "ex:rel", "http://ex.org/B", True)]


def test_one_of_expansion():
    # P7 (document.js:782-799)
    t = extract_rdfxml_triples(
        wrap('<owl:Class rdf:about="http://ex.org/E">'
             "<owl:equivalentClass><owl:Class><owl:oneOf>"
             '<rdf:Description rdf:about="http://ex.org/m1"/>'
             '<rdf:Description rdf:about="http://ex.org/m2"/>'
             "</owl:oneOf></owl:Class></owl:equivalentClass></owl:Class>")
    )
    assert t == [
        ("http://ex.org/m1", "rdf:type", "http://ex.org/E", True),
        ("http://ex.org/m2", "rdf:type", "http://ex.org/E", True),
    ]


def test_generic_text_property_emits_nothing():
    # Load-bearing reference quirk: under a generic element, a text-only
    # child has childNodes (text node) → recursed, not extracted
    # (document.js:766-768).
    t = extract_rdfxml_triples(
        wrap("<ex:Widget><ex:name>Bob</ex:name></ex:Widget>")
    )
    assert t == []


def test_rdf_description_properties_dropped():
    # rdf:Description children are recursed as containers; plain property
    # children emit nothing (document.js:773-777 + generic branch).
    t = extract_rdfxml_triples(
        wrap('<rdf:Description rdf:about="http://ex.org/D">'
             "<ex:name>Bob</ex:name>"
             '<ex:rel rdf:resource="http://ex.org/B"/>'
             "</rdf:Description>")
    )
    assert t == []


def test_description_subject_inherited_by_nested_structure():
    # but structure nested under rdf:Description inherits its subject
    t = extract_rdfxml_triples(
        wrap('<rdf:Description rdf:about="http://ex.org/D">'
             '<ex:Holder><ex:rel rdf:resource="http://ex.org/B"/></ex:Holder>'
             "</rdf:Description>")
    )
    assert t == [("http://ex.org/D", "ex:rel", "http://ex.org/B", True)]


def test_owl_class_children_not_recursed():
    # children of owl:Class become triples (textContent of subtree), never
    # recursed (document.js:750-759)
    t = extract_rdfxml_triples(
        wrap('<owl:Class rdf:about="http://ex.org/A">'
             "<ex:wrap><ex:inner>deep</ex:inner></ex:wrap></owl:Class>")
    )
    assert t == [("http://ex.org/A", "ex:wrap", "deep", False)]


def test_empty_rdf_resource_falls_through_to_text():
    # hasAttribute('rdf:resource') true but value "" → || falls to text
    t = extract_rdfxml_triples(
        wrap('<ex:W rdf:about="http://ex.org/W">'
             '<ex:rel rdf:resource="">fallback text</ex:rel></ex:W>')
    )
    assert t == [("http://ex.org/W", "ex:rel", "fallback text", False)]


def test_malformed_xml_raises():
    with pytest.raises(RdfXmlParseError):
        extract_rdfxml_triples("<rdf:RDF><unclosed>")


def test_js_trim_strips_bom_and_nbsp():
    assert js_trim("﻿  x  ") == "x"
