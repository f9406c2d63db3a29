"""Turtle / N-Triples / HTML / JSON-mapping parser unit tests."""

import pytest

from graphforge_ray.extract.html_text import extract_text_and_anchors
from graphforge_ray.extract.jsonmap import apply_mapping, map_json_text
from graphforge_ray.extract.ntriples import (
    format_triple_line,
    parse_nquads,
    parse_nquads_line,
)
from graphforge_ray.extract.turtle import RDF_TYPE, TurtleParseError, parse_turtle

EX = "http://ex.org/"


# -- Turtle -----------------------------------------------------------------

def test_turtle_basic():
    triples, prefixes = parse_turtle(
        f"@prefix ex: <{EX}> .\n"
        "ex:a ex:knows ex:b ; ex:name \"Ann\"@en .\n"
        "ex:b a ex:Person .\n"
    )
    assert prefixes == {"ex": EX}
    assert (f"{EX}a", f"{EX}knows", f"{EX}b", True, "", "") in triples
    assert (f"{EX}a", f"{EX}name", "Ann", False, "en", "") in triples
    assert (f"{EX}b", RDF_TYPE, f"{EX}Person", True, "", "") in triples


def test_turtle_numbers_booleans_datatypes():
    triples, _ = parse_turtle(
        f"@prefix ex: <{EX}> .\n"
        "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n"
        "ex:a ex:n 42 ; ex:d 3.14 ; ex:t true ; "
        'ex:s "7"^^xsd:int .\n'
    )
    objs = {(t[2], t[5]) for t in triples}
    assert ("42", "http://www.w3.org/2001/XMLSchema#integer") in objs
    assert ("3.14", "http://www.w3.org/2001/XMLSchema#decimal") in objs
    assert ("true", "http://www.w3.org/2001/XMLSchema#boolean") in objs
    assert ("7", "http://www.w3.org/2001/XMLSchema#int") in objs


def test_turtle_object_lists_and_comments():
    triples, _ = parse_turtle(
        f"@prefix ex: <{EX}> .\n"
        "# a comment\n"
        "ex:a ex:likes ex:b, ex:c . # trailing\n"
    )
    assert len(triples) == 2


def test_turtle_escapes():
    triples, _ = parse_turtle(
        f'@prefix ex: <{EX}> .\nex:a ex:s "line\\nbreak \\"q\\" \\u00e9" .\n'
    )
    assert triples[0][2] == 'line\nbreak "q" é'


def test_turtle_undefined_prefix_raises():
    with pytest.raises(TurtleParseError):
        parse_turtle("foo:a foo:b foo:c .")


# -- N-Triples --------------------------------------------------------------

def test_ntriples_roundtrip():
    cases = [
        ("http://s", "http://p", "http://o", True, "", "", ""),
        ("http://s", "http://p", 'lit "q"\n\t\\', False, "", "", ""),
        ("http://s", "http://p", "bonjour", False, "fr", "", ""),
        ("http://s", "http://p", "42", False, "",
         "http://www.w3.org/2001/XMLSchema#integer", ""),
        ("_:b0", "http://p", "_:b1", True, "", "", "http://g"),
    ]
    for s, p, o, iri, lang, dt, g in cases:
        line = format_triple_line(s, p, o, iri, lang, dt, g)
        assert parse_nquads_line(line) == (s, p, o, iri, lang, dt, g)


def test_ntriples_skips_comments_and_blanks():
    text = "# header\n\n<http://s> <http://p> <http://o> .\n"
    assert len(parse_nquads(text)) == 1


def test_ntriples_malformed_raises():
    with pytest.raises(ValueError):
        parse_nquads_line("not a triple")


# -- HTML text --------------------------------------------------------------

def test_html_text_deterministic_and_clean():
    html = (b"<html><head><title>T</title><script>x()</script>"
            b"<style>s{}</style></head><body><h1>Head</h1>"
            b"<p>a   b\n c</p><p>More <a href='http://e/x'>link  text</a></p>"
            b"</body></html>")
    text1, anchors1 = extract_text_and_anchors(html)
    text2, anchors2 = extract_text_and_anchors(html)
    assert text1 == text2  # byte-identical per input (north-rule invariant)
    assert "x()" not in text1 and "s{}" not in text1
    assert "a b c" in text1.splitlines()
    assert anchors1 == [("http://e/x", "link text")]


def test_html_charrefs():
    text, _ = extract_text_and_anchors(b"<html><body><p>a &amp; b</p></body></html>")
    assert text == "a & b"


# -- JSON mapping -----------------------------------------------------------

def test_apply_mapping_fanout_and_drop():
    spec = [
        {"subject": "doc:{id}", "predicate": "p:name", "object": "{name}",
         "object_kind": "literal"},
        {"subject": "doc:{id}", "predicate": "p:rel", "object": "{related}"},
        {"subject": "doc:{id}", "predicate": "p:missing", "object": "{nope}"},
    ]
    rec = {"id": 7, "name": "x", "related": ["http://a", "b"]}
    out = apply_mapping(rec, spec)
    assert ("doc:7", "p:name", "x", False, "", "") in out
    assert ("doc:7", "p:rel", "http://a", True, "", "") in out  # startswith http
    assert ("doc:7", "p:rel", "b", False, "", "") in out
    assert not any(t[1] == "p:missing" for t in out)


def test_map_json_text_script_block():
    html = ('<html><body><script type="application/json">'
            '{"id": 1, "name": "N", "type": "http://t", "related": []}'
            "</script></body></html>")
    out = map_json_text(html)
    assert any(p == "http://schema.org/name" and o == "N" for _, p, o, *_ in out)
    assert any(p == "rdf:type" and o == "http://t" for _, p, o, *_ in out)


def test_map_json_text_garbage_is_empty():
    assert map_json_text("<html><body>no json</body></html>") == []
    assert map_json_text("{broken json") == []
