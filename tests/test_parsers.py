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


# -- Turtle full-grammar additions (anon bnodes, collections, long strings,
# exponents) — reference parity: N3.js accepts all of these
# (document.js:702-717) ------------------------------------------------------

def test_turtle_anonymous_bnode_owl_restriction():
    triples, _ = parse_turtle(
        f"@prefix ex: <{EX}> .\n"
        "@prefix owl: <http://www.w3.org/2002/07/owl#> .\n"
        "@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        "ex:A rdfs:subClassOf [ a owl:Restriction ;\n"
        "    owl:onProperty ex:hasTopping ;\n"
        "    owl:someValuesFrom ex:Cheese ] .\n"
    )
    # the bnode links subject to the restriction triple set
    sub = [t for t in triples if t[1].endswith("subClassOf")]
    assert len(sub) == 1
    bnode = sub[0][2]
    assert bnode.startswith("_:anon")
    nested = {t[1] for t in triples if t[0] == bnode}
    assert "http://www.w3.org/2002/07/owl#onProperty" in nested
    assert RDF_TYPE in nested


def test_turtle_nested_anonymous_bnodes():
    triples, _ = parse_turtle(
        f"@prefix ex: <{EX}> .\n"
        "ex:x ex:p [ ex:q [ ex:r ex:y ] ] .\n"
        "[ ex:standalone ex:z ] .\n"
    )
    outer = next(t[2] for t in triples if t[0] == f"{EX}x")
    inner = next(t[2] for t in triples if t[0] == outer)
    assert (inner, f"{EX}r", f"{EX}y", True, "", "") in triples
    assert any(t[1] == f"{EX}standalone" for t in triples)


def test_turtle_collection_first_rest_nil():
    from graphforge_ray.extract.turtle import RDF_FIRST, RDF_NIL, RDF_REST

    triples, _ = parse_turtle(
        f"@prefix ex: <{EX}> .\nex:s ex:list ( ex:a \"two\" 3 ) .\n"
        "ex:s ex:empty () .\n"
    )
    head = next(t[2] for t in triples if t[1] == f"{EX}list")
    firsts, node, order = {}, head, []
    rests = {t[0]: t[2] for t in triples if t[1] == RDF_REST}
    first_of = {t[0]: t[2] for t in triples if t[1] == RDF_FIRST}
    while node != RDF_NIL:
        order.append(first_of[node])
        node = rests[node]
    assert order == [f"{EX}a", "two", "3"]
    assert next(t[2] for t in triples if t[1] == f"{EX}empty") == RDF_NIL


def test_turtle_triple_quoted_strings():
    triples, _ = parse_turtle(
        f'@prefix ex: <{EX}> .\n'
        'ex:a ex:doc """multi\nline with "quotes" inside"""@en .\n'
        "ex:a ex:doc2 '''single-quoted\nlong''' .\n"
    )
    objs = {t[2] for t in triples}
    assert 'multi\nline with "quotes" inside' in objs
    assert "single-quoted\nlong" in objs
    assert any(t[4] == "en" for t in triples)


def test_turtle_numeric_exponents():
    triples, _ = parse_turtle(
        f"@prefix ex: <{EX}> .\n"
        "ex:a ex:v 4.2e-3 , 1E10 , .5e2 , -3e+1 , .25 .\n"
    )
    got = {(t[2], t[5].rsplit("#", 1)[-1]) for t in triples}
    assert got == {
        ("4.2e-3", "double"), ("1E10", "double"), (".5e2", "double"),
        ("-3e+1", "double"), (".25", "decimal"),
    }


@pytest.mark.parametrize(
    "bad",
    [
        "@prefix ex: <http://e/> .\nex:a ex:b",          # missing object+dot
        "@prefix ex: <http://e/> .\nex:a ex:b \"open",   # unterminated quote
        "@prefix ex:",                                     # truncated directive
        "@prefix ex: <http://e/> .\nex:a ex:b ex:c ;",    # dangling ';'
        "@prefix ex: <http://e/> .\nex:a ex:b [ ex:c ex:d .",  # unclosed '['
        "@prefix ex: <http://e/> .\nex:a ex:b ( ex:c .",  # unclosed '('
    ],
)
def test_turtle_truncated_raises_parse_error(bad):
    """Truncated payloads raise TurtleParseError (quarantine-able), never
    IndexError (which would kill the extract map task)."""
    with pytest.raises(TurtleParseError):
        parse_turtle(bad)


# -- sniff_kind dispatch ------------------------------------------------------

def test_sniff_ntriples_not_misrouted_to_rdfxml():
    from graphforge_ray.stages.extract import sniff_kind

    assert sniff_kind(b'<http://e/s> <http://e/p> "o" .\n') == "ntriples"
    assert sniff_kind(b'<http://e/s> <http://e/p> <http://e/o> .') == "ntriples"
    assert sniff_kind(b'_:b0 <http://e/p> "o" .') == "ntriples"
    assert sniff_kind(b'<?xml version="1.0"?><rdf:RDF/>') == "rdfxml"
    assert sniff_kind(b"<unknownXml><a/></unknownXml>") == "rdfxml"


def test_extract_quarantines_truncated_turtle():
    """A poison turtle row lands in quarantine; the batch's good rows
    survive (extract task never dies)."""
    import pyarrow as pa

    from graphforge_ray.stages.extract import (
        PRED_QUARANTINE,
        extract_pages_batch,
    )

    batch = pa.table(
        {
            "url": ["http://a/ok.ttl", "http://a/bad.ttl"],
            "html": [
                b"@prefix ex: <http://e/> .\nex:a ex:b ex:c .",
                b"@prefix ex: <http://e/> .\nex:a ex:b",
            ],
        }
    )
    out = extract_pages_batch(batch)
    preds = out.column("pred").to_pylist()
    assert f"{'http://e/b'}" in preds
    assert PRED_QUARANTINE in preds


def test_turtle_fixture_full_grammar_no_quarantine():
    """The turtle fixture kind uses `[ ]`, `( )`, long strings and
    exponents; all of it must flow through extraction with zero quarantine
    rows (VERDICT r1 item 4 done-criterion)."""
    import pyarrow as pa

    from graphforge_ray.fixtures import gen_page
    from graphforge_ray.stages.extract import (
        PRED_QUARANTINE,
        extract_pages_batch,
    )

    pages = [gen_page(i) for i in range(1, 64, 4)]  # kind 1 = turtle
    batch = pa.table(
        {"url": [p["url"] for p in pages], "html": [p["html"] for p in pages]}
    )
    out = extract_pages_batch(batch)
    preds = set(out.column("pred").to_pylist())
    assert PRED_QUARANTINE not in preds
    assert "http://www.w3.org/1999/02/22-rdf-syntax-ns#first" in preds
    anon = [s for s in out.column("subj").to_pylist() if s.startswith("_:anon")]
    assert anon


def test_map_table_tabular_rml(ray_session):
    """Generic mapping-spec engine over a tabular Dataset (north star:
    R2RML/RML-style column-to-triple mapping)."""
    import pandas as pd
    import ray.data as rd

    from graphforge_ray.extract.jsonmap import map_table

    ds = rd.from_pandas(pd.DataFrame(
        {"id": [1, 2], "name": ["Ann", None], "tags": [["x", "y"], ["z"]]}
    ))
    spec = [
        {"subject": "e:{id}", "predicate": "p:name", "object": "{name}"},
        {"subject": "e:{id}", "predicate": "p:tag", "object": "t:{tags}",
         "object_kind": "iri"},
    ]
    out = map_table(ds, spec).to_pandas()
    got = set(map(tuple, out[["subj", "pred", "obj", "obj_is_iri"]].values))
    assert got == {
        ("e:1", "p:name", "Ann", False),        # row 2 name None → dropped
        ("e:1", "p:tag", "t:x", True),          # list fan-out
        ("e:1", "p:tag", "t:y", True),
        ("e:2", "p:tag", "t:z", True),
    }


def test_sniff_generic_xml_with_adjacent_tags_is_rdfxml():
    from graphforge_ray.stages.extract import sniff_kind

    assert sniff_kind(
        b"<catalog> <item> Fine piece . Sold out </item> </catalog>"
    ) == "rdfxml"
    assert sniff_kind(b'<http://e/s> <http://e/p> "o" .') == "ntriples"
    assert sniff_kind(b"<http://e/s> <http://e/p> <http://e/o> .") == "ntriples"
    assert sniff_kind(b"<http://e/s> <http://e/p> _:b1 .") == "ntriples"


# -- @base / relative IRI resolution (r3: last residual Turtle gap) --------

def test_turtle_base_directive_resolves_relative_iris():
    triples, _ = parse_turtle(
        "@base <http://ex.org/data/> .\n"
        "<alice> <knows> <bob> .\n"
        "</rooted> <knows> <#frag> ."
    )
    assert (
        "http://ex.org/data/alice", "http://ex.org/data/knows",
        "http://ex.org/data/bob", True, "", "",
    ) in triples
    assert (
        "http://ex.org/rooted", "http://ex.org/data/knows",
        "http://ex.org/data/#frag", True, "", "",
    ) in triples


def test_turtle_base_rebinds_and_relative_base_chains():
    triples, _ = parse_turtle(
        "@base <http://ex.org/a/> .\n"
        "<x> <p> <y> .\n"
        "@base <sub/> .\n"          # relative: resolves against the prior base
        "<x> <p> <y> ."
    )
    subjects = sorted(t[0] for t in triples)
    assert subjects == ["http://ex.org/a/sub/x", "http://ex.org/a/x"]


def test_turtle_document_iri_seeds_resolution():
    triples, _ = parse_turtle(
        "<alice> <knows> <bob> .", base_iri="http://host/dir/doc.ttl"
    )
    assert triples[0][0] == "http://host/dir/alice"
    # no base at all: relative IRIs pass through (N3.js-lenient)
    triples, _ = parse_turtle("<alice> <knows> <bob> .")
    assert triples[0][0] == "alice"


def test_turtle_prefix_iri_resolves_against_base():
    triples, _ = parse_turtle(
        "@base <http://ex.org/voc/> .\n"
        "@prefix p: <terms#> .\n"
        "<s> p:knows <o> ."
    )
    assert triples[0][1] == "http://ex.org/voc/terms#knows"


def test_turtle_sparql_style_base():
    triples, _ = parse_turtle(
        "BASE <http://ex.org/b/>\n<s> <p> <o> ."
    )
    assert triples[0] == (
        "http://ex.org/b/s", "http://ex.org/b/p", "http://ex.org/b/o",
        True, "", "",
    )


def test_resolve_iri_unknown_scheme_and_dotsegments():
    from graphforge_ray.extract.turtle import resolve_iri

    assert resolve_iri("ex://h/a/b/c", "../d") == "ex://h/a/d"
    assert resolve_iri("http://h/a/b", "./c") == "http://h/a/c"
    assert resolve_iri("http://h/a/b", "http://other/x") == "http://other/x"
    assert resolve_iri(None, "rel") == "rel"


def test_base_document_no_longer_quarantines(ray_session):
    """An @base turtle payload used to raise -> quarantine; it must now
    extract resolved absolute IRIs through the full pipeline stage."""
    import pyarrow as pa

    from graphforge_ray.stages.extract import extract_pages_batch, sniff_kind

    payload = (
        b"@base <http://ex.org/kg/> .\n"
        b"@prefix rdfs: <http://www.w3.org/2000/01/rdf-schema#> .\n"
        b'<thing> rdfs:label "Thing" .\n'
    )
    assert sniff_kind(payload) == "turtle"
    out = extract_pages_batch(
        pa.table({"url": ["https://x/doc.ttl"], "html": [payload]})
    )
    rows = {
        (s.as_py(), p.as_py(), o.as_py())
        for s, p, o in zip(out.column("subj"), out.column("pred"),
                           out.column("obj"))
    }
    assert (
        "http://ex.org/kg/thing",
        "http://www.w3.org/2000/01/rdf-schema#label",
        "Thing",
    ) in rows
    assert not any("quarantined" in p for _, p, _o in rows)
