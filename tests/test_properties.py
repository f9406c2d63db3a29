"""Property-based tests (hypothesis) for the pure kernels: serializer
round-trips, normalization idempotence, mint determinism, extractor
robustness — no Ray needed."""

from hypothesis import given, settings
from hypothesis import strategies as st

from graphforge_ray.extract.ntriples import format_triple_line, parse_nquads_line
from graphforge_ray.extract.rdfxml import extract_rdfxml_triples, js_trim
from graphforge_ray.iri import normalize_iri
from graphforge_ray.stages.linker import mint_iri, normalize_surface

# IRI-ish strings: no whitespace/angle brackets (N-Triples IRIs can't
# contain them unescaped; our engine stores IRIs as-is)
iri_strategy = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc", "Zs", "Zl", "Zp"),
        blacklist_characters="<>\"{}|^`\\",
    ),
    min_size=1,
    max_size=50,
).map(lambda s: "http://x/" + s)

literal_strategy = st.text(max_size=80)
lang_strategy = st.sampled_from(["", "en", "de", "pt-BR"])


@settings(max_examples=200)
@given(subj=iri_strategy, pred=iri_strategy, obj=literal_strategy,
       lang=lang_strategy)
def test_ntriples_literal_roundtrip(subj, pred, obj, lang):
    line = format_triple_line(subj, pred, obj, False, lang, "")
    parsed = parse_nquads_line(line)
    assert parsed == (subj, pred, obj, False, lang, "", "")


@settings(max_examples=200)
@given(subj=iri_strategy, pred=iri_strategy, obj=iri_strategy)
def test_ntriples_iri_roundtrip(subj, pred, obj):
    line = format_triple_line(subj, pred, obj, True)
    assert parse_nquads_line(line) == (subj, pred, obj, True, "", "", "")


@settings(max_examples=200)
@given(st.text(max_size=100))
def test_normalize_iri_idempotent(s):
    assert normalize_iri(normalize_iri(s)) == normalize_iri(s)


@settings(max_examples=200)
@given(st.text(max_size=60))
def test_mint_deterministic_and_ws_insensitive(s):
    assert mint_iri(s) == mint_iri(s)
    assert mint_iri(" " + s + "  ") == mint_iri(s)
    assert mint_iri(s).startswith("http://graft.example/minted/")


@settings(max_examples=100)
@given(st.text(max_size=60))
def test_normalize_surface_idempotent(s):
    assert normalize_surface(normalize_surface(s)) == normalize_surface(s)


@settings(max_examples=100)
@given(st.text(max_size=40))
def test_js_trim_is_python_strip_superset(s):
    out = js_trim(s)
    # trimmed result never starts/ends with ASCII whitespace
    assert out == out.strip(" \t\n\r\x0b\x0c")


@settings(max_examples=60)
@given(label=st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd")),
    min_size=0, max_size=30,
))
def test_rdfxml_label_roundtrip(label):
    doc = (
        '<?xml version="1.0"?>'
        '<rdf:RDF xmlns:rdf="http://www.w3.org/1999/02/22-rdf-syntax-ns#" '
        'xmlns:rdfs="http://www.w3.org/2000/01/rdf-schema#" '
        'xmlns:owl="http://www.w3.org/2002/07/owl#">'
        '<owl:Class rdf:about="http://x/C">'
        f"<rdfs:label>{label}</rdfs:label>"
        "</owl:Class></rdf:RDF>"
    )
    triples = extract_rdfxml_triples(doc)
    trimmed = js_trim(label)
    if trimmed:
        assert triples == [("http://x/C", "rdfs:label", trimmed,
                            trimmed.startswith("http"))]
    else:
        assert triples == []  # empty object dropped (document.js:733)
