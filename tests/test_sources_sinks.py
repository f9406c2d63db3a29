"""Source/sink coverage: file-based ingest (S1/S2), N-Quads loader (S6),
Turtle serializer (S7), salted surface-form counts, incremental ingest
(S11 append-at-read semantics)."""

import os

import pandas as pd
import pytest

from graphforge_ray.extract.ntriples import format_triple_line
from graphforge_ray.fixtures import gen_page
from graphforge_ray.sinks.ntriples_sink import serialize_turtle
from graphforge_ray.sources.files import read_ntriples, read_source_documents
from graphforge_ray.stages.canonicalize import surface_form_counts


def _write_fixture_docs(root) -> None:
    os.makedirs(root, exist_ok=True)
    # one turtle + one rdfxml doc from the deterministic corpus + one
    # unsupported file that discovery must skip
    with open(os.path.join(root, "a.owl"), "wb") as f:
        f.write(gen_page(0)["html"])  # kind 0 = rdfxml
    with open(os.path.join(root, "b.ttl"), "wb") as f:
        f.write(gen_page(1)["html"])  # kind 1 = turtle
    with open(os.path.join(root, "ignore.bin"), "wb") as f:
        f.write(b"\x00\x01")


def test_read_source_documents_and_forge(ray_session, tmp_path):
    from graphforge_ray.pipelines.forge import forge_triples

    root = str(tmp_path / "proj")
    _write_fixture_docs(root)
    pages = read_source_documents(root)
    pdf = pages.to_pandas()
    assert len(pdf) == 2  # .bin skipped at discovery
    assert set(pdf["url"].str.split("/").str[-1]) == {"a.owl", "b.ttl"}

    tri = forge_triples(pages, canonicalize=False).to_pandas()
    assert len(tri) > 5
    assert (tri["pred"] == "rdfs:label").any()        # rdfxml path
    assert tri["pred"].str.startswith("http://graft.example/").any()  # turtle


def test_read_ntriples_roundtrip(ray_session, tmp_path):
    lines = [
        format_triple_line("http://s1", "http://p", "http://o", True),
        format_triple_line("http://s2", "http://p", 'lit "x"', False),
        format_triple_line("http://s3", "http://p", "bonjour", False, "fr"),
        "# comment",
        "",
    ]
    path = tmp_path / "quads.nq"
    path.write_text("\n".join(lines) + "\n")
    out = read_ntriples(str(path)).to_pandas()
    assert len(out) == 3
    row = out.set_index("subj").loc["http://s2"]
    assert row["obj"] == 'lit "x"' and not row["obj_is_iri"]
    assert out.set_index("subj").loc["http://s3", "obj_lang"] == "fr"


def test_serialize_turtle_small():
    import pyarrow as pa

    table = pa.table(
        {
            "subj": ["http://ex.org/a", "http://ex.org/a"],
            "pred": ["http://ex.org/knows", "http://ex.org/name"],
            "obj": ["http://ex.org/b", "Ann"],
            "obj_is_iri": [True, False],
            "obj_lang": ["", "en"],
            "obj_datatype": ["", ""],
        }
    )
    ttl = serialize_turtle(table, prefixes={"ex": "http://ex.org/"})
    assert "@prefix ex: <http://ex.org/> ." in ttl
    assert "ex:a" in ttl and "ex:knows ex:b" in ttl
    assert '"Ann"@en' in ttl


def test_surface_form_counts_salted(ray_session):
    import ray.data as rd

    rows = []
    for i in range(300):  # head entity: one norm form dominates
        rows.append({"subj": "http://big.example.com/Hot",
                     "pred": "p", "obj": f"http://x/{i}", "obj_is_iri": True})
    rows.append({"subj": "https://big.example.com/Hot/",  # variant spelling
                 "pred": "p", "obj": "http://x/0", "obj_is_iri": True})
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = surface_form_counts(ds, columns=["subj"]).to_pandas()
    counts = dict(zip(out["norm"], out["n"]))
    assert counts["http://big.example.com/Hot"] == 301  # variants merged


def test_incremental_ingest_union(ray_session, tmp_path):
    """S11: appending new source docs ≡ new blocks, union at read; set
    semantics keep previously-forged triples stable."""
    from graphforge_ray.pipelines.forge import forge_triples

    root = str(tmp_path / "proj")
    _write_fixture_docs(root)
    first = forge_triples(read_source_documents(root), canonicalize=False).to_pandas()
    with open(os.path.join(root, "c.ttl"), "wb") as f:
        f.write(gen_page(5)["html"])  # another turtle doc
    second = forge_triples(read_source_documents(root), canonicalize=False).to_pandas()

    key = ["subj", "pred", "obj"]
    s1 = set(map(tuple, first[key].to_numpy()))
    s2 = set(map(tuple, second[key].to_numpy()))
    assert s1 <= s2 and len(s2) > len(s1)


def test_lang_datatype_graph_roundtrip_queryable(ray_session, tmp_path):
    """Quarantine-free round trip (r3 verdict item #2 'Done' criterion):
    lang-tagged / datatype-typed / named-graph triples survive
    write_ntriples → read_ntriples byte-exactly AND stay queryable —
    LANG()/DATATYPE() filters and GRAPH scoping run over the RELOADED
    dataset and return the original rows."""
    import pandas as pd
    import ray.data as rd

    from graphforge_ray.query.sparql import run_select
    from graphforge_ray.sinks.ntriples_sink import write_ntriples
    from graphforge_ray.sources.files import read_ntriples

    rows = [
        ("http://x/a", "http://x/label", "cat", False, "en", "", ""),
        ("http://x/b", "http://x/label", "chat", False, "fr", "", ""),
        ("http://x/c", "http://x/label", "plain", False, "", "", ""),
        ("http://x/a", "http://x/size", "5", False, "",
         "http://www.w3.org/2001/XMLSchema#integer", ""),
        ("http://x/a", "http://x/in", "http://x/g1thing", True, "", "",
         "http://x/graph1"),
        ("http://x/b", "http://x/in", "http://x/g2thing", True, "", "",
         "http://x/graph2"),
    ]
    df = pd.DataFrame(
        rows,
        columns=["subj", "pred", "obj", "obj_is_iri", "obj_lang",
                 "obj_datatype", "graph"],
    )
    out = str(tmp_path / "nt")
    stats = write_ntriples(rd.from_pandas(df).repartition(2), out)
    assert stats["lines"] == len(rows)

    reloaded = read_ntriples(out)
    assert reloaded.count() == len(rows)  # nothing quarantined/dropped

    got = run_select(
        reloaded,
        'SELECT ?s ?v WHERE { ?s <http://x/label> ?v . '
        'FILTER(LANG(?v) = "en") }',
    )
    assert list(got["s"]) == ["http://x/a"] and list(got["v"]) == ["cat"]

    got = run_select(
        reloaded,
        "SELECT ?s WHERE { ?s <http://x/size> ?v . FILTER(DATATYPE(?v) "
        "= <http://www.w3.org/2001/XMLSchema#integer>) }",
    )
    assert list(got["s"]) == ["http://x/a"]

    got = run_select(
        reloaded,
        "SELECT ?g ?s WHERE { GRAPH ?g { ?s <http://x/in> ?o } }",
    )
    assert set(zip(got["g"], got["s"])) == {
        ("http://x/graph1", "http://x/a"),
        ("http://x/graph2", "http://x/b"),
    }


def test_arrow_formatter_byte_identical_to_reference(ray_session):
    # r5 (r4 verdict item #10): the Arrow sink kernel must serialize
    # byte-identically to the per-row reference formatter across every
    # branch: bnodes, IRIs, escapes, lang tags, datatypes, quads
    import pyarrow as pa

    from graphforge_ray.sinks.ntriples_sink import (
        format_ntriples_batch, format_ntriples_lines_arrow,
    )

    df = pd.DataFrame(
        {
            "subj": ["http://e/a", "_:b1", "http://e/c", "http://e/d",
                     "http://e/e"],
            "pred": ["http://p/1"] * 5,
            "obj": ['lit "q" \\ \n\r\t end', "http://e/o", "plain",
                    "tagged", "typed"],
            "obj_is_iri": [False, True, False, False, False],
            "obj_lang": ["", "", "", "en", ""],
            "obj_datatype": ["", "", "", "",
                             "http://www.w3.org/2001/XMLSchema#int"],
            "graph": ["", "http://g/1", "", "_:g2", ""],
        }
    )
    ref = format_ntriples_batch(df)["line"].tolist()
    got = format_ntriples_lines_arrow(
        pa.Table.from_pandas(df)
    ).to_pylist()
    assert got == ref
    # null metadata columns behave like the pandas path's `or ""`
    df2 = df.assign(obj_lang=None, obj_datatype=None, graph=None)
    ref2 = format_ntriples_batch(df2)["line"].tolist()
    got2 = format_ntriples_lines_arrow(
        pa.Table.from_pandas(df2)
    ).to_pylist()
    assert got2 == ref2
    # columns absent entirely (bare triples) still serialize
    df3 = df[["subj", "pred", "obj", "obj_is_iri"]]
    ref3 = format_ntriples_batch(df3)["line"].tolist()
    got3 = format_ntriples_lines_arrow(
        pa.Table.from_pandas(df3)
    ).to_pylist()
    assert got3 == ref3


def test_jsonl_roundtrip_and_poison(ray_session, tmp_path):
    import json as _json

    import ray.data as rd

    from graphforge_ray import metrics
    from graphforge_ray.sources.jsonl import read_jsonl, write_jsonl

    src = tmp_path / "in"
    src.mkdir()
    lines = [
        _json.dumps({"doc_id": 1, "text": "hello", "score": 0.5}),
        _json.dumps({"doc_id": 2, "text": None, "extra": "ignored"}),
        _json.dumps({"doc_id": 3}),                     # missing keys
        "{not json",                                     # poison
        _json.dumps([1, 2, 3]),                          # not an object
        "",
    ]
    (src / "a.jsonl").write_text("\n".join(lines))
    fields = {"doc_id": "int64", "text": "str", "score": "float64"}
    before = metrics.snapshot()
    ds = read_jsonl(str(src / "a.jsonl"), fields)
    got = ds.to_pandas().sort_values("doc_id").reset_index(drop=True)
    after = metrics.snapshot()
    assert len(got) == 3
    assert got["doc_id"].tolist() == [1, 2, 3]
    assert got.loc[0, "text"] == "hello" and pd.isna(got.loc[2, "text"])
    assert got.loc[0, "score"] == 0.5 and pd.isna(got.loc[1, "score"])
    assert metrics.delta(before, after).get("jsonl.bad_lines") == 2

    out = tmp_path / "out"
    acc = write_jsonl(ds, str(out))
    assert acc["rows"] == 3
    back = read_jsonl(
        str(out), fields
    ).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, got)

    import ray

    # strict mode surfaces through Ray's task-error wrapper
    with pytest.raises(ray.exceptions.RayTaskError, match="bad JSONL"):
        read_jsonl(str(src / "a.jsonl"), fields, strict=True).to_pandas()
    with pytest.raises(ValueError, match="unsupported field types"):
        read_jsonl(str(src / "a.jsonl"), {"x": "list"})
