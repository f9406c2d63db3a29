"""P/R gate: the distributed extractor must match the single-threaded
reference-faithful oracle on the fixture corpus (BASELINE.json: triple
P/R ≥ 0.95; we assert exact agreement on the structured payloads)."""

import pyarrow as pa
import pytest

from graphforge_ray.extract.rdfxml import extract_rdfxml_triples
from graphforge_ray.fixtures import KINDS, gen_page, gen_pages_table
from graphforge_ray.oracle import oracle_rdfxml_triples, oracle_store_for_docs
from graphforge_ray.stages.extract import extract_pages_batch

N = 200  # covers all payload kinds, domains, class variants


def _fixture_docs(kinds=("rdfxml", "turtle")):
    docs = []
    for i in range(N):
        kind = KINDS[i % 4]
        if kind in kinds:
            payload = gen_page(i)["html"].decode()
            docs.append((kind, payload))
    return docs


def test_expat_extractor_matches_minidom_oracle_per_doc():
    """Two independent implementations (expat tree walk vs minidom
    transliteration) must agree triple-for-triple, in order."""
    for kind, payload in _fixture_docs(kinds=("rdfxml",)):
        assert extract_rdfxml_triples(payload) == oracle_rdfxml_triples(payload)


def test_distributed_extract_precision_recall(ray_session):
    import ray.data as rd

    pages = gen_pages_table(N)
    ds = rd.from_arrow(pages)
    out = ds.map_batches(
        extract_pages_batch, batch_format="pyarrow", batch_size=64
    ).to_pandas()
    # structured payloads only (html/json link rows are engine extensions
    # with no reference analog; prefixDecl rows are prefix-map metadata,
    # not triples — the reference keeps prefixes outside the store too)
    from graphforge_ray.stages.extract import PRED_PREFIX

    struct = out[
        out["kind"].isin(["rdfxml", "turtle"]) & (out["pred"] != PRED_PREFIX)
    ]
    got = {
        (r.subj, r.pred, r.obj, bool(r.obj_is_iri))
        for r in struct.itertuples()
    }
    want = oracle_store_for_docs(_fixture_docs())
    tp = len(got & want)
    precision = tp / max(1, len(got))
    recall = tp / max(1, len(want))
    assert precision >= 0.95, f"precision {precision}: extra {list(got - want)[:5]}"
    assert recall >= 0.95, f"recall {recall}: missing {list(want - got)[:5]}"
    # and in fact exact:
    assert got == want


def test_quarantine_not_fail():
    batch = pa.table(
        {
            "url": ["https://x/броken.owl"],
            "html": [b"<?xml version='1.0'?><rdf:RDF><unclosed>"],
        }
    )
    out = extract_pages_batch(batch)
    assert out.num_rows == 1
    assert out.column("pred")[0].as_py().endswith("quarantined")


def test_string_html_column_supported():
    """A corpus whose html column is utf-8 STRING (not the canonical
    binary) must extract normally — and malformed string payloads must
    QUARANTINE, not raise from sniff_kind (which previously ran before
    the try and crashed the whole task on str input)."""
    batch = pa.table(
        {
            "url": ["https://x/a", "https://x/bad"],
            "html": [
                '<html><body><a href="https://x/b">B page</a></body></html>',
                "<not<xml",
            ],
        }
    )
    out = extract_pages_batch(batch)
    preds = [p.as_py() for p in out.column("pred")]
    assert any(p.endswith("linksTo") for p in preds)
    assert any(p.endswith("quarantined") for p in preds)
