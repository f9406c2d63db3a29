"""Stage 1 — decode + format dispatch + triple/text extraction.

Ray-Data shape: ONE stateless ``map_batches`` pass over the pages table
(``batch_format="pyarrow"``, zero-copy from the object store) that fuses the
reference's read→triplify flow (``triplify`` dispatch at
/root/reference/docs/scripts/document.js:657-698). Per page, dispatch on a
content sniff (production corpus rows carry no extension; the reference
dispatches on filename extension — document.js:666):

    rdfxml  → reference-faithful walker (extract/rdfxml.py)        → triples
    turtle  → subset parser (extract/turtle.py)                    → triples
    json    → RML-style mapping (extract/jsonmap.py)               → triples
    html    → deterministic text + anchors (extract/html_text.py)  → one
              TEXT row (pred="", text column filled — the per-url
              byte-identical extracted text artifact) + anchor triples +
              candidate-mention rows for the linker actor stage

Unsupported / malformed payloads are routed to quarantine rows
(pred=QUARANTINE) instead of failing the job — the reference rejects the
file (document.js:673-676); at 10^12 documents a poison row must never kill
the run.

Output schema (EXTRACT_SCHEMA) is the triples schema + ``score`` + ``text``
+ ``kind``; downstream stages filter on ``pred``. The wide ``html`` column
dies here — only narrow rows enter any shuffle (SURVEY §4.3 "wide records").
"""

from __future__ import annotations

import re

import pyarrow as pa

from ..extract.html_text import extract_text_and_anchors
from ..iri import normalize_iri
from ..extract.jsonmap import map_json_text
from ..extract.ntriples import parse_nquads
from ..extract.rdfxml import RdfXmlParseError, extract_rdfxml_triples
from ..extract.turtle import TurtleParseError, parse_turtle

__all__ = [
    "EXTRACT_SCHEMA", "sniff_kind", "extract_pages_batch",
    "PRED_TEXT", "PRED_MENTION", "PRED_LINKS_TO", "PRED_QUARANTINE",
    "PRED_PREFIX", "VOCAB",
]

VOCAB = "http://graft.example/vocab#"
PRED_TEXT = ""  # text rows carry no predicate
PRED_MENTION = VOCAB + "candidateMention"
PRED_LINKS_TO = VOCAB + "linksTo"
PRED_QUARANTINE = VOCAB + "quarantined"
# prefix declarations surfaced from parsed sources (reference accumulates
# every parse's prefixes into the global prefix map used at query time —
# document.js:706-715, :940-942); these rows are metadata, not triples
PRED_PREFIX = VOCAB + "prefixDecl"

EXTRACT_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_iri", pa.bool_()),
        ("obj_lang", pa.string()),
        ("obj_datatype", pa.string()),
        ("graph", pa.string()),
        ("src_url", pa.string()),
        ("score", pa.float64()),
        ("text", pa.string()),
        ("kind", pa.string()),
    ]
)


# subject IRI + predicate IRI + an N-Triples OBJECT shape (IRI,
# bnode, or quoted literal): two adjacent simple XML tags
# (b"<catalog> <item> text") must NOT match
_NT_LINE = re.compile(rb"^<[^<>\s]+>\s+<[^<>\s]+>\s+(?:<[^<>\s]+>|_:\S+|\")")


def sniff_kind(payload: bytes) -> str:
    """Content-sniff the payload format (production rows have no file
    extension; mirrors the reference's extension dispatch semantics)."""
    head = payload[:512].lstrip()
    if head.startswith(b"<?xml") or head.startswith(b"<rdf:RDF"):
        return "rdfxml"
    if head.startswith((b"@prefix", b"@base", b"PREFIX", b"BASE ")):
        return "turtle"
    low = head.lower()
    if low.startswith(b"<!doctype html") or low.startswith(b"<html"):
        if b'type="application/json"' in payload:
            return "json"
        return "html"
    if head.startswith(b"{") or head.startswith(b"["):
        return "json"
    # N-Triples line shape BEFORE the bare-'<' XML fallback: '<s> <p> …'
    # (an XML tag can't contain the '>' + whitespace + '<iri>' sequence
    # this requires), terminated by ' .' somewhere in the head.
    if b" ." in head and (
        _NT_LINE.match(head) or head.startswith(b"_:")
    ):
        return "ntriples"
    if head.startswith(b"<"):  # unknown XML dialect
        return "rdfxml"
    return "unknown"


class _Out:
    """Column-wise row accumulator for EXTRACT_SCHEMA."""

    __slots__ = ("cols",)

    def __init__(self) -> None:
        self.cols = {name: [] for name in EXTRACT_SCHEMA.names}

    def add(
        self, subj, pred, obj, obj_is_iri, obj_lang, obj_datatype,
        graph, src_url, score=1.0, text="", kind="",
    ) -> None:
        c = self.cols
        c["subj"].append(subj)
        c["pred"].append(pred)
        c["obj"].append(obj)
        c["obj_is_iri"].append(obj_is_iri)
        c["obj_lang"].append(obj_lang)
        c["obj_datatype"].append(obj_datatype)
        c["graph"].append(graph)
        c["src_url"].append(src_url)
        c["score"].append(score)
        c["text"].append(text)
        c["kind"].append(kind)

    def table(self) -> pa.Table:
        return pa.Table.from_arrays(
            [
                pa.array(self.cols[f.name], type=f.type)
                for f in EXTRACT_SCHEMA
            ],
            schema=EXTRACT_SCHEMA,
        )


def _extract_one(out: _Out, url: str, payload: bytes) -> None:
    kind = ""
    try:
        if isinstance(payload, str):
            # corpora with a utf-8 string html column (vs the canonical
            # binary) are a supported shape, not a poison row
            payload = payload.encode("utf-8")
        kind = sniff_kind(payload)
        if kind == "rdfxml":
            for s, p, o, iri in extract_rdfxml_triples(payload):
                out.add(s, p, o, iri, "", "", "", url, kind=kind)
        elif kind == "turtle":
            text = payload.decode("utf-8", errors="replace")
            # the page url is the document IRI: base-less documents with
            # relative IRIs resolve like the reference's N3.js documentIRI
            parsed, prefixes = parse_turtle(text, base_iri=url)
            for s, p, o, iri, lang, dt in parsed:
                out.add(s, p, o, iri, lang, dt, "", url, kind=kind)
            for pfx, iri in prefixes.items():
                out.add(pfx, PRED_PREFIX, iri, True, "", "", "", url,
                        score=0.0, kind=kind)
        elif kind == "ntriples":
            text = payload.decode("utf-8", errors="replace")
            for s, p, o, iri, lang, dt, g in parse_nquads(text):
                out.add(s, p, o, iri, lang, dt, g, url, kind=kind)
        elif kind == "json":
            for s, p, o, iri, lang, dt in map_json_text(payload):
                out.add(s, p, o, iri, lang, dt, "", url, kind=kind)
            # json fixture pages are HTML-wrapped: also emit the text row
            text, anchors = extract_text_and_anchors(payload)
            out.add(url, PRED_TEXT, "", False, "", "", "", url,
                    text=text, kind=kind)
            for href, anchor_text in anchors:
                out.add(url, PRED_LINKS_TO, normalize_iri(href), True, "",
                        "", "", url, kind=kind)
        elif kind == "html":
            text, anchors = extract_text_and_anchors(payload)
            # the per-url byte-identical extracted-text artifact
            out.add(url, PRED_TEXT, "", False, "", "", "", url,
                    text=text, kind=kind)
            for href, anchor_text in anchors:
                out.add(url, PRED_LINKS_TO, normalize_iri(href), True, "",
                        "", "", url, kind=kind)
                if anchor_text:
                    # anchor text is a high-precision candidate mention
                    out.add(url, PRED_MENTION, anchor_text, False, "", "",
                            "", url, score=0.0, kind=kind)
        else:
            out.add(url, PRED_QUARANTINE, "unsupported format", False, "",
                    "", "", url, score=0.0, kind=kind)
    except Exception as e:  # noqa: BLE001 — poison rows quarantine, never
        # kill the task: at 10^12 documents ANY parser defect on a single
        # malformed payload must degrade to a quarantine row (the typed
        # errors — RdfXmlParseError/TurtleParseError/ValueError — are the
        # expected cases; the broad catch is last-line defense).
        out.add(url, PRED_QUARANTINE, f"{type(e).__name__}: {e}", False,
                "", "", "", url, score=0.0, kind=kind)


def extract_pages_batch(batch: pa.Table) -> pa.Table:
    """Stateless map_batches body: pages batch → EXTRACT_SCHEMA batch."""
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    out = _Out()
    for url, payload in zip(urls, htmls):
        if payload is None:
            continue
        _extract_one(out, url, payload)
    return out.table()
