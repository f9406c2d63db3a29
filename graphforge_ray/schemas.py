"""Arrow schemas for the engine's core tables.

Pages table shape is authoritative from BASELINE.json ``input_hint``:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Triples table generalizes the reference's quad record (an ``N3.Store`` quad,
reference: /root/reference/docs/scripts/document.js:736-740) with explicit
term-kind columns plus ``src_url`` lineage (the reference keeps lineage
implicitly via per-project folders).
"""

from __future__ import annotations

import pyarrow as pa

# Primary input: Common-Crawl-style web pages.
PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# One row per emitted triple. ``graph`` is "" for the default graph (the
# reference only ever uses the default graph: document.js:736-740 adds
# 3-term quads). ``obj_lang`` / ``obj_datatype`` are "" when absent.
TRIPLES_SCHEMA = pa.schema(
    [
        ("subj", pa.string()),
        ("pred", pa.string()),
        ("obj", pa.string()),
        ("obj_is_iri", pa.bool_()),
        ("obj_lang", pa.string()),
        ("obj_datatype", pa.string()),
        ("graph", pa.string()),
        ("src_url", pa.string()),
    ]
)

# Mention rows produced by the NER stage (before linking).
MENTIONS_SCHEMA = pa.schema(
    [
        ("src_url", pa.string()),
        ("surface", pa.string()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]
)

# Linked-entity rows produced by the linker stage.
LINKS_SCHEMA = pa.schema(
    [
        ("src_url", pa.string()),
        ("surface", pa.string()),
        ("entity_iri", pa.string()),
        ("score", pa.float64()),
    ]
)


def empty_triples_table() -> pa.Table:
    """An empty table with TRIPLES_SCHEMA (handy for no-op batches)."""
    return TRIPLES_SCHEMA.empty_table()


def triples_table(rows: list[tuple]) -> pa.Table:
    """Build a TRIPLES_SCHEMA table from
    ``(subj, pred, obj, obj_is_iri, obj_lang, obj_datatype, graph, src_url)``
    tuples."""
    if not rows:
        return empty_triples_table()
    cols = list(zip(*rows))
    arrays = [
        pa.array(cols[i], type=TRIPLES_SCHEMA.field(i).type)
        for i in range(len(TRIPLES_SCHEMA))
    ]
    return pa.Table.from_arrays(arrays, schema=TRIPLES_SCHEMA)
