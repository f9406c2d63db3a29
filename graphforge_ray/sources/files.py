"""File-based sources.

* ``read_source_documents`` — the reference's project-folder scan
  (``showEntireDirectory`` /root/reference/docs/scripts/document.js:285-328
  + extension dispatch at :666): a directory of ``.ttl/.owl/.rdf`` files →
  a pages-shaped Dataset (url = file path, html = raw bytes) that feeds the
  same extract stage. File discovery is Ray-native
  (``read_binary_files(include_paths=True)``) so listing and reading
  parallelize across the cluster.
* ``read_ntriples`` — the reference's N-Quads loader (``loadQuadsToStore``
  document.js:824-868): ``read_text`` → per-batch N-Quads parse → triples
  rows. "Reset store" ≡ a fresh Dataset per call.
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd

from ..extract.ntriples import parse_nquads_line
from ..schemas import TRIPLES_SCHEMA

__all__ = ["read_source_documents", "read_ntriples", "SUPPORTED_EXTENSIONS"]

SUPPORTED_EXTENSIONS = ("ttl", "owl", "rdf", "nt", "nq", "html", "json")


def read_source_documents(
    paths: str | list[str],
    extensions: tuple[str, ...] = SUPPORTED_EXTENSIONS,
) -> "rd.Dataset":
    """Directory/file paths → pages-shaped Dataset (url, warc_ts, html,
    text, lang). Unsupported extensions are skipped at discovery (the
    reference rejects them at dispatch, document.js:673-676; our extract
    stage additionally quarantines content-level failures)."""
    ds = rd.read_binary_files(
        paths,
        include_paths=True,
        file_extensions=list(extensions),
    )

    def to_pages(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.Table.from_arrays(
            [
                batch["path"].cast(pa.string()),
                pa.array([0] * n, pa.timestamp("us")),
                batch["bytes"].cast(pa.binary()),
                pa.array([""] * n, pa.string()),
                pa.array([""] * n, pa.string()),
            ],
            names=["url", "warc_ts", "html", "text", "lang"],
        )

    return ds.map_batches(to_pages, batch_format="pyarrow")


def read_ntriples(paths: str | list[str]) -> "rd.Dataset":
    """N-Triples/N-Quads text files → triples Dataset (TRIPLES_SCHEMA).
    Malformed lines raise — quads.nq artifacts are engine-written; for
    untrusted input route through the extract stage instead."""
    lines = rd.read_text(paths)

    def parse(batch: pa.Table) -> pa.Table:
        rows = []
        for line in batch["text"].to_pylist():
            parsed = parse_nquads_line(line)
            if parsed is not None:
                s, p, o, iri, lang, dt, g = parsed
                rows.append((s, p, o, iri, lang, dt, g, ""))
        if not rows:
            return TRIPLES_SCHEMA.empty_table()
        cols = list(zip(*rows))
        return pa.Table.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, TRIPLES_SCHEMA)],
            schema=TRIPLES_SCHEMA,
        )

    return lines.map_batches(parse, batch_format="pyarrow")
