"""N-Triples / N-Quads / Turtle sinks.

Reference sinks: the ``quads.nq`` materializer (N3.Writer n-quads,
/root/reference/docs/scripts/document.js:145-206) plus the Turtle / N-Quads
/ N3 download serializers (test HTML/SPARQL.html:285-323,
documentQueryTest.html:796-816). Here a serializer is a vectorized
``map_batches`` body producing one formatted line per triple, and the sink
writes one ``part-*.nt`` file per output block (never one giant file) plus a
per-file line/byte count (the reference's ``totalWritten`` accounting,
document.js:202, generalized into the stage manifest).

For byte-stable output (reference files are rewritten deterministically) the
pipeline sorts by ``(subj, pred, obj)`` before serialization — sorting is
the documented stable-output contract, not an ordering guarantee of the
engine (SURVEY §2.6 O3).
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from ..extract.ntriples import format_triple_line

__all__ = ["format_ntriples_batch", "write_ntriples", "serialize_turtle"]


def format_ntriples_batch(df: pd.DataFrame) -> pd.DataFrame:
    """pandas map_batches body: triples → one N-Triples/N-Quads line each."""
    lines = [
        format_triple_line(s, p, o, bool(iri), lang or "", dt or "", g or "")
        for s, p, o, iri, lang, dt, g in zip(
            df["subj"], df["pred"], df["obj"], df["obj_is_iri"],
            df.get("obj_lang", ""), df.get("obj_datatype", ""),
            df.get("graph", ""),
        )
    ]
    return pd.DataFrame({"line": lines})


def write_ntriples(ds, out_dir: str, sort: bool = True) -> dict:
    """Write a triples Dataset as partitioned N-Triples text files.

    Returns ``{"files": n, "lines": n, "bytes": n}`` for the manifest.
    """
    os.makedirs(out_dir, exist_ok=True)
    if sort:
        ds = ds.sort(["subj", "pred", "obj"])
    lines_ds = ds.map_batches(format_ntriples_batch, batch_format="pandas")

    stats = {"files": 0, "lines": 0, "bytes": 0}
    # iterate blocks on the driver → one file per block. Block contents are
    # already pipelined/bounded; this keeps file naming dense and ordered.
    for i, batch in enumerate(
        lines_ds.iter_batches(batch_size=None, batch_format="pyarrow")
    ):
        path = os.path.join(out_dir, f"part-{i:05d}.nt")
        payload = "\n".join(batch.column("line").to_pylist())
        if payload:
            payload += "\n"
        with open(path, "w") as f:
            f.write(payload)
        stats["files"] += 1
        stats["lines"] += batch.num_rows
        stats["bytes"] += len(payload.encode())
    return stats


def serialize_turtle(table: pa.Table, prefixes: dict[str, str] | None = None) -> str:
    """Small-result Turtle serializer (reference S7 download sink). Groups
    by subject with ``;`` predicate lists; driver-side, for small graphs."""
    prefixes = prefixes or {}
    rev = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def shorten(iri: str) -> str:
        for pfx, base in rev:
            if iri.startswith(base) and len(iri) > len(base):
                local = iri[len(base):]
                if local.replace("_", "").replace("-", "").isalnum():
                    return f"{pfx}:{local}"
        return f"<{iri}>"

    def term(value, is_iri, lang="", dt=""):
        if is_iri:
            return value if value.startswith("_:") else shorten(value)
        from ..extract.ntriples import format_term

        out = format_term(value, False, lang, dt)
        return out

    df = table.to_pandas().sort_values(["subj", "pred", "obj"])
    lines = [f"@prefix {p}: <{u}> ." for p, u in sorted(prefixes.items())]
    if lines:
        lines.append("")
    for subj, group in df.groupby("subj", sort=True):
        po = [
            f"    {shorten(r.pred)} "
            f"{term(r.obj, bool(r.obj_is_iri), getattr(r, 'obj_lang', '') or '', getattr(r, 'obj_datatype', '') or '')}"
            for r in group.itertuples()
        ]
        subject = subj if subj.startswith("_:") else shorten(subj)
        lines.append(subject + "\n" + " ;\n".join(po) + " .")
    return "\n".join(lines) + "\n"
