"""RML/R2RML-style column-to-triple mapping.

The north star calls for "R2RML/RML-style column-to-triple mapping" applied
to tabular/JSON records. The reference's analog is its per-format triplify
dispatch (/root/reference/docs/scripts/document.js:657-698): a record →
triples function selected by input kind. A mapping spec is a list of term
maps:

    {"subject": "doc:{id}",            # template over record fields
     "predicate": "schema:name",
     "object": "{name}",               # template, or "$column" for raw value
     "object_kind": "literal"|"iri",   # default: literal unless startswith http
     "datatype": "...", "lang": "..."} # optional

Templates use ``{field}`` placeholders (str.format-style, but only simple
field substitution — no format specs). A term map whose referenced fields
are missing/None in the record emits nothing (mirrors the reference's
empty-object drop rule, document.js:733). List-valued fields fan out to one
triple per element (flat-map).

Pure function; applied per record inside ``map_batches``.
"""

from __future__ import annotations

import json
import re
from typing import Any

__all__ = ["apply_mapping", "map_json_text", "map_table",
           "DEFAULT_DOC_MAPPING"]

_FIELD = re.compile(r"\{([^{}]+)\}")


def _render(template: str, rec: dict[str, Any]) -> list[str] | None:
    """Substitute {field} placeholders. Returns None if any field missing
    or None. A single list-valued field fans out into multiple renders."""
    fields = _FIELD.findall(template)
    if not fields:
        return [template]
    list_field = None
    for f in fields:
        if f not in rec or rec[f] is None:
            return None
        if isinstance(rec[f], list):
            if list_field is not None:
                return None  # at most one fan-out field per template
            list_field = f
    if list_field is None:
        return [_FIELD.sub(lambda m: str(rec[m.group(1)]), template)]
    out = []
    for v in rec[list_field]:
        local = dict(rec)
        local[list_field] = v
        out.append(_FIELD.sub(lambda m: str(local[m.group(1)]), template))
    return out


def apply_mapping(
    rec: dict[str, Any], spec: list[dict[str, Any]]
) -> list[tuple[str, str, str, bool, str, str]]:
    """Apply a mapping spec to one record →
    ``[(subj, pred, obj, obj_is_iri, obj_lang, obj_datatype), ...]``."""
    out: list[tuple[str, str, str, bool, str, str]] = []
    for tm in spec:
        subjects = _render(tm["subject"], rec)
        objects = _render(tm["object"], rec)
        if not subjects or not objects:
            continue
        pred = tm["predicate"]
        kind = tm.get("object_kind")
        lang = tm.get("lang", "")
        dtype = tm.get("datatype", "")
        for s in subjects:
            for o in objects:
                if not o:
                    continue  # empty-object drop (document.js:733)
                if kind == "iri":
                    is_iri = True
                elif kind == "literal":
                    is_iri = False
                else:  # reference's startsWith('http') rule, document.js:739
                    is_iri = o.startswith("http")
                out.append((s, pred, o, is_iri, lang if not is_iri else "",
                            dtype if not is_iri else ""))
    return out


# Default mapping for the fixture JSON payload kind
# ({id, name, type, related:[...]}; see FIXTURES.md §1 kind 4).
DEFAULT_DOC_MAPPING: list[dict[str, Any]] = [
    {"subject": "http://graft.example/entity/{id}",
     "predicate": "http://schema.org/name", "object": "{name}",
     "object_kind": "literal"},
    {"subject": "http://graft.example/entity/{id}",
     "predicate": "rdf:type", "object": "{type}"},
    {"subject": "http://graft.example/entity/{id}",
     "predicate": "http://schema.org/relatedTo", "object": "{related}"},
]

_JSON_BLOCK = re.compile(
    r'<script[^>]*type="application/json"[^>]*>(.*?)</script>', re.S
)


def map_json_text(
    payload: bytes | str, spec: list[dict[str, Any]] | None = None
) -> list[tuple[str, str, str, bool, str, str]]:
    """Extract the JSON record (bare JSON document, or embedded in an HTML
    ``<script type="application/json">`` block) and apply the mapping."""
    if isinstance(payload, bytes):
        payload = payload.decode("utf-8", errors="replace")
    text = payload.strip()
    if not text.startswith("{") and not text.startswith("["):
        m = _JSON_BLOCK.search(payload)
        if not m:
            return []
        text = m.group(1)
    try:
        rec = json.loads(text)
    except json.JSONDecodeError:
        return []
    if isinstance(rec, list):
        recs = [r for r in rec if isinstance(r, dict)]
    elif isinstance(rec, dict):
        recs = [rec]
    else:
        return []
    spec = spec if spec is not None else DEFAULT_DOC_MAPPING
    out = []
    for r in recs:
        out.extend(apply_mapping(r, spec))
    return out


def map_table(ds, spec: list[dict[str, Any]]):
    """Tabular-to-RDF entry point (north star: "R2RML/RML-style
    column-to-triple mapping" over tabular records): apply a mapping spec
    to every ROW of a Dataset → triples Dataset
    (subj, pred, obj, obj_is_iri, obj_lang, obj_datatype).

    Stateless ``map_batches`` flat-map; the spec ships in the task
    closure (it is spec-sized, not data-sized). Row-level templating is
    per-record Python by design — templates are arbitrary; pin hot
    mappings down to vectorized column ops when a profile demands it."""
    import pandas as pd

    cols = ["subj", "pred", "obj", "obj_is_iri", "obj_lang", "obj_datatype"]

    def one_batch(df: pd.DataFrame) -> pd.DataFrame:
        rows: list[tuple] = []
        for rec in df.to_dict("records"):
            rows.extend(apply_mapping(rec, spec))
        out = pd.DataFrame(rows, columns=cols)
        return out.astype({"obj_is_iri": bool}) if len(out) else pd.DataFrame(
            {
                "subj": pd.Series(dtype=object),
                "pred": pd.Series(dtype=object),
                "obj": pd.Series(dtype=object),
                "obj_is_iri": pd.Series(dtype=bool),
                "obj_lang": pd.Series(dtype=object),
                "obj_datatype": pd.Series(dtype=object),
            }
        )

    return ds.map_batches(one_batch, batch_format="pandas")
