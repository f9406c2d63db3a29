"""JSONL (newline-delimited JSON) source + sink.

The other web-corpus staple next to WARC/parquet: crawl dumps,
OpenWebText-style corpora and eval sets ship as ``.jsonl`` — one JSON
object per line. The reader streams `ray.data.read_text` lines through
a map-side parse (``json.loads`` is one C call per record — records are
inherently per-row); the schema is DECLARED by the caller (``fields``),
not sniffed, so blocks keep one stable Arrow schema regardless of which
keys each line happens to carry. Missing keys → typed nulls; malformed
lines are counted in metrics ``jsonl.bad_lines`` and dropped (poison
never crashes the job) unless ``strict=True``.

The sink writes one ``part-<block>.jsonl`` file per block (same atomic
per-block discipline as the N-Triples sink): ``json.dumps`` with sorted
keys and no NaN literals, so output is valid strict JSONL.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

__all__ = ["read_jsonl", "write_jsonl"]

_CASTS = {
    "int64": "Int64",     # nullable int — missing keys stay null
    "float64": "float64",
    "bool": "boolean",
    "str": "object",
}


def read_jsonl(
    paths: str | list[str],
    fields: dict[str, str],
    strict: bool = False,
) -> "ray.data.Dataset":
    """→ Dataset with exactly ``fields`` columns (name → one of
    'int64' / 'float64' / 'bool' / 'str'). Keys beyond ``fields`` are
    ignored; missing keys are null."""
    import ray.data as rd

    bad = sorted(set(fields.values()) - set(_CASTS))
    if bad:
        raise ValueError(
            f"unsupported field types {bad}; pick from {sorted(_CASTS)}"
        )
    spec = tuple(sorted(fields.items()))

    def parse(df: pd.DataFrame) -> pd.DataFrame:
        rows, n_bad = [], 0
        for line in df["text"]:
            if not line or line.isspace():
                continue
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not a JSON object")
            except ValueError as e:
                if strict:
                    raise ValueError(
                        f"bad JSONL line: {line[:80]!r}"
                    ) from e
                n_bad += 1
                continue
            rows.append(tuple(obj.get(k) for k, _ in spec))
        if n_bad:
            from .. import metrics

            metrics.incr("jsonl.bad_lines", n_bad)
        out = pd.DataFrame(
            rows, columns=[k for k, _ in spec]
        ) if rows else pd.DataFrame(
            {k: pd.Series(dtype=object) for k, _ in spec}
        )
        for k, t in spec:
            out[k] = out[k].astype(_CASTS[t])
        return out

    return rd.read_text(paths).map_batches(parse, batch_format="pandas")


def write_jsonl(
    ds: "ray.data.Dataset",
    out_dir: str,
) -> dict:
    """Write one ``part-{i:05d}.jsonl`` per block (atomic rename per
    file; resumable layout). → {'files': n, 'rows': n} accounting."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"rows": pd.Series(dtype="int64")})
        import uuid

        name = f"part-{uuid.uuid4().hex[:12]}.jsonl"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        def jsonable(v):
            if v is None:
                return None
            try:
                if pd.isna(v):
                    return None
            except (TypeError, ValueError):
                pass
            if isinstance(v, np.generic):
                return v.item()
            return v

        recs = df.to_dict(orient="records")
        with open(tmp, "w", encoding="utf-8") as f:
            for r in recs:
                clean = {k: jsonable(v) for k, v in r.items()}
                f.write(json.dumps(clean, sort_keys=True,
                                   allow_nan=False))
                f.write("\n")
        os.replace(tmp, os.path.join(out_dir, name))
        return pd.DataFrame({"rows": [np.int64(len(df))]})

    parts = ds.map_batches(write_block, batch_format="pandas").to_pandas()
    return {
        "files": int(len(parts)),
        "rows": int(parts["rows"].sum()) if len(parts) else 0,
    }
