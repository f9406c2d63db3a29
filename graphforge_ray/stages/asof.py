"""Distributed as-of (temporal) join — an operator Ray Data lacks.

``asof_join(left, right, by=key, on=ts)`` attaches, to every left row,
the single most recent right row with ``right.on <= left.on`` for the
same ``by`` key (``direction='backward'``; ``'forward'`` mirrors with
``>=``) — LEFT OUTER: unmatched left rows keep typed nulls. The classic
"state at event time" join (latest config/click/price before each
event), inexpressible as an equi-join.

Scale shape — ONE tag-union-bucket shuffle on ``hash(by)`` (the same
acero-safe pattern as ``shuffle.bindings_join``) and one vectorized
``pandas.merge_asof`` per bucket: all rows of a key meet in one bucket,
sides sorted once per bucket, no per-row Python. Skew note: a hot key
lands in one bucket; if one entity dominates the stream, pre-split it
by time range upstream (each split must carry the right-side rows
overlapping its window).

Unlike the SPARQL bindings join (string columns everywhere), the sides
here carry numeric/timestamp columns, so the side-normalization fills
missing columns with TYPED nulls derived from the owning side's Arrow
schema — an object-NaN fill would give the union mixed per-column block
dtypes and break the Arrow conversion inside the sort shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..shuffle import bucket_tag

__all__ = ["asof_join"]


def _null_fill_dtype(pa_type):
    """(pandas dtype, null value) that round-trips to ``pa_type``.
    Ray's Schema.types holds numpy dtypes for pandas-backed blocks —
    normalize those to Arrow first (object → plain object fill)."""
    if not isinstance(pa_type, pa.DataType):
        try:
            pa_type = pa.from_numpy_dtype(np.dtype(pa_type))
        except (TypeError, pa.ArrowNotImplementedError):
            return object, None
    if pa.types.is_integer(pa_type):
        return "Int64", pd.NA  # nullable int → arrow int64, not float
    if pa.types.is_floating(pa_type):
        return "float64", np.nan
    if pa.types.is_timestamp(pa_type):
        return f"datetime64[{pa_type.unit}]", pd.NaT
    if pa.types.is_boolean(pa_type):
        return "boolean", pd.NA
    return object, None


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    by: str,
    on: str = "ts",
    direction: str = "backward",
    suffix: str = "_r",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """As-of join → Dataset with all left columns plus the matched right
    row's columns (non-``by`` right columns suffixed, including its
    ``on`` time). ``by``/``on`` values must be non-null on both sides.

    Ties on the right (same key, same time): deterministic — the right
    side is sorted by ALL its columns before the merge, and the LAST
    among equal times wins (``merge_asof`` semantics); dedupe the right
    side first if ties are possible and a specific winner is required
    (the SQL oracle contract does exactly that)."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward: {direction!r}")
    lschema = left.schema()
    rschema = right.schema()
    lcols = list(lschema.names)
    rcols_in = list(rschema.names)
    if by not in lcols or by not in rcols_in:
        raise ValueError(f"by column {by!r} missing from a side")
    if on not in lcols or on not in rcols_in:
        raise ValueError(f"on column {on!r} missing from a side")

    # right columns (except the by key) get the suffix — including its
    # time column, which callers usually want in the output
    ren = {c: (c if c == by else c + suffix) for c in rcols_in}
    clash = set(ren.values()) & set(lcols) - {by}
    if clash:
        raise ValueError(f"suffixed right columns collide: {sorted(clash)}")
    rcols = [ren[c] for c in rcols_in]
    on_r = ren[on]

    all_cols = lcols + [c for c in rcols if c != by]
    ltypes = dict(zip(lschema.names, lschema.types))
    rtypes = dict(zip(rschema.names, rschema.types))
    fill: dict[str, tuple] = {}
    for c in lcols:
        fill[c] = _null_fill_dtype(ltypes[c])
    for orig, c in ren.items():
        fill.setdefault(c, _null_fill_dtype(rtypes[orig]))

    def norm(side: int, rename: dict | None):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if rename:
                df = df.rename(columns=rename)
            df = df.copy()
            for c in all_cols:
                if c not in df.columns:
                    dtype, na = fill[c]
                    df[c] = pd.Series(na, index=df.index, dtype=dtype)
            out = df[all_cols]
            return out.assign(
                _side=np.int8(side),
                _bucket=bucket_tag(out, by, num_buckets),
            )

        return fn

    both = left.map_batches(norm(0, None), batch_format="pandas").union(
        right.map_batches(norm(1, ren), batch_format="pandas")
    )

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, lcols]
        r = g.loc[g["_side"] == 1, rcols]
        if l.empty:
            return l
        if r.empty:
            l = l.copy()
            for c in all_cols:  # typed nulls — object-NaN reindex would
                if c not in l.columns:  # flip block dtypes downstream
                    dtype, na = fill[c]
                    l[c] = pd.Series(na, index=l.index, dtype=dtype)
            return l[all_cols]
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(
            [on_r] + [c for c in rcols if c != on_r], kind="mergesort"
        )
        out = pd.merge_asof(
            l, r, left_on=on, right_on=on_r, by=by, direction=direction
        )
        return out[all_cols]

    return (
        both.groupby("_bucket")
        .map_groups(bucket_merge, batch_format="pandas")
    )
