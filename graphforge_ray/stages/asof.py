"""Distributed temporal joins Ray Data lacks: as-of and interval joins.

``asof_join(left, right, by=key, on=ts)`` attaches, to every left row,
the single most recent right row with ``right.on <= left.on`` for the
same ``by`` key (``direction='backward'``; ``'forward'`` mirrors with
``>=``) — LEFT OUTER: unmatched left rows keep typed nulls. The classic
"state at event time" join (latest config/click/price before each
event), inexpressible as an equi-join.

``interval_join(points, intervals, by=key, on=ts, start=, end=)``
attaches each point to the interval containing it (``start <= on <=
end``) for the same key. Intervals must be NON-OVERLAPPING per key —
the dominant real case (session windows, SCD-2 dimension validity
ranges) — which makes the kernel a single vectorized ``merge_asof`` on
the interval start plus an end-containment mask; overlap is DETECTED
and raised, never silently mis-joined.

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

__all__ = ["asof_join", "interval_join", "interval_coalesce"]


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


class _Sides:
    """Normalized two-sided shuffle plan: renamed right columns, union
    schema, and per-column typed-null fills."""

    def __init__(self, left, right, by, required_right, suffix):
        lschema = left.schema()
        rschema = right.schema()
        self.by = by
        self.lcols = list(lschema.names)
        rcols_in = list(rschema.names)
        if by not in self.lcols or by not in rcols_in:
            raise ValueError(f"by column {by!r} missing from a side")
        for c in required_right:
            if c not in rcols_in:
                raise ValueError(f"column {c!r} missing from the right side")
        self.ren = {c: (c if c == by else c + suffix) for c in rcols_in}
        clash = set(self.ren.values()) & set(self.lcols) - {by}
        if clash:
            raise ValueError(
                f"suffixed right columns collide: {sorted(clash)}"
            )
        self.rcols = [self.ren[c] for c in rcols_in]
        self.all_cols = self.lcols + [c for c in self.rcols if c != by]
        ltypes = dict(zip(lschema.names, lschema.types))
        rtypes = dict(zip(rschema.names, rschema.types))
        self.fill: dict[str, tuple] = {}
        for c in self.lcols:
            self.fill[c] = _null_fill_dtype(ltypes[c])
        for orig, c in self.ren.items():
            self.fill.setdefault(c, _null_fill_dtype(rtypes[orig]))

    def union(self, left, right, num_buckets):
        fill, all_cols, by = self.fill, self.all_cols, self.by

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

        return left.map_batches(norm(0, None), batch_format="pandas").union(
            right.map_batches(norm(1, self.ren), batch_format="pandas")
        )

    def left_with_nulls(self, l: pd.DataFrame) -> pd.DataFrame:
        """Left rows + typed-null right columns (the empty-right bucket
        path — an object-NaN reindex would flip block dtypes)."""
        l = l.copy()
        for c in self.all_cols:
            if c not in l.columns:
                dtype, na = self.fill[c]
                l[c] = pd.Series(na, index=l.index, dtype=dtype)
        return l[self.all_cols]


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
    if on not in left.schema().names:
        raise ValueError(f"on column {on!r} missing from the left side")
    s = _Sides(left, right, by, required_right=[on], suffix=suffix)
    on_r = s.ren[on]
    lcols, rcols, all_cols = s.lcols, s.rcols, s.all_cols

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, lcols]
        r = g.loc[g["_side"] == 1, rcols]
        if l.empty:
            return l
        if r.empty:
            return s.left_with_nulls(l)
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(
            [on_r] + [c for c in rcols if c != on_r], kind="mergesort"
        )
        out = pd.merge_asof(
            l, r, left_on=on, right_on=on_r, by=by, direction=direction
        )
        return out[all_cols]

    return (
        s.union(left, right, num_buckets)
        .groupby("_bucket")
        .map_groups(bucket_merge, batch_format="pandas")
    )


def interval_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    by: str,
    on: str = "ts",
    start: str = "start",
    end: str = "end",
    how: str = "inner",
    suffix: str = "_r",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Range join of points into CONTAINING intervals (``start <= on <=
    end``, same ``by`` key) → point columns + suffixed interval columns.
    ``how`` is 'inner' (drop uncontained points) or 'left_outer' (keep
    them with typed nulls).

    Intervals must be non-overlapping per key (session windows, SCD-2
    validity ranges): each point then matches AT MOST ONE interval, and
    the kernel is one vectorized merge_asof on the interval start plus
    an end-containment mask. Overlapping intervals in a bucket raise
    ValueError — a silent first-match would be wrong for half the rows."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"how must be inner/left_outer: {how!r}")
    if on not in points.schema().names:
        raise ValueError(f"on column {on!r} missing from the points side")
    s = _Sides(points, intervals, by, required_right=[start, end],
               suffix=suffix)
    start_r, end_r = s.ren[start], s.ren[end]
    lcols, rcols, all_cols = s.lcols, s.rcols, s.all_cols

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, lcols]
        r = g.loc[g["_side"] == 1, rcols]
        if l.empty:
            return l
        if r.empty:
            return s.left_with_nulls(l) if how == "left_outer" else l.iloc[:0]
        r = r.sort_values([by, start_r], kind="mergesort")
        same_key = r[by].to_numpy()[1:] == r[by].to_numpy()[:-1]
        overlap = same_key & (
            r[start_r].to_numpy()[1:] <= r[end_r].to_numpy()[:-1]
        )
        if overlap.any():
            raise ValueError(
                "interval_join: overlapping intervals for key(s) "
                f"{sorted(set(r[by].to_numpy()[1:][overlap]))[:5]} — "
                "non-overlapping intervals per key are required"
            )
        l = l.sort_values(on, kind="mergesort")
        r = r.sort_values(start_r, kind="mergesort")
        out = pd.merge_asof(
            l, r, left_on=on, right_on=start_r, by=by,
            direction="backward",
        )
        contained = out[end_r].notna() & (out[on] <= out[end_r])
        if how == "inner":
            return out.loc[contained, all_cols]
        # left_outer: null out the interval columns of uncontained rows
        out = out.copy()
        miss = ~contained
        for c in rcols:
            if c != by:
                dtype, na = s.fill[c]
                col = out[c].astype(dtype)
                col[miss.to_numpy()] = na
                out[c] = col
        return out[all_cols]

    return (
        s.union(points, intervals, num_buckets)
        .groupby("_bucket")
        .map_groups(bucket_merge, batch_format="pandas")
    )


def interval_coalesce(
    intervals: "ray.data.Dataset",
    key: str,
    start_col: str = "start_us",
    end_col: str = "end_us",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Merge overlapping/touching intervals per key → (key, start, end),
    the temporal-KG valid-time normalization (and the sessionize-by-
    interval primitive): intervals [s, e] with s ≤ running-max(e) of
    their predecessors coalesce into one island. Touching intervals
    (next.start == prev.end) MERGE — half-open semantics; callers
    wanting strict overlap subtract 1 from end first.

    One key-bucket shuffle; per bucket a vectorized sort +
    gaps-and-islands (cummax — no per-key loop). SQL-replayable with
    the classic MAX(end) OVER (... ROWS UNBOUNDED PRECEDING) island
    trick."""
    def tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key, start_col, end_col]].copy()
        return out.assign(_bucket=bucket_tag(out, key, num_buckets))

    def coalesce(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([key, start_col, end_col], kind="stable")
        # per-key running max of end (pandas cython grouped cummax —
        # vectorized across ALL keys in the bucket, no per-key loop)
        cmax = g.groupby(key, sort=False)[end_col].cummax().to_numpy()
        s = g[start_col].to_numpy()
        keys = g[key].to_numpy()
        island = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            same_key = keys[1:] == keys[:-1]
            island[1:] = ~same_key | (s[1:] > cmax[:-1])
        iid = np.cumsum(island)
        out = pd.DataFrame(
            {key: keys, "_iid": iid,
             start_col: s, end_col: g[end_col].to_numpy()}
        ).groupby([key, "_iid"], as_index=False).agg(
            **{start_col: (start_col, "min"), end_col: (end_col, "max")}
        )
        return out.drop(columns=["_iid"])

    return (
        intervals.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(coalesce, batch_format="pandas")
    )
