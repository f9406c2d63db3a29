"""Shared distributed-shuffle primitives (bucketed groupby building
blocks).

Everything here follows the same measured-on-this-host design rules
(CLAUDE.md): per-key Ray aggregates reduce row-by-row in Python and lose
~16× to a coarse hash-bucket groupby with ONE vectorized pandas kernel per
bucket; and Ray's acero-based ``Dataset.join`` emits zero-column blocks
for empty partitions, which pass through ``map_batches`` uncalled and
crash any downstream acero join — so iterative algorithms use the
union-tag-bucket-merge join form instead.

All hashing uses fixed-key ``pandas.util.hash_array`` /
``hash_pandas_object`` — deterministic across worker processes (Python's
builtin ``hash`` is per-process salted and must never key a shuffle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data

__all__ = [
    "bucket_tag",
    "kv_join",
    "bindings_join",
    "bucket_groupby_min",
    "dedup_pairs",
    "snap_lineage",
]


def snap_lineage(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Materialize ``ds`` and return a FRESH dataset over the same block
    refs, with no logical-plan history.

    Iterative algorithms that feed a round's output back into the next
    round's plan (``state = f(state).materialize()``) re-execute the
    ENTIRE accumulated plan each round on Ray 2.49 — measured on this
    host: per-round wall time DOUBLES from ~round 8 (0.2 s → 29 s by
    round 13 on a 30-row toy), because ``materialize()`` keeps the
    logical plan and ``union``-ing the result back in replays it.
    Rebasing on ``from_arrow_refs(to_arrow_refs())`` cuts the plan to an
    ``InputData`` of the already-computed blocks: flat 0.25 s/round
    through 24+ rounds on the same toy.

    Driver cost is O(num_blocks) object refs + per-block metadata
    fetches — never block contents. Arrow-format blocks pass through
    zero-copy; pandas-format blocks are converted by remote tasks.
    """
    m = ds.materialize()
    return ray.data.from_arrow_refs(m.to_arrow_refs())

# fixed 16-byte key → deterministic across worker processes
HASH_KEY = "graphforge-pairs"[:16].ljust(16, "0")


def bucket_tag(df: pd.DataFrame, key: str, num_buckets: int) -> pd.Series:
    """Deterministic coarse bucket id for ``df[key]`` (int32)."""
    arr = (
        df[key].to_numpy(dtype=object)
        if df[key].dtype == object
        else df[key].to_numpy()
    )
    return (pd.util.hash_array(arr, hash_key=HASH_KEY) % num_buckets).astype(
        "int32"
    )


def pair_bucket_tag(
    df: pd.DataFrame, cols: list[str], num_buckets: int
) -> pd.Series:
    """Deterministic bucket id over a COMPOSITE key (row hash of cols)."""
    h = pd.util.hash_pandas_object(df[cols], index=False, hash_key=HASH_KEY)
    return (h % num_buckets).astype("int32")


def kv_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed inner hash join of two (k, v) Datasets (identical
    dtypes) on ``k`` → Dataset (node=v_left, label=v_right). One groupby
    shuffle: tag each side, union (schemas identical by construction),
    bucket on a deterministic key hash, vectorized pandas merge per
    bucket."""

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(
                _side=np.int8(side),
                _bucket=bucket_tag(df, "k", num_buckets),
            )

        return fn

    both = left.map_batches(tag(0), batch_format="pandas").union(
        right.map_batches(tag(1), batch_format="pandas")
    )

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, ["k", "v"]].rename(columns={"v": "node"})
        r = g.loc[g["_side"] == 1, ["k", "v"]].rename(columns={"v": "label"})
        out = l.merge(r, on="k", how="inner")
        return out[["node", "label"]]

    return both.groupby("_bucket").map_groups(
        bucket_merge, batch_format="pandas"
    )


def np_key_dtype(ds: "ray.data.Dataset", col: str):
    """The numpy dtype to RESTORE a key column to after a
    ``bindings_join`` (whose side-normalization widens keys to object;
    ``hash_pandas_object(object-int) != hash(int64)`` for equal values,
    so any post-join bucket/join on the key MUST see the restored
    dtype). One shared rule — callers (lm, classify, resolve, …) must
    not re-derive it."""
    import pyarrow as pa

    t = dict(zip(ds.schema().names, ds.schema().types))[col]
    if isinstance(t, pa.DataType):
        if pa.types.is_integer(t):
            return "int64"
        if pa.types.is_floating(t):
            return "float64"
        return object
    return np.dtype(t) if t != object else object


def bindings_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    how: str = "inner",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """General distributed hash join on arbitrary key columns via the
    bucketed-groupby shuffle (``kv_join`` generalized to any schema).

    Why not ``Dataset.join``: Ray's acero join dies with 'No match for
    FieldRef' when an upstream empty block skipped its ``map_batches``
    UDF and kept a stale schema (measured — see CLAUDE.md); the
    sort-based groupby shuffle tolerates those blocks, so this is the
    robust primitive for SPARQL bindings joins, whose filtered pattern
    matches routinely leave empty blocks.

    Shape: tag each side, normalize both to the union of their columns
    (missing → NaN) so the union has ONE schema, bucket on the composite
    key hash, and run one vectorized pandas merge per bucket. ``how`` is
    'inner', 'left_outer', 'full_outer' (rows from BOTH sides survive,
    the key column comes from whichever side has it), 'semi' (keep left
    rows WITH a right match — left columns only), or 'anti' (keep left
    rows WITHOUT a match).
    Non-key column overlap between the sides is not supported (callers
    join on ALL shared variables).

    Dtype caveat: the side-normalization fills missing columns with
    OBJECT-dtype NaN, so output dtypes can widen (int64 → object/float)
    whenever a side lacked a column. Harmless for string bindings
    (SPARQL), but numeric callers that feed the result into ANOTHER
    hash-bucketed shuffle must cast back first — pandas
    ``hash_array(object)`` != ``hash_array(int64)`` for equal values,
    which would silently split equal keys across buckets (measured:
    triangle wedge-close semi-join returned 1/4 matches)."""
    on = list(on)
    if how not in ("inner", "left_outer", "full_outer", "semi", "anti"):
        raise ValueError(f"unsupported join how: {how!r}")
    lcols = list(left.schema().names)
    rcols = list(right.schema().names)
    overlap = (set(lcols) & set(rcols)) - set(on)
    if overlap:
        raise ValueError(
            f"non-key columns {sorted(overlap)} exist on both join sides"
        )
    if how in ("semi", "anti"):
        all_cols = lcols  # right side contributes only its key presence
    else:
        all_cols = lcols + [c for c in rcols if c not in lcols]

    def norm(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            for c in all_cols:
                if c not in df.columns:
                    # object dtype, not float64 NaN: keeps the block
                    # schema stable (bindings columns are strings)
                    df[c] = pd.Series(np.nan, index=df.index, dtype=object)
            out = df[all_cols]
            return out.assign(
                _side=np.int8(side),
                _bucket=pair_bucket_tag(out, on, num_buckets),
            )

        return fn

    both = left.map_batches(norm(0), batch_format="pandas").union(
        right.map_batches(norm(1), batch_format="pandas")
    )
    out_cols = list(all_cols)

    def bucket_merge(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, lcols]
        if how in ("semi", "anti"):
            keys = g.loc[g["_side"] == 1, on].drop_duplicates()
            merged = l.merge(keys, on=on, how="left", indicator=True)
            keep = merged["_merge"] == ("both" if how == "semi"
                                        else "left_only")
            return merged.loc[keep, lcols]
        r = g.loc[g["_side"] == 1, rcols]
        pd_how = {"inner": "inner", "left_outer": "left",
                  "full_outer": "outer"}[how]
        merged = l.merge(r, on=on, how=pd_how)
        for c in out_cols:
            if c not in merged.columns:
                merged[c] = pd.Series(np.nan, index=merged.index,
                                      dtype=object)
        return merged[out_cols]

    return both.groupby("_bucket").map_groups(
        bucket_merge, batch_format="pandas"
    )


def bucket_groupby_min(
    ds: "ray.data.Dataset",
    key: str,
    val: str,
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """groupby(key).min(val) as a map-side combiner + coarse-bucket
    shuffle with ONE vectorized pandas groupby per bucket."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(key, as_index=False)[val].min()
        return g.assign(_bucket=bucket_tag(g, key, num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(key, as_index=False)[val].min()

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def dedup_pairs(
    pairs: "ray.data.Dataset",
    cols: tuple[str, str] = ("id_a", "id_b"),
    num_buckets: int = 64,
) -> "ray.data.Dataset":
    """Distributed exact dedup of a pair Dataset: within-batch
    drop_duplicates (combiner) → coarse composite-key bucket → one
    vectorized drop_duplicates per bucket. Never lands on the driver."""
    cols = list(cols)

    def keyed(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(cols)
        return df.assign(_bucket=pair_bucket_tag(df, cols, num_buckets))

    def bucket_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(cols).drop(columns=["_bucket"])

    return (
        pairs.map_batches(keyed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_dedup, batch_format="pandas")
    )
