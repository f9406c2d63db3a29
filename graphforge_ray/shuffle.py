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

__all__ = ["bucket_tag", "kv_join", "bucket_groupby_min", "dedup_pairs"]

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
