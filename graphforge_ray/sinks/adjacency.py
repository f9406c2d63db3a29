"""Adjacency-Parquet graph materialization.

The durable graph artifact: triples partitioned by ``hash(subj) % P`` so
(a) all edges of one subject land in one partition (adjacency locality for
downstream graph queries), (b) output is resumable — each partition is an
independent directory a restarted run can skip, and (c) partition count P is
fixed and independent of input size, the unit of parallelism for readers.

Reference analog: the per-project ``quads.nq`` canonical artifact
(/root/reference/docs/scripts/document.js:145-206), generalized from one
file per project to hash partitions with a manifest.
"""

from __future__ import annotations

import pandas as pd

__all__ = ["add_subj_partition", "write_adjacency"]

_HASH_KEY = "graphforge-part-0"[:16].ljust(16, "0")


def add_subj_partition(df: pd.DataFrame, num_partitions: int) -> pd.DataFrame:
    df = df.copy()
    df["part"] = (
        pd.util.hash_array(df["subj"].to_numpy(dtype=object), hash_key=_HASH_KEY)
        % num_partitions
    ).astype("int32")
    return df


def write_adjacency(ds, out_dir: str, num_partitions: int = 64) -> dict:
    """Write triples as hive-partitioned parquet ``part=<k>/`` dirs."""
    keyed = ds.map_batches(
        lambda df: add_subj_partition(df, num_partitions),
        batch_format="pandas",
    )
    keyed.write_parquet(out_dir, partition_cols=["part"])
    return {"num_partitions": num_partitions}
