"""Distributed order statistics: exact per-group discrete quantiles.

``group_quantiles`` computes exact ``percentile_disc`` values per group
over a discrete/bounded-cardinality column (lengths, token counts,
scores rounded to fixed precision — the shape of every corpus-stats
column) without ever sorting the corpus: a map-side (group, value)
count combiner collapses rows to the value histogram, one bucket
shuffle co-locates each group's histogram, and a vectorized
cumsum+searchsorted per group picks the order statistics. The shuffle
moves one row per (batch, group, distinct value) — the counting-sort
shape, not the corpus.

For genuinely continuous high-cardinality columns, quantize first
(``round(col, k)`` bounds distinct values and the error) — documented
seam; a t-digest sketch would slot into the same combiner/reduce shape.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag

__all__ = ["group_quantiles"]


def group_quantiles(
    ds: "ray.data.Dataset",
    key: str,
    col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9),
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (key, q_pct:int64, value) — exact ``percentile_disc``
    per group: the value at 1-based rank ``ceil(q·n)`` of the group's
    sorted multiset (SQL ``quantile_disc`` / ``percentile_disc``
    semantics; null values are excluded). ``q_pct`` is the percentile
    as an integer (0.25 → 25) so the output hashes stably."""
    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"quantiles must be in (0, 1]: {qs}")
    q_list = sorted(qs)

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df[[key, col]]
            .dropna()
            .groupby([key, col], as_index=False)
            .size()
            .rename(columns={"size": "n"})
        )
        g["n"] = g["n"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, key, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized pass per group inside the bucket
        hist = g.groupby([key, col], as_index=False)["n"].sum()
        out_rows = []
        for k, grp in hist.groupby(key, sort=False):
            grp = grp.sort_values(col)
            counts = grp["n"].to_numpy()
            values = grp[col].to_numpy()
            cum = np.cumsum(counts)
            n = int(cum[-1])
            ranks = np.array([math.ceil(q * n) for q in q_list])
            idx = np.searchsorted(cum, ranks, side="left")
            out_rows.append(
                pd.DataFrame(
                    {
                        key: k,
                        "q_pct": (np.asarray(q_list) * 100).round()
                        .astype(np.int64),
                        "value": values[idx],
                    }
                )
            )
        if not out_rows:
            return pd.DataFrame({key: [], "q_pct": [], "value": []})
        return pd.concat(out_rows, ignore_index=True)

    return (
        ds.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )
