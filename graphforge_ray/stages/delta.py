"""KG snapshot delta: set-difference of two triple Datasets.

Incremental KG maintenance needs "what changed between yesterday's
graph and today's" without re-materializing either: adds drive
downstream index updates, deletes drive retractions. ``kg_delta``
computes both directions in ONE tag-union-bucket shuffle over the
composite row hash (the same acero-safe idiom as
``shuffle.bindings_join``): each bucket holds every copy of a given
triple from both sides, so a per-bucket distinct + indicator merge is
exact. Set semantics on both sides (duplicate triples within a
snapshot collapse first, matching the store's ST1 set semantics —
reference keeps a set-valued store, document.js store.addQuad).

Scale shape: moves each distinct triple once; no driver materialization;
skew-free (row-hash buckets are uniform by construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import pair_bucket_tag

__all__ = ["kg_delta"]


def kg_delta(
    old: "ray.data.Dataset",
    new: "ray.data.Dataset",
    cols: tuple[str, str, str] = ("subj", "pred", "obj"),
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (op:str, subj, pred, obj) where op is ``'add'`` for
    triples in ``new`` but not ``old`` and ``'del'`` for triples in
    ``old`` but not ``new`` (set semantics per side). Unchanged triples
    are not emitted."""
    c = list(cols)

    def tag(side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = df[c].copy()
            out["_side"] = np.int8(side)
            out["_bucket"] = pair_bucket_tag(out, c, num_buckets)
            return out

        return fn

    both = old.map_batches(tag(0), batch_format="pandas").union(
        new.map_batches(tag(1), batch_format="pandas")
    )

    def diff_bucket(g: pd.DataFrame) -> pd.DataFrame:
        o = g.loc[g["_side"] == 0, c].drop_duplicates()
        n = g.loc[g["_side"] == 1, c].drop_duplicates()
        m = o.merge(n, on=c, how="outer", indicator=True)
        adds = m.loc[m["_merge"] == "right_only", c]
        dels = m.loc[m["_merge"] == "left_only", c]
        out = pd.concat(
            [adds.assign(op="add"), dels.assign(op="del")],
            ignore_index=True,
        )
        return out[["op"] + c]

    return both.groupby("_bucket").map_groups(
        diff_bucket, batch_format="pandas"
    )
