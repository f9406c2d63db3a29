"""SHACL-core cardinality validation (W3C SHACL subset).

The KG-quality gate a production constructor runs after canonicalization:
each shape targets the subjects of one class and constrains one
property's value count (``sh:minCount`` / ``sh:maxCount`` — the two
cardinality constraint components of SHACL core, W3C REC 2017-07-20
§4.2). Emitted violations mirror SHACL's validation-report essentials
(focus node, constrained path, observed count, violated component).

Scale shape: shapes are a handful of rows (ride the task closure);
target selection and per-(subject, pred) counting are map-side
combiners; ONE subject-bucket shuffle finalizes counts and ONE
left-outer bucket join attaches counts to expanded targets — a subject
with ZERO values for a constrained property never produced a count row,
so the join must be outer (minCount violations are exactly the NULL
side). Nothing corpus-sized lands on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = ["shacl_validate"]

_REQUIRED = ("shape_id", "target_class", "pred", "min_count")


def shacl_validate(
    triples: "ray.data.Dataset",
    shapes: list[dict],
    type_pred: str = "rdf:type",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Validate ``triples`` (subj, pred, obj) against cardinality
    shapes; → Dataset (subj, shape_id, pred, n_values:int64,
    violation:{'minCount','maxCount'}) — violating rows only.

    Each shape dict: ``shape_id`` (str), ``target_class`` (subjects
    with a ``type_pred`` triple to this object), ``pred`` (the
    constrained property), ``min_count`` (int ≥ 0), optional
    ``max_count`` (int, ``None`` = unbounded).
    """
    if not shapes:
        raise ValueError("shapes must be non-empty")
    for s in shapes:
        missing = [k for k in _REQUIRED if k not in s]
        if missing:
            raise ValueError(f"shape {s!r} missing {missing}")
    ids = [s["shape_id"] for s in shapes]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate shape_id in {ids}")
    shapes = [dict(s) for s in shapes]  # defensive copy into closures
    classes = sorted({s["target_class"] for s in shapes})
    preds = sorted({s["pred"] for s in shapes})
    bounds = {
        s["shape_id"]: (int(s["min_count"]), s.get("max_count"))
        for s in shapes
    }

    from ..shuffle import bindings_join, bucket_tag

    # -- expanded targets: one row per (target subject, shape) ---------
    def expand_targets(df: pd.DataFrame) -> pd.DataFrame:
        t = df.loc[
            (df["pred"] == type_pred) & df["obj"].isin(classes),
            ["subj", "obj"],
        ]
        parts = [
            pd.DataFrame(
                {
                    "subj": t.loc[
                        t["obj"] == s["target_class"], "subj"
                    ].to_numpy(),
                    "shape_id": s["shape_id"],
                    "pred": s["pred"],
                }
            )
            for s in shapes
        ]
        out = pd.concat(parts, ignore_index=True)
        # a subject typed twice emits duplicate target rows → combiner
        return out.drop_duplicates()

    targets = triples.map_batches(expand_targets, batch_format="pandas")

    # -- per-(subj, pred) value counts: combiner → one bucket shuffle --
    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = df.loc[df["pred"].isin(preds), ["subj", "pred"]]
        g = (
            m.groupby(["subj", "pred"], as_index=False)
            .size()
            .rename(columns={"size": "n_values"})
        )
        g["_bucket"] = bucket_tag(g, "subj", num_buckets)
        return g

    counts = (
        triples.map_batches(count_partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.groupby(["subj", "pred"], as_index=False)[
                "n_values"
            ].sum(),
            batch_format="pandas",
        )
    )

    # -- attach counts (outer: zero-valued subjects have NO count row) -
    joined = bindings_join(
        targets, counts, on=["subj", "pred"], how="left_outer",
        num_buckets=num_buckets,
    )

    def violations(df: pd.DataFrame) -> pd.DataFrame:
        n = (
            pd.to_numeric(df["n_values"], errors="coerce")
            .fillna(0)
            .astype(np.int64)
        )
        lo = df["shape_id"].map({k: v[0] for k, v in bounds.items()})
        hi = df["shape_id"].map({k: v[1] for k, v in bounds.items()})
        under = n < lo
        over = hi.notna() & (n > pd.to_numeric(hi))
        out = pd.DataFrame(
            {
                "subj": df["subj"],
                "shape_id": df["shape_id"],
                "pred": df["pred"],
                "n_values": n,
                "violation": np.where(under, "minCount", "maxCount"),
            }
        )
        return out[under | over]

    return joined.map_batches(violations, batch_format="pandas")
