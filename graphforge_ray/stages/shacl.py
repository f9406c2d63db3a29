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

__all__ = ["shacl_validate", "shacl_validate_incremental",
           "shacl_validate_values"]

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


_VALUE_CHECKS = ("pattern", "in_set", "value_class", "node_kind_iri")


def shacl_validate_values(
    triples: "ray.data.Dataset",
    shapes: list[dict],
    type_pred: str = "rdf:type",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """SHACL value-constraint validation (W3C SHACL core §4.1/4.3/4.5):
    per-VALUE checks complementing the cardinality validator. → Dataset
    (subj, shape_id, pred, obj, violation) — violating rows only, one
    row per offending value, violation ∈ {'pattern', 'in',
    'class', 'nodeKind'}.

    Each shape dict: ``shape_id``, ``target_class``, ``pred``, plus at
    least one of:
      ``pattern``       — RE2-safe regex every value must fully match
                          (``sh:pattern``; keep it RE2-replayable like
                          every regex surface in the repo)
      ``in_set``        — allowed-values list (``sh:in``)
      ``value_class``   — every value must itself be typed this class
                          (``sh:class``; one obj-bucket outer join —
                          untyped values are exactly the NULL side)
      ``node_kind_iri`` — True: value must be an IRI under the
                          reference's startsWith('http') convention
                          (``sh:nodeKind sh:IRI``; extract/rdfxml.py
                          P3 typing quirk)

    Scale shape: target expansion and pattern/in/nodeKind checks are
    map-side; scoping values to targets is ONE subject-bucket join;
    sh:class adds ONE obj-bucket outer join against the type triples.
    Nothing corpus-sized on the driver.
    """
    if not shapes:
        raise ValueError("shapes must be non-empty")
    for s in shapes:
        missing = [k for k in ("shape_id", "target_class", "pred")
                   if k not in s]
        if missing:
            raise ValueError(f"shape {s!r} missing {missing}")
        if not any(k in s for k in _VALUE_CHECKS):
            raise ValueError(
                f"shape {s['shape_id']!r} has no value constraint "
                f"(one of {_VALUE_CHECKS})"
            )
    ids = [s["shape_id"] for s in shapes]
    if len(set(ids)) != len(ids):
        raise ValueError(f"duplicate shape_id in {ids}")
    shapes = [dict(s) for s in shapes]
    classes = sorted({s["target_class"] for s in shapes})
    preds = sorted({s["pred"] for s in shapes})
    value_classes = sorted({s["value_class"] for s in shapes
                            if s.get("value_class") is not None})

    from ..shuffle import bindings_join

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
        return pd.concat(parts, ignore_index=True).drop_duplicates()

    targets = triples.map_batches(expand_targets, batch_format="pandas")

    def value_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df.loc[df["pred"].isin(preds), ["subj", "pred", "obj"]]

    values = triples.map_batches(value_rows, batch_format="pandas")
    scoped = bindings_join(
        values, targets, on=["subj", "pred"], num_buckets=num_buckets
    )

    by_id = {s["shape_id"]: s for s in shapes}

    def flat_checks(df: pd.DataFrame) -> pd.DataFrame:
        """pattern / in / nodeKind — map-side; sh:class deferred."""
        outs = []
        for sid, g in df.groupby("shape_id"):
            s = by_id[sid]
            obj = g["obj"].astype(str)
            if s.get("pattern") is not None:
                bad = ~obj.str.fullmatch(s["pattern"]).fillna(False)
                outs.append(g[bad].assign(violation="pattern"))
            if s.get("in_set") is not None:
                bad = ~g["obj"].isin(list(s["in_set"]))
                outs.append(g[bad].assign(violation="in"))
            if s.get("node_kind_iri"):
                bad = ~obj.str.startswith("http")
                outs.append(g[bad].assign(violation="nodeKind"))
        if not outs:
            return pd.DataFrame(
                {c: pd.Series([], dtype=object)
                 for c in ("subj", "shape_id", "pred", "obj",
                           "violation")}
            )
        out = pd.concat(outs, ignore_index=True)
        return out[["subj", "shape_id", "pred", "obj", "violation"]]

    flat = scoped.map_batches(flat_checks, batch_format="pandas")

    class_shapes = [s for s in shapes if s.get("value_class") is not None]
    if not class_shapes:
        return flat

    # sh:class — a value violates iff NOT EXISTS a type triple
    # (value, type_pred, wanted_class): tag each class-constrained
    # value row with its wanted class and ANTI-join the typed (obj,
    # class) pairs on BOTH columns — exact regardless of how values
    # are typed or batched
    class_ids = {s["shape_id"] for s in class_shapes}
    wanted = {s["shape_id"]: s["value_class"] for s in class_shapes}

    def class_values(df: pd.DataFrame) -> pd.DataFrame:
        g = df[df["shape_id"].isin(class_ids)]
        return g[["subj", "shape_id", "pred", "obj"]].assign(
            _vclass=g["shape_id"].map(wanted).to_numpy()
        )

    def typed_objs(df: pd.DataFrame) -> pd.DataFrame:
        t = df.loc[
            (df["pred"] == type_pred) & df["obj"].isin(value_classes),
            ["subj", "obj"],
        ]
        return pd.DataFrame(
            {"obj": t["subj"], "_vclass": t["obj"]}
        ).drop_duplicates()

    bad = bindings_join(
        scoped.map_batches(class_values, batch_format="pandas"),
        triples.map_batches(typed_objs, batch_format="pandas"),
        on=["obj", "_vclass"], how="anti", num_buckets=num_buckets,
    ).map_batches(
        lambda df: df[["subj", "shape_id", "pred", "obj"]].assign(
            violation="class"),
        batch_format="pandas",
    )

    return flat.union(bad)


def shacl_validate_incremental(
    new_triples: "ray.data.Dataset",
    shapes: list[dict],
    affected_subjects: "ray.data.Dataset",
    prev_violations: "ray.data.Dataset",
    type_pred: str = "rdf:type",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """Incremental SHACL revalidation for the update pipeline: every
    cardinality constraint is SUBJECT-scoped, so only subjects touched
    by a snapshot delta (any add/del row — including type changes,
    which move subjects in/out of the target set) can change verdicts.

    → the NEW snapshot's full violation set, computed as: previous
    violations MINUS affected subjects (one anti bucket join) UNION a
    fresh ``shacl_validate`` over ONLY the affected subjects' triples
    (one semi bucket join scopes the corpus). Work is O(delta-subject
    triples), not corpus-sized; equality with a full revalidation is
    the driver-query contract.

    ``affected_subjects``: Dataset with a ``subj`` column (typically
    the distinct subjects of both kg_delta directions).
    ``prev_violations``: the previous snapshot's validator output
    (same 5-column schema this module emits)."""
    from ..shuffle import bindings_join

    aff = affected_subjects.map_batches(
        lambda df: df[["subj"]].drop_duplicates(),
        batch_format="pandas",
    )
    # empty delta (schema-less Dataset) → no subject can change
    # verdict: the previous violations ARE the new snapshot's
    if aff.schema(fetch_if_missing=True) is None:
        return prev_violations
    scoped = bindings_join(
        new_triples, aff, on=["subj"], how="semi",
        num_buckets=num_buckets,
    )
    fresh = shacl_validate(
        scoped, shapes, type_pred=type_pred, num_buckets=num_buckets
    )
    kept = bindings_join(
        prev_violations, aff, on=["subj"], how="anti",
        num_buckets=num_buckets,
    ).map_batches(
        # bindings_join's side-normalization widens n_values to object
        # (documented dtype caveat) — restore int64 so the union with
        # the fresh side keeps ONE schema
        lambda df: df.assign(
            n_values=pd.to_numeric(df["n_values"]).astype(np.int64)
        ),
        batch_format="pandas",
    )
    return kept.union(fresh)
