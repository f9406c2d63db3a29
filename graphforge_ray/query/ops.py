"""Dataset-native equivalents of the reference's query surface.

The reference executes SPARQL through Comunica over an in-memory store
(``executeQuery`` at /root/reference/docs/scripts/document.js:927-993). The
query surface it actually exercises (SURVEY §2.4-2.6) — basic graph
patterns, OPTIONAL, property-path closure, GROUP BY + COUNT, LIMIT, top-k —
is compiled here into Ray Data operations:

* triple pattern match  → vectorized pyarrow filter inside map_batches
* BGP self-join (J1)    → ``Dataset.join`` hash join on shared variables
  (broadcast-merge fast path when one side is already small/materialized)
* OPTIONAL (J2)         → left_outer join on the subject key
* ``(p1|p2)*`` (J3)     → semi-naïve iterative frontier expansion: the
  frontier is joined to the (small, broadcast) edge set per round until
  fixpoint — alternation is a vectorized ``is_in`` pre-filter
* GROUP BY + COUNT (A1) → ``groupby(var).count()``
* LIMIT (O1) / top-k (O2) → ``limit`` / ``sort(desc).limit(k)``

Variables are column names; a pattern binds columns by renaming
subj/pred/obj to the variable names, matching SPARQL bindings semantics.
"""

from __future__ import annotations

from typing import Any

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "match_pattern", "bgp", "optional_join", "property_path_closure",
    "transitive_closure", "count_by", "limit", "top_k",
]

_TERM_COLS = ("subj", "pred", "obj")


def _is_var(term: str | None) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_pattern(
    triples: "ray.data.Dataset",
    subj: str | None = None,
    pred: str | None = None,
    obj: str | None = None,
) -> "ray.data.Dataset":
    """One triple pattern → bindings Dataset.

    Terms: ``"?name"`` binds a variable (column named ``name``), a plain
    string is a constant filter, ``None`` drops the position. Duplicate
    variables within the pattern (e.g. ``?x ?p ?x``) add an equality
    filter, like SPARQL.
    """
    terms = {"subj": subj, "pred": pred, "obj": obj}
    consts = {c: t for c, t in terms.items() if t is not None and not _is_var(t)}
    variables: dict[str, list[str]] = {}
    for c, t in terms.items():
        if _is_var(t):
            variables.setdefault(t[1:], []).append(c)

    def apply(batch: pa.Table) -> pa.Table:
        mask = None
        for col, val in consts.items():
            m = pc.equal(batch[col], pa.scalar(val))
            mask = m if mask is None else pc.and_(mask, m)
        for _var, cols in variables.items():
            for a, b in zip(cols, cols[1:]):
                m = pc.equal(batch[a], batch[b])
                mask = m if mask is None else pc.and_(mask, m)
        if mask is not None:
            batch = batch.filter(mask)
        out_cols, names = [], []
        for var, cols in variables.items():
            out_cols.append(batch[cols[0]])
            names.append(var)
        return pa.Table.from_arrays(out_cols, names=names) if names else batch

    return triples.map_batches(apply, batch_format="pyarrow")


def _join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: list[str],
    how: str = "inner",
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Hash join (Ray Data native). ``num_partitions`` is the shuffle
    fan-out — size it to cluster CPUs for big inputs."""
    return left.join(
        right,
        join_type=how,
        num_partitions=num_partitions,
        on=tuple(on),
        validate_schemas=False,
    )


def broadcast_lookup_join(
    ds: "ray.data.Dataset",
    small: pd.DataFrame,
    on: str,
    how: str = "left",
    concurrency: int | tuple[int, int] | None = None,
) -> "ray.data.Dataset":
    """Map-side join against a SMALL side (dimension table, aggregate
    result): the small frame ships once via ``ray.put`` and each batch
    merges locally — no shuffle (ray_guide 'Joins and lookups'). Use
    ``_join`` / ``Dataset.join`` when both sides are large."""
    if concurrency is None:
        from .. import default_concurrency

        concurrency = default_concurrency(fused=False)
    small_ref = ray.put(small)

    class Merger:
        def __init__(self):
            self.small = ray.get(small_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            return df.merge(self.small, on=on, how=how)

    return ds.map_batches(
        Merger, batch_format="pandas", concurrency=concurrency
    )


def bgp(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str | None, str | None, str | None]],
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Basic graph pattern: join the per-pattern bindings on their shared
    variables (J1). Patterns sharing no variable cross-join via a dummy
    key (rare; keep patterns connected for scale)."""
    if not patterns:
        raise ValueError("empty BGP")
    acc = match_pattern(triples, *patterns[0])
    acc_vars = {v[1:] for v in patterns[0] if _is_var(v)}
    for pat in patterns[1:]:
        nxt = match_pattern(triples, *pat)
        nxt_vars = {v[1:] for v in pat if _is_var(v)}
        shared = sorted(acc_vars & nxt_vars)
        if not shared:
            raise ValueError("disconnected BGP patterns unsupported")
        acc = _join(acc, nxt, on=shared, num_partitions=num_partitions)
        acc_vars |= nxt_vars
    return acc


def optional_join(
    required: "ray.data.Dataset",
    optional: "ray.data.Dataset",
    on: list[str],
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """SPARQL OPTIONAL (J2): left outer join; unmatched rows keep nulls
    (reference conformance case: SPARQL.html:241-254)."""
    return _join(required, optional, on=on, how="left_outer",
                 num_partitions=num_partitions)


def property_path_closure(
    triples: "ray.data.Dataset",
    preds: list[str],
    max_iterations: int = 25,
    include_reflexive: bool = True,
) -> pd.DataFrame:
    """``?s (p1|p2|…)* ?o`` — reflexive-transitive closure over the edges
    whose predicate is in ``preds`` (J3; reference conformance case
    SPARQL.html:256-267).

    Strategy: the edge set after the ``is_in`` alternation filter is the
    class/link hierarchy — orders of magnitude smaller than the corpus
    (heights are bounded; hierarchies fit a node). Distill edges with a
    distributed filter+dedup, then run semi-naïve closure on the driver
    with vectorized pandas merges. Partitioning assumption (documented):
    the FILTERED edge relation fits driver memory; the input triples
    Dataset itself is never materialized.

    Returns a pandas DataFrame ``(s, o)`` of closure pairs.
    """
    pred_set = pa.array(preds)

    def edges_only(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["pred"], value_set=pred_set)
        t = batch.filter(m)
        return pa.Table.from_arrays([t["subj"], t["obj"]], names=["s", "o"])

    edges = (
        triples.map_batches(edges_only, batch_format="pyarrow")
        .map_batches(lambda df: df.drop_duplicates(), batch_format="pandas")
        .to_pandas()
        .drop_duplicates()
    )
    return transitive_closure(edges, max_iterations, include_reflexive)


def transitive_closure(
    edges: pd.DataFrame,
    max_iterations: int = 50,
    include_reflexive: bool = False,
) -> pd.DataFrame:
    """Semi-naïve transitive closure of an ``(s, o)`` edge DataFrame
    (vectorized pandas merges; only the NEW pairs of each round are joined
    against the edge set)."""
    edges = edges[["s", "o"]].drop_duplicates()
    closure = edges.copy()
    frontier = edges
    for _ in range(max_iterations):
        step = frontier.merge(edges, left_on="o", right_on="s", suffixes=("", "_r"))
        step = step[["s", "o_r"]].rename(columns={"o_r": "o"}).drop_duplicates()
        new = step.merge(closure, on=["s", "o"], how="left", indicator=True)
        new = new[new["_merge"] == "left_only"][["s", "o"]]
        if new.empty:
            break
        closure = pd.concat([closure, new], ignore_index=True)
        frontier = new
    if include_reflexive:
        nodes = pd.unique(pd.concat([edges["s"], edges["o"]], ignore_index=True))
        reflexive = pd.DataFrame({"s": nodes, "o": nodes})
        closure = pd.concat([closure, reflexive], ignore_index=True).drop_duplicates()
    return closure.sort_values(["s", "o"]).reset_index(drop=True)


def count_by(
    bindings: "ray.data.Dataset", var: str, alias: str = "count"
) -> "ray.data.Dataset":
    """GROUP BY ?var + COUNT (A1; reference case SPARQL.html:269-283)."""
    from ray.data.aggregate import Count

    return bindings.groupby(var).aggregate(Count(alias_name=alias))


def limit(bindings: "ray.data.Dataset", n: int) -> "ray.data.Dataset":
    """LIMIT n (O1; default query LIMIT 50, app.js:104)."""
    return bindings.limit(n)


def top_k(
    bindings: "ray.data.Dataset", by: str, k: int, descending: bool = True
) -> "ray.data.Dataset":
    """Top-k presentation (O2; queryManager.js preparePlotData top chart)."""
    return bindings.sort(by, descending=descending).limit(k)
