"""Strongly connected components of a directed graph — the coloring /
forward-backward family (Orzan 2004; Slota, Rajamanickam & Madduri,
"BFS and Coloring-based Parallel Algorithms for Strongly Connected
Components", IPDPS 2014 — public).

Each outer round:

1. **forward-min coloring**: every active node's color starts as its
   own id and iterates ``col(v) ← min(col(v), min col(u) over active
   in-edges u→v)`` to fixpoint — color classes are closed under
   forward reachability, so an SCC never straddles two classes.
2. **roots**: nodes whose color equals their own id (the class
   minimum that is IN the class).
3. **backward BFS from all roots at once, inside each color class**:
   members that can reach their root along edges of the same color
   are exactly the root's SCC → assigned ``scc_id = root``.
4. assigned nodes and their edges leave the active subgraph; repeat.

Convergence: every round assigns at least each class root's SCC, so
outer rounds are bounded by the condensation-DAG chain depth;
``max_rounds`` fails LOUDLY rather than returning a prefix (the
bfs_depths convention). ``scc_id`` is the SCC's minimum node — the
same convention as the undirected ``connected_components`` and the
mutual-reachability SQL oracle.

100-TB shape: every step is a tag-union-bucket shuffle keyed on a
node column (the acero-safe kv_join form); per-round state is
snap_lineage-rebased; the driver sees per-round frontier counts and
8-byte convergence hash partials only — never node sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import HASH_KEY, bucket_tag, snap_lineage

__all__ = ["strongly_connected_components"]


def _hash_sum(ds: "ray.data.Dataset", col: str) -> int:
    """Order-independent 64-bit fingerprint of a column (per-block
    8-byte partials — the connected_components convergence probe)."""

    def h(df: pd.DataFrame) -> pd.DataFrame:
        arr = (df[col].to_numpy(dtype=object)
               if df[col].dtype == object else df[col].to_numpy())
        hs = pd.util.hash_array(arr, hash_key=HASH_KEY).astype("uint64")
        return pd.DataFrame({"h": [int(hs.sum(dtype=np.uint64))]})

    parts = ds.map_batches(h, batch_format="pandas").take_all()
    return sum(int(r["h"]) for r in parts) & ((1 << 64) - 1)


def strongly_connected_components(
    edges: "ray.data.Dataset",
    src: str = "s",
    dst: str = "o",
    max_rounds: int = 64,
    max_prop_rounds: int = 256,
    num_buckets: int = 16,
) -> "ray.data.Dataset":
    """→ Dataset (node, scc_id) over every node of the edge set;
    ``scc_id`` = the minimum node of the component (singletons map to
    themselves)."""
    import ray.data as rd

    def norm(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"u": df[src], "v": df[dst]}) \
            .drop_duplicates()

    act_edges = snap_lineage(
        edges.map_batches(norm, batch_format="pandas"))

    def node_seed(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df["u"], df["v"]], ignore_index=True)
        out = pd.DataFrame({"node": n}).drop_duplicates()
        return out.assign(_bucket=bucket_tag(out, "node", num_buckets))

    active = snap_lineage(
        act_edges.map_batches(node_seed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(
            lambda g: g.drop_duplicates("node")[["node"]],
            batch_format="pandas",
        )
    )
    assigned: list = []

    def tag_on(ds, key_src: str, payload: str, side: int):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "k": df[key_src], "pay": df[payload],
                "_side": np.int8(side),
            })
            return out.assign(
                _bucket=bucket_tag(out, "k", num_buckets))

        return ds.map_batches(fn, batch_format="pandas")

    for _outer in range(max_rounds + 1):
        if active.count() == 0:
            break
        if _outer == max_rounds:
            raise RuntimeError(
                f"scc: active nodes remain after {max_rounds} outer "
                "rounds — condensation chain deeper than expected; "
                "raise max_rounds")

        # ---- 1. forward-min coloring to fixpoint ---------------------
        # POINTER JUMPING (the halved-minhash-clustering lesson): the
        # jump probe col(col(v)) rides the SAME lookup shuffle as the
        # edge probe — fixpoint in O(log depth) rounds, not O(depth)
        col = snap_lineage(active.map_batches(
            lambda df: df.assign(col=df["node"]),
            batch_format="pandas"))
        prev = _hash_sum(col, "col")
        for _p in range(max_prop_rounds + 1):
            if _p == max_prop_rounds:
                raise RuntimeError(
                    f"scc: coloring not converged after "
                    f"{max_prop_rounds} rounds")

            def edge_probe(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({"k": df["u"], "tgt": df["v"],
                                    "_side": np.int8(0)})
                return out.assign(
                    _bucket=bucket_tag(out, "k", num_buckets))

            def jump_probe(df: pd.DataFrame) -> pd.DataFrame:
                j = df[df["col"] != df["node"]]
                out = pd.DataFrame({"k": j["col"], "tgt": j["node"],
                                    "_side": np.int8(0)})
                return out.assign(
                    _bucket=bucket_tag(out, "k", num_buckets))

            def col_lookup(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({"k": df["node"],
                                    "tgt": df["node"],
                                    "_side": np.int8(1)})
                out["val"] = df["col"].to_numpy()
                return out.assign(
                    _bucket=bucket_tag(out, "k", num_buckets))

            # both probes meet the one col lookup; per-bucket combiner
            # keeps the min candidate per target
            def emit_cand(g: pd.DataFrame) -> pd.DataFrame:
                pr = g[g["_side"] == 0]
                lk = g[g["_side"] == 1].drop_duplicates("k")
                m = pr[["k", "tgt"]].merge(
                    lk[["k", "val"]], on="k", how="inner")
                out = pd.DataFrame({"k": m["tgt"], "pay": m["val"],
                                    "_side": np.int8(0)})
                out = out.groupby("k", as_index=False).agg(
                    pay=("pay", "min"))
                out["_side"] = np.int8(0)
                return out.assign(
                    _bucket=bucket_tag(out, "k", num_buckets))

            probe = act_edges.map_batches(
                edge_probe, batch_format="pandas"
            ).union(col.map_batches(jump_probe, batch_format="pandas"))
            lookup_side = col.map_batches(
                col_lookup, batch_format="pandas")

            def _with_val(df: pd.DataFrame) -> pd.DataFrame:
                # probe rows need the val column too (typed fill: same
                # dtype as the key — union-schema lesson)
                df = df.copy()
                df["val"] = df["k"].to_numpy()
                return df[["k", "tgt", "_side", "val", "_bucket"]]

            cands = (
                probe.map_batches(_with_val, batch_format="pandas")
                .union(lookup_side.map_batches(
                    lambda df: df[["k", "tgt", "_side", "val",
                                   "_bucket"]],
                    batch_format="pandas"))
                .groupby("_bucket")
                .map_groups(emit_cand, batch_format="pandas")
            )

            def fold_min(g: pd.DataFrame) -> pd.DataFrame:
                # every candidate target has an own-color row (the col
                # table covers all active nodes), so a plain concat +
                # groupby-min is exact AND dtype-stable (a .map/merge
                # alignment would NaN-coerce int colors to float and
                # destabilize the convergence hash)
                out = g[["k", "pay"]].groupby(
                    "k", as_index=False)["pay"].min()
                return pd.DataFrame({"node": out["k"].to_numpy(),
                                     "col": out["pay"].to_numpy()})

            # repartition BEFORE the snap: sort emits one output block
            # per input block, and iterated rounds otherwise explode
            # the block count (measured 3→243 in 5 rounds — CLAUDE.md)
            col = snap_lineage(
                cands.union(tag_on(col, "node", "col", 1))
                .groupby("_bucket")
                .map_groups(fold_min, batch_format="pandas")
                .repartition(num_buckets)
            )
            cur = _hash_sum(col, "col")
            if cur == prev:
                break
            prev = cur

        # ---- 2+3. roots, then backward BFS inside color classes ------
        visited = snap_lineage(col.map_batches(
            lambda df: df[df["node"] == df["col"]],
            batch_format="pandas"))
        frontier = visited
        _bfs_rounds = 0
        while frontier.count() > 0:
            _bfs_rounds += 1
            if _bfs_rounds > max_prop_rounds:
                raise RuntimeError(
                    f"scc: backward BFS not converged after "
                    f"{max_prop_rounds} rounds")
            # reverse expansion: edge u→v, frontier at v → candidate u
            def back_cand(g: pd.DataFrame) -> pd.DataFrame:
                e = g[g["_side"] == 0]
                f = g[g["_side"] == 1].drop_duplicates(["k", "pay"])
                m = e.merge(f[["k", "pay"]].rename(
                    columns={"pay": "c"}), on="k", how="inner")
                out = pd.DataFrame({"k": m["pay"], "pay": m["c"],
                                    "_side": np.int8(0)}) \
                    .drop_duplicates()
                return out.assign(
                    _bucket=bucket_tag(out, "k", num_buckets))

            cands = (
                tag_on(act_edges, "v", "u", 0)
                .union(tag_on(frontier, "node", "col", 1))
                .groupby("_bucket")
                .map_groups(back_cand, batch_format="pandas")
            )

            # keep candidates whose own color matches AND not visited
            def absorb(g: pd.DataFrame) -> pd.DataFrame:
                cd = g[g["_side"] == 0]
                cl = g[g["_side"] == 1].drop_duplicates("k")
                vs = g[g["_side"] == 2]
                if not len(cd) or not len(cl):
                    return pd.DataFrame({
                        "node": pd.Series([], dtype=object),
                        "col": pd.Series([], dtype=object)})
                m = cd.merge(cl[["k", "pay"]].rename(
                    columns={"pay": "own"}), on="k", how="inner")
                m = m[m["pay"] == m["own"]].drop_duplicates(["k", "pay"])
                if len(vs) and len(m):
                    seen = set(zip(vs["k"], vs["pay"]))
                    # typed bool mask — an empty plain LIST would be
                    # treated as (empty) COLUMN selection by pandas
                    mask = np.fromiter(
                        ((a, b) not in seen
                         for a, b in zip(m["k"], m["pay"])),
                        bool, len(m))
                    m = m[mask]
                return pd.DataFrame({"node": m["k"].to_numpy(),
                                     "col": m["pay"].to_numpy()})

            frontier = snap_lineage(
                cands
                .union(tag_on(col, "node", "col", 1))
                .union(tag_on(visited, "node", "col", 2))
                .groupby("_bucket")
                .map_groups(absorb, batch_format="pandas")
                .repartition(num_buckets)
            )
            if frontier.count() == 0:
                break
            visited = snap_lineage(
                visited.union(frontier).repartition(num_buckets))

        members = visited.map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "scc_id": df["col"]}),
            batch_format="pandas",
        )
        assigned.append(snap_lineage(members))

        # ---- 4. shrink the active subgraph ---------------------------
        def drop_nodes(g: pd.DataFrame) -> pd.DataFrame:
            keep = g[g["_side"] == 0]
            gone = set(g.loc[g["_side"] == 1, "k"])
            keep = keep[~keep["k"].isin(gone)]
            return pd.DataFrame({"node": keep["k"].to_numpy()})

        active = snap_lineage(
            tag_on(active, "node", "node", 0)
            .union(tag_on(members, "node", "node", 1))
            .groupby("_bucket")
            .map_groups(drop_nodes, batch_format="pandas")
            .repartition(num_buckets)
        )

        # edges survive only if BOTH endpoints are still active
        def filter_end(which: str):
            def fn(g: pd.DataFrame) -> pd.DataFrame:
                e = g[g["_side"] == 0]
                alive = set(g.loc[g["_side"] == 1, "k"])
                e = e[e["k"].isin(alive)]
                return pd.DataFrame(
                    {"u": e["k"] if which == "u" else e["pay"],
                     "v": e["pay"] if which == "u" else e["k"]})

            return fn

        act_edges = snap_lineage(
            tag_on(act_edges, "u", "v", 0)
            .union(tag_on(active, "node", "node", 1))
            .groupby("_bucket")
            .map_groups(filter_end("u"), batch_format="pandas")
            .repartition(num_buckets)
        )
        act_edges = snap_lineage(
            tag_on(act_edges, "v", "u", 0)
            .union(tag_on(active, "node", "node", 1))
            .groupby("_bucket")
            .map_groups(filter_end("v"), batch_format="pandas")
            .repartition(num_buckets)
        )

    if not assigned:
        return rd.from_pandas(pd.DataFrame(
            {"node": pd.Series([], dtype=object),
             "scc_id": pd.Series([], dtype=object)}))
    out = assigned[0]
    for a in assigned[1:]:
        out = out.union(a)
    return out
