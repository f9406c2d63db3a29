"""Deterministic random walks — DeepWalk/node2vec-style corpus
generation over a KG adjacency (Perozzi et al., "DeepWalk: Online
Learning of Social Representations", KDD 2014, public).

Each walk advances by an md5-derived choice: at step ``t`` the walk
``w`` standing on node ``n`` moves to neighbor number
``md5(salt|walk_id|t) % deg(n)`` in the DETERMINISTIC neighbor order
(sorted by destination, duplicate edges dropped — KG set semantics).
A pure function of (salt, walk_id, step, adjacency): identical on
every node count/placement and replayable by a recursive SQL oracle
(ROW_NUMBER neighbor ranks + the same md5 expression).

100-TB shape:

- the adjacency is ranked ONCE (one bucket shuffle keyed on the
  source node: per-bucket sort → neighbor index + degree) and
  materialized; every round reuses the SAME bucket key, so walk
  rounds never reshuffle the edge set to a new partitioning.
- one round = ONE tag-union-bucket shuffle: frontier rows (live
  walks) meet their source node's adjacency bucket; the per-bucket
  kernel joins walk→degree (1:1), computes the md5 choice, and picks
  exactly ONE adjacency row per walk — hot nodes cost their
  adjacency-list size once per bucket, never per walk.
- the driver sees per-round frontier COUNTS only; walks that reach a
  sink (no out-edges) drop out of the frontier naturally.
- per-round state is ``snap_lineage``-rebased (iterated-plan-replay
  lesson) and step outputs accumulate as separate snapped datasets,
  unioned once at the end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag, pair_bucket_tag, snap_lineage
from .fasthash import hex_prefix_int, md5_hex

__all__ = ["random_walks", "skipgram_pairs"]


def random_walks(
    edges: "ray.data.Dataset",
    walk_len: int,
    walks_per_node: int = 1,
    starts: "ray.data.Dataset | None" = None,
    src: str = "s",
    dst: str = "o",
    start_col: str = "node",
    salt: str = "graft-walk",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (walk_id:str, step:int64, node) — ``walks_per_node``
    deterministic walks of ≤ ``walk_len`` steps from every start node
    (default: every distinct source in ``edges``). ``walk_id`` is
    ``"<start>#<w>"``; step 0 is the start node; a walk ends early at
    a node with no out-edges. Duplicate (src, dst) edges count once."""
    import ray.data as rd

    if walk_len < 1:
        raise ValueError(f"walk_len must be ≥ 1: {walk_len}")
    if walks_per_node < 1:
        raise ValueError(
            f"walks_per_node must be ≥ 1: {walks_per_node}")

    # ---- ranked adjacency: one bucket shuffle, reused every round ----
    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"node": df[src], "dst": df[dst]})
        return out.assign(_bucket=bucket_tag(out, "node", num_buckets))

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["node", "dst"]).sort_values(
            ["node", "dst"], kind="mergesort")
        idx = g.groupby("node").cumcount().to_numpy(np.int64)
        deg = g.groupby("node")["dst"].transform("size") \
            .to_numpy(np.int64)
        return pd.DataFrame({
            "node": g["node"].to_numpy(), "idx": idx,
            "dst": g["dst"].to_numpy(), "deg": deg,
            "_bucket": g["_bucket"].to_numpy(),
        })

    adj = snap_lineage(
        edges.map_batches(tag_edge, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(rank_bucket, batch_format="pandas")
    )

    # ---- step-0 frontier: starts × walks_per_node -------------------
    if starts is None:
        # adj is grouped by source bucket → per-block distinct is exact
        starts = adj.map_batches(
            lambda df: df.drop_duplicates("node")[["node"]],
            batch_format="pandas",
        )
        start_col = "node"
    if starts.count() == 0:
        raise ValueError("random_walks: empty start set")

    wpn = walks_per_node

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        n = df[start_col].to_numpy()
        nm = df[start_col].astype(str).to_numpy(dtype=object)
        parts = [
            pd.DataFrame({
                "walk_id": np.array(
                    [f"{x}#{w}" for x in nm], dtype=object),
                "node": n,
            })
            for w in range(wpn)
        ]
        return pd.concat(parts, ignore_index=True)

    frontier = snap_lineage(
        starts.map_batches(seed, batch_format="pandas"))
    outs = [
        frontier.map_batches(
            lambda df: df.assign(step=np.int64(0))[
                ["walk_id", "step", "node"]],
            batch_format="pandas",
        )
    ]

    # ---- rounds: one fused shuffle each ------------------------------
    for t in range(walk_len):
        # both union sides emit IDENTICAL columns/dtypes (typed fills,
        # never object NaN — union-tag shuffle schema lesson)
        def tag_adj(df: pd.DataFrame) -> pd.DataFrame:
            return df.assign(walk_id="", _side=np.int8(0))[
                ["node", "idx", "dst", "deg", "walk_id", "_side",
                 "_bucket"]]

        def tag_frontier(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": df["node"], "idx": np.int64(-1),
                "dst": df["node"], "deg": np.int64(-1),
                "walk_id": df["walk_id"], "_side": np.int8(1),
            })
            return out.assign(
                _bucket=bucket_tag(out, "node", num_buckets))[
                ["node", "idx", "dst", "deg", "walk_id", "_side",
                 "_bucket"]]

        def step_bucket(g: pd.DataFrame, _t=t) -> pd.DataFrame:
            a = g[g["_side"] == 0]
            f = g[g["_side"] == 1]
            if not len(a) or not len(f):
                return pd.DataFrame({
                    "walk_id": pd.Series([], dtype=object),
                    "node": pd.Series(
                        [], dtype=g["dst"].dtype
                        if len(g) else object),
                })
            dg = a.drop_duplicates("node")[["node", "deg"]]
            m = f[["walk_id", "node"]].merge(dg, on="node",
                                             how="inner")
            if not len(m):
                return pd.DataFrame({
                    "walk_id": pd.Series([], dtype=object),
                    "node": pd.Series([], dtype=a["dst"].dtype),
                })
            keys = np.array(
                [f"{salt}|{w}|{_t}" for w in m["walk_id"]],
                dtype=object)
            m["idx"] = (
                hex_prefix_int(md5_hex(keys), 10)
                % m["deg"].to_numpy(np.int64)
            ).astype(np.int64)
            nxt = m[["walk_id", "node", "idx"]].merge(
                a[["node", "idx", "dst"]], on=["node", "idx"],
                how="inner")
            return pd.DataFrame({"walk_id": nxt["walk_id"].to_numpy(),
                                 "node": nxt["dst"].to_numpy()})

        frontier = snap_lineage(
            adj.map_batches(tag_adj, batch_format="pandas")
            .union(frontier.map_batches(
                tag_frontier, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(step_bucket, batch_format="pandas")
        )
        if frontier.count() == 0:
            break
        outs.append(
            frontier.map_batches(
                lambda df, _s=np.int64(t + 1): df.assign(step=_s)[
                    ["walk_id", "step", "node"]],
                batch_format="pandas",
            )
        )

    out = outs[0]
    for o in outs[1:]:
        out = out.union(o)
    return out


def skipgram_pairs(
    walks: "ray.data.Dataset",
    window: int,
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """DeepWalk training pairs: for every walk and every position pair
    within ``window`` steps, emit (center, context) BOTH ways →
    Dataset (center, context, cnt:int64) with exact global counts.

    Two narrow shuffles: walks co-locate by walk_id (each bucket
    self-merges its walks ``window`` times, vectorized — no per-walk
    Python); per-bucket integer pair counts then reduce once keyed on
    the (center, context) composite. SQL-replayable as a self-join on
    (walk_id, |Δstep| ≤ window) + GROUP BY."""
    if window < 1:
        raise ValueError(f"window must be ≥ 1: {window}")

    def tag_walk(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=bucket_tag(df, "walk_id", num_buckets))

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        base = g[["walk_id", "step", "node"]]
        parts = []
        for d in range(1, window + 1):
            sh = base.assign(step=base["step"] - d)
            m = base.merge(sh, on=["walk_id", "step"],
                           suffixes=("", "_ctx"))
            if not len(m):
                continue
            parts.append(pd.DataFrame(
                {"center": m["node"], "context": m["node_ctx"]}))
            parts.append(pd.DataFrame(
                {"center": m["node_ctx"], "context": m["node"]}))
        if not parts:
            return pd.DataFrame({
                "center": pd.Series([], dtype=base["node"].dtype),
                "context": pd.Series([], dtype=base["node"].dtype),
                "cnt": pd.Series([], dtype="int64"),
                "_bucket": pd.Series([], dtype="int32")})
        res = pd.concat(parts, ignore_index=True)
        res = res.groupby(["center", "context"], as_index=False) \
            .size().rename(columns={"size": "cnt"})
        res["cnt"] = res["cnt"].astype("int64")
        return res.assign(_bucket=pair_bucket_tag(
            res, ["center", "context"], num_buckets))

    def reduce_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["center", "context"], as_index=False) \
            .agg(cnt=("cnt", "sum"))
        out["cnt"] = out["cnt"].astype("int64")
        return out

    return (
        walks.map_batches(tag_walk, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(bucket_pairs, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_pairs, batch_format="pandas")
    )
