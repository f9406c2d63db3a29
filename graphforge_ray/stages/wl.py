"""Weisfeiler–Leman node signatures over a labeled KG adjacency.

The 1-WL color-refinement primitive (Weisfeiler & Leman 1968;
Shervashidze et al., "Weisfeiler-Lehman Graph Kernels", JMLR 2011 —
public): every round, a node's signature becomes the hash of its own
signature plus the SORTED multiset of (edge-label, neighbor-signature)
pairs. R rounds distinguish nodes whose R-hop neighborhoods differ —
the standard structural fingerprint for graph kernels, KG schema
similarity and candidate blocking for subgraph dedup.

Update rule (exactly SQL-replayable, DuckDB
``md5(lab || '|' || COALESCE(string_agg(contrib, '|' ORDER BY
contrib), ''))``):

    contrib(v→via e) = pred(e) || '|' || lab(dst(e))
    lab'(v)          = md5(lab(v) || '|' || sorted-contribs-joined)

100-TB shape: one round = TWO bucket shuffles (the pagerank
scatter/gather shape) — (1) neighbor signatures meet the edge set
keyed on the DESTINATION node (the edge table is tagged once on that
key and reused every round); (2) contributions reduce back to the
source node, fused with the signature update. Per-round state is
snap_lineage-rebased; the driver never sees node sets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import bucket_tag, snap_lineage
from .fasthash import md5_hex

__all__ = ["wl_signatures"]


def wl_signatures(
    edges: "ray.data.Dataset",
    rounds: int,
    src: str = "s",
    pred: str | None = "p",
    dst: str = "o",
    labels: "ray.data.Dataset | None" = None,
    node_col: str = "node",
    label_col: str = "lab",
    num_buckets: int = 32,
) -> "ray.data.Dataset":
    """→ Dataset (node:str, lab:str) after ``rounds`` refinements.

    ``labels`` seeds round 0 (node, lab); default is the uniform empty
    label (round 1 then separates by out-signature multiset).
    ``pred=None`` treats the graph as unlabeled (contrib = '|lab')."""
    import ray.data as rd

    if rounds < 1:
        raise ValueError(f"rounds must be ≥ 1: {rounds}")

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "node": df[dst].astype(str),       # shuffle key: dst
            "srcn": df[src].astype(str),
            "pr": (df[pred].astype(str) if pred is not None else ""),
        })
        return out.assign(_bucket=bucket_tag(out, "node", num_buckets))

    # tagged ONCE on the reused dst key; every round unions against it
    edges_t = snap_lineage(
        edges.map_batches(edge_rows, batch_format="pandas"))

    if labels is None:
        # nodes = distinct src ∪ dst, seeded with the uniform label
        def node_rows(df: pd.DataFrame) -> pd.DataFrame:
            e = pd.concat([df[src].astype(str), df[dst].astype(str)],
                          ignore_index=True)
            out = pd.DataFrame({"node": e}).drop_duplicates()
            return out.assign(
                _bucket=bucket_tag(out, "node", num_buckets))

        lab = (
            edges.map_batches(node_rows, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(
                lambda g: g.drop_duplicates("node")[["node"]]
                .assign(lab=""),
                batch_format="pandas",
            )
        )
    else:
        lab = labels.map_batches(
            lambda df: pd.DataFrame({
                "node": df[node_col].astype(str),
                "lab": df[label_col].astype(str)}),
            batch_format="pandas",
        )
    lab = snap_lineage(lab)

    for _ in range(rounds):
        # -- shuffle 1: neighbor signatures meet edges on dst ---------
        def tag_lab_dst(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": df["node"], "srcn": "", "pr": df["lab"],
                "_side": np.int8(1),
            })
            return out.assign(
                _bucket=bucket_tag(out, "node", num_buckets))[
                ["node", "srcn", "pr", "_side", "_bucket"]]

        def contribs(g: pd.DataFrame) -> pd.DataFrame:
            e = g[g["_side"] == 0]
            l_ = g[g["_side"] == 1].drop_duplicates("node")
            if not len(e) or not len(l_):
                return pd.DataFrame({
                    "node": pd.Series([], dtype=object),
                    "contrib": pd.Series([], dtype=object),
                    "_bucket": pd.Series([], dtype="int32")})
            m = e.merge(
                l_[["node", "pr"]].rename(columns={"pr": "nl"}),
                on="node", how="inner")
            out = pd.DataFrame({
                "node": m["srcn"].to_numpy(dtype=object),
                "contrib": (m["pr"] + "|" + m["nl"])
                .to_numpy(dtype=object),
            })
            return out.assign(
                _bucket=bucket_tag(out, "node", num_buckets))

        cont = (
            edges_t.map_batches(
                lambda df: df.assign(_side=np.int8(0))[
                    ["node", "srcn", "pr", "_side", "_bucket"]],
                batch_format="pandas",
            )
            .union(lab.map_batches(tag_lab_dst, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(contribs, batch_format="pandas")
        )

        # -- shuffle 2: reduce to source + fused signature update -----
        def tag_lab_node(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame({
                "node": df["node"], "contrib": df["lab"],
                "_side": np.int8(1),
            })
            return out.assign(
                _bucket=bucket_tag(out, "node", num_buckets))[
                ["node", "contrib", "_side", "_bucket"]]

        def refine(g: pd.DataFrame) -> pd.DataFrame:
            own = g[g["_side"] == 1].drop_duplicates("node")
            if not len(own):
                return pd.DataFrame({
                    "node": pd.Series([], dtype=object),
                    "lab": pd.Series([], dtype=object)})
            c = g[g["_side"] == 0].sort_values(
                ["node", "contrib"], kind="mergesort")
            agg = c.groupby("node")["contrib"].agg("|".join)
            joined = own["node"].map(agg).fillna("")
            key = (own["contrib"] + "|" + joined).to_numpy(dtype=object)
            return pd.DataFrame({
                "node": own["node"].to_numpy(dtype=object),
                "lab": md5_hex(key),
            })

        lab = snap_lineage(
            cont.map_batches(
                lambda df: df.assign(_side=np.int8(0))[
                    ["node", "contrib", "_side", "_bucket"]],
                batch_format="pandas",
            )
            .union(lab.map_batches(tag_lab_node, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(refine, batch_format="pandas")
        )

    return lab
