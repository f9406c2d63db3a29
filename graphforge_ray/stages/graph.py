"""Distributed graph analytics over (s, o) edge Datasets.

Beyond-reference operator family: the reference materializes the KG's
adjacency (docs/scripts/document.js builds the triple store) but ships
no analytics over it; a KG-construction user immediately wants degree
stats, PageRank-style centrality, triangle/community structure over the
materialized graph. Everything here keeps the graph distributed — the
driver only ever sees O(1) scalars (iteration counters, dangling mass,
the triangle count) or an intentionally small histogram.

Shuffle discipline (CLAUDE.md lessons): iterated rounds materialize +
``repartition(num_partitions)`` each round so sort-shuffle block counts
don't explode; joins use the tag-union-bucket pattern
(``shuffle.bindings_join`` / bespoke single-shuffle kernels), never
Ray's acero join (empty-block schema crash); per-key work is one
vectorized pandas kernel per bucket, never a per-key Ray aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..shuffle import (
    bindings_join,
    bucket_tag,
    dedup_pairs,
    pair_bucket_tag,
    snap_lineage,
)

__all__ = [
    "out_degrees",
    "degree_histogram",
    "pagerank",
    "personalized_pagerank",
    "label_propagation",
    "hits",
    "triangle_count",
    "local_clustering",
    "degree_assortativity",
    "modularity",
    "k_truss",
    "neighbor_agg",
    "diameter_estimate",
    "bipartite_project",
    "bfs_depths",
    "sssp",
    "temporal_reach",
    "node_jaccard",
    "k_core",
    "harmonic_centrality",
]


def _auto_partitions(n_edges: int) -> int:
    """Bucket/block count scaled to edge volume — same policy as
    ``dedup.connected_components``: tiny graphs get few buckets (shuffle
    fixed cost per round grows with block count), web-scale edge sets
    fan out wide."""
    return max(8, min(256, n_edges // 50_000 + 8))


def out_degrees(
    edges: "ray.data.Dataset",
    src: str = "s",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Per-source-node out-degree of an (s, o) edge Dataset → Dataset
    (node, out_deg). Multi-edges count individually (parallel edges are
    distinct contributions, matching PageRank's per-edge semantics).

    Map-side combiner (within-batch groupby-sum of partial counts) →
    coarse bucket shuffle → one vectorized groupby-sum per bucket, so
    the shuffle moves one row per (batch, node), not per edge."""
    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(src, as_index=False)
            .size()
            .rename(columns={src: "node", "size": "out_deg"})
        )
        g["out_deg"] = g["out_deg"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "node", num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["out_deg"].sum()
        out["out_deg"] = out["out_deg"].astype(np.int64)
        return out

    return (
        edges.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def degree_histogram(
    edges: "ray.data.Dataset", src: str = "s"
) -> pd.DataFrame:
    """Out-degree histogram → small DataFrame (out_deg, n_nodes) sorted
    by out_deg. The distinct-degree cardinality is tiny by construction
    (power-law graphs have O(log n) distinct degrees at meaningful
    mass), so the second aggregate's key space is driver-safe."""
    from ray.data.aggregate import Count

    deg = out_degrees(edges, src=src)
    hist = deg.groupby("out_deg").aggregate(Count(alias_name="n_nodes"))
    out = hist.to_pandas().sort_values("out_deg").reset_index(drop=True)
    out["out_deg"] = out["out_deg"].astype(np.int64)
    out["n_nodes"] = out["n_nodes"].astype(np.int64)
    return out[["out_deg", "n_nodes"]]


def pagerank(
    edges: "ray.data.Dataset",
    num_iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
    init_ranks: "ray.data.Dataset | None" = None,
    weight_col: str | None = None,
) -> "ray.data.Dataset":
    """PageRank by power iteration over an (s, o) edge Dataset →
    Dataset (node, rank), exactly ``num_iters`` rounds (fixed rounds so
    an SQL oracle can unroll the same computation; no early exit).

    ``weight_col`` names a strictly-positive edge-weight column
    (e.g. the host graph's ``n_links``): each round a node sends
    rank·w(e)/Σ_out w along each out-edge — the unweighted semantics
    with every weight 1. Weights ≤ 0 / null raise loudly (a zero-weight
    edge would silently differ from the edge's absence).

    ``init_ranks`` (node, rank) warm-starts the iteration — the
    incremental-maintenance path: after a snapshot delta, seed with the
    previous snapshot's ranks and re-converge in far fewer rounds
    (nodes absent from the prior get 1/N). Warm-starting from j rounds
    and running k more is EXACTLY pagerank over j+k rounds when the
    graph is unchanged (pinned by test_graph).

    Semantics: rank⁰ = 1/N for the N distinct nodes incident to any
    edge; each round every node sends rank/out_deg along each out-edge
    (parallel edges contribute individually), dangling nodes (out_deg
    0) spread their whole rank uniformly, and
    rank' = (1-d)/N + d·(Σ incoming + dangling_mass/N).

    Scale shape — per round exactly TWO all-to-all shuffles plus one
    O(nodes) scan for the dangling-mass scalar:

    1. scatter (bucket on SOURCE node): edge rows and state rows meet in
       one tag-union-bucket groupby; each bucket merges w = rank/out_deg
       onto its edges and emits (dst, contrib) rows, PLUS one
       (dst=node, contrib=0, deg=out_deg) carrier row per node so every
       node — including in-degree-0 ones — survives into the gather and
       the static out_deg rides along instead of needing a third join.
    2. gather (bucket on DEST node): per-bucket vectorized groupby-sum →
       rank' for every node; repartition + materialize bounds block
       growth across rounds (iterated-groupby lesson, CLAUDE.md).

    The driver sees only N (a count) and the per-round dangling mass (a
    one-row aggregate of the materialized state); ranks never leave the
    cluster."""
    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())
    edges = edges.repartition(num_partitions).materialize()

    # out_deg is the out-MASS denominator: edge count unweighted,
    # Σ out-weights weighted — one dtype per mode so the union-tag
    # shuffles below never mix int64/float64 fills (CLAUDE.md rule)
    mass_dt = np.float64 if weight_col else np.int64

    # state = (node, out_deg, rank) for every node incident to an edge:
    # scatter (node=s, d=w) and (node=o, d=0) with a within-batch
    # combiner, then one bucket groupby-sum
    def seed(df: pd.DataFrame) -> pd.DataFrame:
        if weight_col:
            w = df[weight_col].to_numpy(dtype=np.float64)
            if len(w) and (not np.all(np.isfinite(w)) or (w <= 0).any()):
                raise ValueError(
                    f"pagerank weight_col {weight_col!r} must be "
                    "strictly positive and finite"
                )
        else:
            w = np.ones(len(df), mass_dt)
        both = pd.DataFrame(
            {
                "node": pd.concat([df["s"], df["o"]], ignore_index=True),
                "d": np.concatenate(
                    [w.astype(mass_dt), np.zeros(len(df), mass_dt)]
                ),
            }
        )
        g = both.groupby("node", as_index=False)["d"].sum()
        return g.assign(_bucket=bucket_tag(g, "node", num_partitions))

    def seed_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["d"].sum()
        return out.rename(columns={"d": "out_deg"})

    state = (
        edges.map_batches(seed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(seed_reduce, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()
    )
    n_nodes = state.count()
    if n_nodes == 0:
        return state.map_batches(
            lambda df: pd.DataFrame({"node": [], "rank": []}),
            batch_format="pandas",
        )
    init = 1.0 / n_nodes
    if init_ranks is None:
        state = state.map_batches(
            lambda df, _r=init: df.assign(rank=np.float64(_r)),
            batch_format="pandas",
        ).materialize()
    else:
        # warm start (incremental maintenance): rank⁰ = prior rank
        # where known, 1/N for nodes new since the prior snapshot. The
        # damped update is a contraction, so ANY init converges to the
        # same fixed point — warm starts just arrive in fewer rounds
        # (no normalization needed). One tag-union-bucket merge; prior
        # ranks never touch the driver.
        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["node", "out_deg"]].assign(
                rank=np.nan, _side=np.int8(0))
            return out.assign(_bucket=bucket_tag(out, "node",
                                                 num_partitions))

        def tag_prior(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"node": df["node"],
                 "out_deg": mass_dt(0),
                 "rank": df["rank"].astype(np.float64),
                 "_side": np.int8(1)}
            )
            return out.assign(_bucket=bucket_tag(out, "node",
                                                 num_partitions))

        def merge_init(g: pd.DataFrame) -> pd.DataFrame:
            st = g[g["_side"] == 0]
            pr = g[g["_side"] == 1].drop_duplicates("node")
            out = st[["node", "out_deg"]].merge(
                pr[["node", "rank"]], on="node", how="left")
            out["rank"] = out["rank"].fillna(init).astype(np.float64)
            return out

        state = (
            state.map_batches(tag_state, batch_format="pandas")
            .union(init_ranks.map_batches(tag_prior,
                                          batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(merge_init, batch_format="pandas")
            .repartition(num_partitions)
            .materialize()
        )

    base = (1.0 - damping) / n_nodes

    def dangling_mass(st: "ray.data.Dataset") -> float:
        """Σ rank over out_deg==0 nodes — per-block partial sums, tiny
        driver reduce (one float per block)."""
        def h(df: pd.DataFrame) -> pd.DataFrame:
            m = df.loc[df["out_deg"] == 0, "rank"].to_numpy()
            return pd.DataFrame({"m": [float(m.sum())]})

        return float(
            sum(r["m"] for r in st.map_batches(h, batch_format="pandas")
                .take_all())
        )

    edge_cols = ("k", "dst", "w", "deg")

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "k": df["s"],
                "dst": df["o"],
                "w": np.float64(0.0),
                "wt": (df[weight_col].to_numpy(dtype=np.float64)
                       if weight_col else np.float64(1.0)),
                "deg": mass_dt(0),
                "_side": np.int8(0),
            }
        )
        return out.assign(_bucket=bucket_tag(out, "k", num_partitions))

    def scatter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        el = g.loc[g["_side"] == 0, ["k", "dst", "wt"]]
        st = g.loc[g["_side"] == 1, ["k", "w", "deg"]]
        sent = el.merge(st[["k", "w"]], on="k", how="inner")
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "dst": sent["dst"],
                        # ×1.0 unweighted — IEEE identity, no parity
                        # drift on the existing oracles
                        "contrib": sent["w"] * sent["wt"],
                        "deg": mass_dt(0),
                    }
                ),
                # carrier row: keeps in-degree-0 nodes alive and ships
                # the static out_deg into the gather
                pd.DataFrame(
                    {
                        "dst": st["k"],
                        "contrib": np.float64(0.0),
                        "deg": st["deg"],
                    }
                ),
            ],
            ignore_index=True,
        )

    for _ in range(num_iters):
        dm = dangling_mass(state)
        extra = damping * dm / n_nodes

        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            deg = df["out_deg"].to_numpy()
            rank = df["rank"].to_numpy()
            w = np.divide(
                rank, deg, out=np.zeros_like(rank), where=deg > 0
            )
            out = pd.DataFrame(
                {
                    "k": df["node"],
                    "dst": df["node"],  # placeholder, unused on side 1
                    "w": w,
                    "wt": np.float64(0.0),
                    "deg": df["out_deg"].astype(mass_dt),
                    "_side": np.int8(1),
                }
            )
            return out.assign(_bucket=bucket_tag(out, "k", num_partitions))

        scattered = (
            edges.map_batches(tag_edges, batch_format="pandas")
            .union(state.map_batches(tag_state, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(scatter_bucket, batch_format="pandas")
        )

        def gather_tag(df: pd.DataFrame) -> pd.DataFrame:
            # within-batch combiner before the dst shuffle
            g = df.groupby("dst", as_index=False).agg(
                contrib=("contrib", "sum"), deg=("deg", "max")
            )
            return g.assign(_bucket=bucket_tag(g, "dst", num_partitions))

        def gather_bucket(
            g: pd.DataFrame, _base=base, _extra=extra
        ) -> pd.DataFrame:
            out = g.groupby("dst", as_index=False).agg(
                contrib=("contrib", "sum"), deg=("deg", "max")
            )
            return pd.DataFrame(
                {
                    "node": out["dst"],
                    "out_deg": out["deg"].astype(mass_dt),
                    "rank": _base + damping * out["contrib"] + _extra,
                }
            )

        # snap_lineage, not bare materialize: state feeds back into the
        # next round's plan, and materialize alone keeps the logical
        # plan — later rounds would replay the entire iteration history
        # (measured DOUBLING per round from ~round 8; see shuffle.py)
        state = snap_lineage(
            scattered.map_batches(gather_tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(gather_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

    return state.map_batches(
        lambda df: df[["node", "rank"]], batch_format="pandas"
    )


def hits(
    edges: "ray.data.Dataset",
    num_iters: int = 3,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """HITS hubs/authorities over an (s, o) edge Dataset → Dataset
    (node, hub, auth), exactly ``num_iters`` rounds with L1
    normalization (Σ = 1 after each half-step; fixed rounds so an SQL
    oracle can unroll the identical computation — same contract as
    ``pagerank``).

    Per round: auth'(v) = Σ_{u→v} hub(u) then L1-normalize; hub'(u) =
    Σ_{u→v} auth'(v) then L1-normalize. Parallel edges contribute
    individually; self-loops count like any edge. hub⁰ = 1 for every
    node incident to an edge.

    Scale shape — each half-step is ONE scatter + ONE gather shuffle
    (the pagerank pattern: state and edge rows meet in a tag-union
    bucket keyed on the PROBE endpoint; carrier rows keep isolated-side
    nodes alive and ride the companion score through the gather so the
    final state never needs a third join). The driver sees only the
    per-half-step normalization scalar (per-block partial sums) and the
    node count; scores never leave the cluster. Lineage is snapped per
    round (see ``shuffle.snap_lineage``)."""
    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())
    edges = edges.repartition(num_partitions).materialize()

    def seed(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {"node": pd.concat([df["s"], df["o"]], ignore_index=True)}
        ).drop_duplicates()
        return both.assign(_bucket=bucket_tag(both, "node", num_partitions))

    def seed_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g[["node"]].drop_duplicates()
        return out.assign(hub=np.float64(1.0), auth=np.float64(0.0))

    state = (
        edges.map_batches(seed, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(seed_reduce, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()
    )
    if state.count() == 0:
        return state

    def half_step(
        st: "ray.data.Dataset",
        key_col: str,
        dst_col: str,
        send_col: str,
        new_col: str,
    ) -> "ray.data.Dataset":
        """One HITS half-step: every node sends ``send_col`` along its
        ``key_col``-incident edges to the ``dst_col`` endpoint; the
        gather sums into a raw score, L1-normalizes (driver scalar from
        per-block partials), and REPLACES ``new_col`` with it, while the
        persisting ``send_col`` value rides carrier rows unchanged."""

        def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "k": df[key_col],
                    "dst": df[dst_col],
                    "w": np.float64(0.0),
                    "keep": np.float64(0.0),
                    "_side": np.int8(0),
                }
            )
            return out.assign(_bucket=bucket_tag(out, "k", num_partitions))

        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "k": df["node"],
                    "dst": df["node"],  # carrier target
                    "w": df[send_col].astype(np.float64),
                    "keep": df[send_col].astype(np.float64),
                    "_side": np.int8(1),
                }
            )
            return out.assign(_bucket=bucket_tag(out, "k", num_partitions))

        def scatter_bucket(g: pd.DataFrame) -> pd.DataFrame:
            el = g.loc[g["_side"] == 0, ["k", "dst"]]
            st_rows = g.loc[g["_side"] == 1, ["k", "w", "keep"]]
            sent = el.merge(st_rows[["k", "w"]], on="k", how="inner")
            return pd.concat(
                [
                    pd.DataFrame(
                        {
                            "dst": sent["dst"],
                            "contrib": sent["w"],
                            "keep": np.float64(0.0),
                        }
                    ),
                    # carrier: keeps every node alive, rides the
                    # companion score (contrib 0, keep = old value)
                    pd.DataFrame(
                        {
                            "dst": st_rows["k"],
                            "contrib": np.float64(0.0),
                            "keep": st_rows["keep"],
                        }
                    ),
                ],
                ignore_index=True,
            )

        def gather_tag(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("dst", as_index=False).agg(
                contrib=("contrib", "sum"), keep=("keep", "max")
            )
            return g.assign(_bucket=bucket_tag(g, "dst", num_partitions))

        def gather_bucket(g: pd.DataFrame) -> pd.DataFrame:
            out = g.groupby("dst", as_index=False).agg(
                contrib=("contrib", "sum"), keep=("keep", "max")
            )
            return out.rename(columns={"dst": "node"})

        raw = snap_lineage(
            edges.map_batches(tag_edges, batch_format="pandas")
            .union(st.map_batches(tag_state, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(scatter_bucket, batch_format="pandas")
            .map_batches(gather_tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(gather_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

        def partial_sum(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"m": [float(df["contrib"].sum())]})

        total = float(
            sum(
                r["m"]
                for r in raw.map_batches(
                    partial_sum, batch_format="pandas"
                ).take_all()
            )
        )

        def norm(df: pd.DataFrame, _t=total) -> pd.DataFrame:
            score = df["contrib"].to_numpy(np.float64)
            if _t > 0:
                score = score / _t
            return pd.DataFrame(
                {
                    "node": df["node"],
                    send_col: df["keep"].astype(np.float64),
                    new_col: score,
                }
            )[["node", "hub", "auth"]]

        return raw.map_batches(norm, batch_format="pandas")

    for _ in range(num_iters):
        # auth half: hubs send along OUT-edges to o; hub rides carriers
        state = half_step(state, "s", "o", "hub", "auth")
        # hub half: auths send along IN-edges back to s; auth rides
        state = snap_lineage(half_step(state, "o", "s", "auth", "hub"))

    return state


def _canon_dedup_edges(
    edges: "ray.data.Dataset", num_buckets: int
) -> "ray.data.Dataset":
    """(s, o) edge Dataset → materialized UNDIRECTED simple edge set
    (id_a < id_b), self-loops dropped, parallel edges collapsed — the
    shared front half of the triangle family (count / per-node
    clustering / assortativity)."""

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy()
        o = df["o"].to_numpy()
        keep = s != o
        s, o = s[keep], o[keep]
        return pd.DataFrame(
            {"id_a": np.minimum(s, o), "id_b": np.maximum(s, o)}
        ).drop_duplicates()

    return dedup_pairs(
        edges.map_batches(canon, batch_format="pandas"),
        num_buckets=num_buckets,
    ).materialize()


def _undirected_degrees(
    e: "ray.data.Dataset", num_buckets: int
) -> "ray.data.Dataset":
    """Canonical simple edge set (id_a < id_b) → Dataset (node, d:int64)
    undirected degree. Map-side combiner, one node-bucket reduce."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.concat(
            [df["id_a"].rename("node"), df["id_b"].rename("node")],
            ignore_index=True,
        ).to_frame()
        g = g.groupby("node", as_index=False).size().rename(
            columns={"size": "d"})
        g["d"] = g["d"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "node", num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["d"].sum()
        out["d"] = out["d"].astype(np.int64)
        return out

    return (
        e.map_batches(combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def triangle_count(
    edges: "ray.data.Dataset",
    num_buckets: int | None = None,
    hub_threshold: int = 1_000_000,
    max_salts: int = 64,
) -> int:
    """Exact triangle count of the UNDIRECTED simple graph induced by an
    (s, o) edge Dataset (direction dropped, self-loops and parallel
    edges collapsed). Classic distributed wedge-close:

    1. canonicalize each edge to (a, b) with a < b, distributed dedup
       (``shuffle.dedup_pairs`` — never on the driver);
    2. wedges: e₁(a,b) ⋈ e₂(b,c) on b → (a,b,c) with a < b < c, so each
       triangle is generated exactly once from its ordered vertex
       triple;
    3. close: semi-join wedges against the edge set on (a,c); count.

    Hub-skew pre-split (the r3 documented seam, now closed): the wedge
    join keys on the MIDDLE vertex b, so a hub of left-degree l and
    right-degree r concentrates l·r wedge work in one bucket. A tiny
    degree census finds nodes with l·r > ``hub_threshold``; each hot
    b's LEFT rows are salted into R = ceil(l·r / threshold) (≤
    ``max_salts``) groups by hash(a) and its RIGHT rows replicate to
    every salt, so no single task builds more than ~threshold wedges.
    The census reduces distributed; the driver sees ONLY the hot keys
    (hubs are few by definition). Splits are counted in the
    ``triangle_hub_splits`` metric (no-silent-caps rule — replication
    is extra work, never missing work)."""
    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())
    e = _canon_dedup_edges(edges, num_buckets)
    return _closed_triangles(
        e, num_buckets, hub_threshold, max_salts
    ).count()


def _closed_triangles(
    e: "ray.data.Dataset",
    num_buckets: int,
    hub_threshold: int = 1_000_000,
    max_salts: int = 64,
) -> "ray.data.Dataset":
    """Materialized canonical simple edge set (id_a < id_b) → Dataset
    (a, b, c) with a < b < c, one row per closed triangle (the
    wedge-close with hub-skew pre-split documented in
    ``triangle_count``)."""
    import ray as _ray

    # the union shuffle fills the missing side column with object NaN,
    # widening dtypes; the closing semi-join buckets by key HASH, and
    # pandas hash_array(object) != hash_array(int64) for equal values —
    # restore the INPUT edge dtype (int64/float64 for numeric node ids;
    # string/IRI ids are already object on both sides, so no cast)
    import pyarrow as _pa

    sch = e.schema()
    id_type = dict(zip(sch.names, sch.types)).get("id_a")
    if isinstance(id_type, _pa.DataType):
        is_int = _pa.types.is_integer(id_type)
        is_float = _pa.types.is_floating(id_type)
    else:  # pandas-block schema: numpy dtypes / object
        is_int = id_type is not None and np.issubdtype(id_type, np.integer)
        is_float = (
            id_type is not None and np.issubdtype(id_type, np.floating)
        )
    restore = np.int64 if is_int else (np.float64 if is_float else None)

    # -- degree census → hot middle vertices (driver sees ONLY these) --
    def deg_combine(df: pd.DataFrame) -> pd.DataFrame:
        l = df.groupby("id_b", as_index=False).size().rename(
            columns={"id_b": "node", "size": "l"}
        ).assign(r=np.int64(0))
        r = df.groupby("id_a", as_index=False).size().rename(
            columns={"id_a": "node", "size": "r"}
        ).assign(l=np.int64(0))
        g = pd.concat([l, r], ignore_index=True)
        g = g.groupby("node", as_index=False)[["l", "r"]].sum()
        return g.assign(_bucket=bucket_tag(g, "node", num_buckets))

    def deg_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)[["l", "r"]].sum()
        out = out.loc[out["l"] * out["r"] > hub_threshold]
        return out[["node", "l", "r"]]

    hot = (
        e.map_batches(deg_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(deg_reduce, batch_format="pandas")
        .to_pandas()
    )
    salts = {
        row["node"]: int(
            min(max_salts,
                -(-(row["l"] * row["r"]) // hub_threshold))
        )
        for _, row in hot.iterrows()
    }
    if salts:
        from .. import metrics

        metrics.incr("triangle_hub_splits", len(salts))
    salts_ref = _ray.put(salts)

    # -- salted wedge shuffle: left rows pick ONE salt by hash(a); hot
    # right rows replicate to every salt of their b — bucket on (b,
    # salt) so no task builds more than ~hub_threshold wedges
    def tag_left(df: pd.DataFrame) -> pd.DataFrame:
        s_map = _ray.get(salts_ref)
        out = pd.DataFrame(
            {"a": df["id_a"], "b": df["id_b"], "c": df["id_a"],
             "_side": np.int8(0)}
        )
        if s_map:
            r = out["b"].map(s_map).fillna(1).astype(np.int64)
            h = pd.util.hash_array(
                out["a"].to_numpy(dtype=object)
                if out["a"].dtype == object else out["a"].to_numpy(),
                hash_key="graphforge-salts",  # 16 bytes, fixed seed
            )
            out["_salt"] = (h % r.to_numpy().astype(np.uint64)).astype(
                np.int64
            )
        else:
            out["_salt"] = np.int64(0)
        out["_bucket"] = pair_bucket_tag(out, ["b", "_salt"], num_buckets)
        return out

    def tag_right(df: pd.DataFrame) -> pd.DataFrame:
        s_map = _ray.get(salts_ref)
        out = pd.DataFrame(
            {"a": df["id_a"], "b": df["id_a"], "c": df["id_b"],
             "_side": np.int8(1)}
        )
        if s_map:
            r = out["b"].map(s_map).fillna(1).astype(np.int64).to_numpy()
            idx = np.repeat(np.arange(len(out)), r)
            out = out.iloc[idx].reset_index(drop=True)
            # within-group counter 0..r[i]-1 at C speed (a per-row
            # [np.arange(k) for k in r] list comprehension allocates
            # millions of tiny ndarrays once any hub exists)
            out["_salt"] = (
                np.arange(idx.size, dtype=np.int64)
                - np.repeat(np.cumsum(r) - r, r)
            ) if len(r) else np.array([], dtype=np.int64)
        else:
            out["_salt"] = np.int64(0)
        out["_bucket"] = pair_bucket_tag(out, ["b", "_salt"], num_buckets)
        return out

    def wedge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g.loc[g["_side"] == 0, ["a", "b", "_salt"]]
        r = g.loc[g["_side"] == 1, ["b", "c", "_salt"]]
        w = l.merge(r, on=["b", "_salt"], how="inner")
        return w[["a", "b", "c"]]

    wedges = (
        e.map_batches(tag_left, batch_format="pandas")
        .union(e.map_batches(tag_right, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(wedge_bucket, batch_format="pandas")
    )
    if restore is not None:
        wedges = wedges.map_batches(
            lambda df, _r=restore: df.astype(_r), batch_format="pandas"
        )
    closing = e.map_batches(
        lambda df: df.rename(columns={"id_a": "a", "id_b": "c"}),
        batch_format="pandas",
    )
    return bindings_join(
        wedges, closing, on=["a", "c"], how="semi", num_buckets=num_buckets
    )


def local_clustering(
    edges: "ray.data.Dataset",
    num_buckets: int | None = None,
    hub_threshold: int = 1_000_000,
    max_salts: int = 64,
) -> "ray.data.Dataset":
    """Local clustering coefficient per node of the UNDIRECTED simple
    graph induced by an (s, o) edge Dataset → Dataset (node,
    clustering:float64): c(v) = 2·t(v) / (d(v)·(d(v)−1)) for degree ≥ 2,
    else 0.0, where t(v) counts triangles through v.

    Scale shape: per-node triangle counts come from exploding the
    closed-triangle rows (``_closed_triangles`` — wedge-close with
    hub-skew pre-split) through a map-side count combiner and ONE
    node-bucket reduce; degrees ride the same census pattern; the final
    (node, d) ⟕ (node, t) meet is one ``bindings_join`` (triangle-free
    nodes coalesce to t=0). Nothing corpus-sized touches the driver."""
    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())
    e = _canon_dedup_edges(edges, num_buckets)
    closed = _closed_triangles(e, num_buckets, hub_threshold, max_salts)

    def tri_combine(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.concat(
            [df["a"].rename("node"), df["b"].rename("node"),
             df["c"].rename("node")],
            ignore_index=True,
        ).to_frame()
        g = g.groupby("node", as_index=False).size().rename(
            columns={"size": "t"})
        g["t"] = g["t"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "node", num_buckets))

    def tri_reduce(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["t"].sum()
        out["t"] = out["t"].astype(np.int64)
        return out

    tri = (
        closed.map_batches(tri_combine, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(tri_reduce, batch_format="pandas")
    )
    deg = _undirected_degrees(e, num_buckets)
    # triangle-free graph → tri is FULLY empty (schema None), which the
    # join's schema read can't take (CLAUDE.md empty-Dataset guard):
    # every coefficient is 0.0, straight from the degree table
    tri = tri.materialize()
    if tri.schema(fetch_if_missing=True) is None:
        return deg.map_batches(
            lambda df: pd.DataFrame(
                {"node": df["node"],
                 "clustering": np.zeros(len(df), dtype=np.float64)}),
            batch_format="pandas",
        )
    joined = bindings_join(
        deg, tri, on=["node"], how="left_outer", num_buckets=num_buckets
    )

    def coeff(df: pd.DataFrame) -> pd.DataFrame:
        # bindings_join object-fills the missing side — re-cast (the
        # CLAUDE.md numeric-caller rule) before the arithmetic
        d = pd.to_numeric(df["d"]).to_numpy(dtype=np.float64)
        t = pd.to_numeric(df["t"].fillna(0)).to_numpy(dtype=np.float64)
        c = np.where(d >= 2, 2.0 * t / np.maximum(d * (d - 1), 1.0), 0.0)
        node = df["node"]
        if not np.issubdtype(np.asarray(node).dtype, np.number):
            node = pd.to_numeric(node, errors="ignore")
        return pd.DataFrame({"node": node, "clustering": c})

    return joined.map_batches(coeff, batch_format="pandas")


def degree_assortativity(
    edges: "ray.data.Dataset",
    num_buckets: int | None = None,
) -> float:
    """Degree assortativity coefficient (Newman 2002, Pearson
    correlation of endpoint degrees over the UNDIRECTED simple edge
    set, each edge contributing both orientations) → scalar float.

    Scale shape: canonical dedup → degree census → TWO kv-style
    bindings_joins pin d(a) and d(b) onto the edges → one pass of
    five moment partials (n, Σx, Σxx, Σxy with x=y-symmetry) summed by
    an ungrouped aggregate; the driver sees only the five scalars."""
    from ray.data.aggregate import Sum

    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())
    e = _canon_dedup_edges(edges, num_buckets)
    deg = _undirected_degrees(e, num_buckets).materialize()

    ea = bindings_join(
        e.map_batches(
            lambda df: df.rename(columns={"id_a": "node"}),
            batch_format="pandas"),
        deg.map_batches(
            lambda df: df.rename(columns={"d": "da"}),
            batch_format="pandas"),
        on=["node"], how="inner", num_buckets=num_buckets,
    ).map_batches(
        lambda df: df.rename(columns={"node": "id_a"}),
        batch_format="pandas",
    )
    # the first join's union shuffle object-fills — restore the SECOND
    # join's key dtype to the degree table's node dtype FIRST, or the
    # hash buckets split int64 vs object-int keys apart (CLAUDE.md rule)
    from ..shuffle import np_key_dtype

    key_dt = np_key_dtype(deg, "node")

    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"id_b": "node"})
        if key_dt is not None:
            out["node"] = out["node"].astype(key_dt)
        return out

    eab = bindings_join(
        ea.map_batches(rekey, batch_format="pandas"),
        deg.map_batches(
            lambda df: df.rename(columns={"d": "db"}),
            batch_format="pandas"),
        on=["node"], how="inner", num_buckets=num_buckets,
    )

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        da = pd.to_numeric(df["da"]).to_numpy(dtype=np.float64)
        db = pd.to_numeric(df["db"]).to_numpy(dtype=np.float64)
        # both orientations of every undirected edge: x ↔ y symmetric
        return pd.DataFrame({
            "n": [np.float64(2 * len(df))],
            "sx": [float((da + db).sum())],
            "sxx": [float((da * da + db * db).sum())],
            "sxy": [float(2.0 * (da * db).sum())],
        })

    m = eab.map_batches(moments, batch_format="pandas").aggregate(
        Sum(on="n", alias_name="n"), Sum(on="sx", alias_name="sx"),
        Sum(on="sxx", alias_name="sxx"), Sum(on="sxy", alias_name="sxy"),
    )
    if not m or m.get("n") in (None, 0):
        raise ValueError("degree_assortativity: no edges")
    n, sx, sxx, sxy = m["n"], m["sx"], m["sxx"], m["sxy"]
    var = n * sxx - sx * sx
    if var <= 0:
        raise ValueError(
            "degree_assortativity undefined: zero degree variance "
            "(regular graph or no edges)"
        )
    return float((n * sxy - sx * sx) / var)


def bipartite_project(
    ds: "ray.data.Dataset",
    key: str,
    value: str,
    min_count: int = 1,
    max_group: int = 10_000,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Bipartite one-mode projection with co-occurrence weights — the
    co-purchase / co-citation / co-click graph constructor: (key,
    value) rows → Dataset (a, b, n:int64) with a < b counting the
    DISTINCT keys in which both values co-occur; pairs below
    ``min_count`` are dropped (they dominate the output on power-law
    data and carry no signal).

    Pair generation is inherently |group|² per key: groups larger than
    ``max_group`` are EXCLUDED and counted in the
    ``bipartite_groups_dropped`` metric (no-silent-caps — a single
    degenerate container would otherwise emit billions of pairs).
    Scale shape: per-batch distinct, ONE key-bucket shuffle generates
    each key's pairs with a vectorized self-merge, ONE pair-bucket
    shuffle sums counts."""
    if min_count < 1:
        raise ValueError(f"min_count must be ≥ 1: {min_count}")
    if num_buckets is None:
        num_buckets = _auto_partitions(ds.count())

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.DataFrame({"k": df[key], "v": df[value]}).dropna()
        g = g.drop_duplicates()
        return g.assign(_bucket=bucket_tag(g, "k", num_buckets))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["k", "v"]].drop_duplicates()
        sizes = g.groupby("k")["v"].transform("size")
        big = g.loc[sizes > max_group, "k"].nunique()
        if big:
            from .. import metrics

            metrics.incr("bipartite_groups_dropped", int(big))
        g = g.loc[sizes <= max_group]
        m = g.merge(g, on="k")
        m = m.loc[m["v_x"] < m["v_y"]]
        out = m.groupby(["v_x", "v_y"], as_index=False).size().rename(
            columns={"v_x": "a", "v_y": "b", "size": "n"})
        out["n"] = out["n"].astype(np.int64)
        return out.assign(
            _bucket=pair_bucket_tag(out, ["a", "b"], num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False)["n"].sum()
        out = out.loc[out["n"] >= min_count]
        out["n"] = out["n"].astype(np.int64)
        return out

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(pairs, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def diameter_estimate(
    edges: "ray.data.Dataset",
    max_rounds: int = 64,
    num_partitions: int | None = None,
) -> pd.DataFrame:
    """Double-sweep diameter lower bound (Magnien/Latapy/Habib 2009) of
    the UNDIRECTED graph induced by an (s, o) edge Dataset → one-row
    DataFrame (seed, peripheral, diameter_lb): BFS from the minimum
    node, re-BFS from the farthest node found (ties → min node); the
    second eccentricity is the classic tight diameter lower bound.

    Deterministic by construction (min-node seed, min-node ties) so an
    SQL oracle replays it with two depth-capped recursive CTEs. Both
    sweeps ride ``bfs_depths`` (broadcast frontier under 500k rows,
    shuffle fallback above); the driver sees four scalars. A component
    wider than ``max_rounds`` hops fails loudly (bfs_depths' round
    budget), never truncates."""
    from ray.data.aggregate import Max, Min

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["s"] != df["o"]
        s, o = df.loc[keep, "s"], df.loc[keep, "o"]
        return pd.DataFrame(
            {"s": pd.concat([s, o], ignore_index=True),
             "o": pd.concat([o, s], ignore_index=True)})

    eu = edges.map_batches(undirect, batch_format="pandas").materialize()
    nodes = eu.map_batches(
        lambda df: pd.DataFrame({"node": df["s"]}), batch_format="pandas"
    )
    agg = nodes.aggregate(Min(on="node", alias_name="seed"))
    if not agg or agg.get("seed") is None:
        raise ValueError("diameter_estimate: no edges")
    seed = agg["seed"]

    def far_node(depths: "ray.data.Dataset"):
        d = depths.materialize()
        dmax = d.aggregate(Max(on="depth", alias_name="m"))["m"]
        u = d.map_batches(
            lambda df, _m=dmax: df[df["depth"] == _m],
            batch_format="pandas",
        ).aggregate(Min(on="node", alias_name="u"))["u"]
        return u, int(dmax)

    b1 = bfs_depths(eu, [seed], max_rounds=max_rounds,
                    num_partitions=num_partitions)
    far, _ = far_node(b1)
    b2 = bfs_depths(eu, [far], max_rounds=max_rounds,
                    num_partitions=num_partitions)
    _, ecc = far_node(b2)
    return pd.DataFrame({
        "seed": [seed], "peripheral": [far],
        "diameter_lb": pd.array([ecc], dtype="int64"),
    })


def neighbor_agg(
    edges: "ray.data.Dataset",
    feats: "ray.data.Dataset",
    feat_cols: list,
    node_col: str = "node",
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Neighbor feature aggregation — the GNN-prep smoothing step
    (SGC / LightGCN's propagate-then-train recipe, one hop): for each
    DESTINATION node of an (s, o) edge Dataset, the mean of every
    ``feat_cols`` feature over its in-neighbors' rows in ``feats``
    (node_col + numeric columns) → Dataset (node, n_nbrs:int64,
    <col>_mean… — FLOOR-truncated at 1e-6, the float-parity
    convention). Parallel edges weigh individually (message-passing
    semantics); edges whose source has no feature row contribute
    nothing (and don't count in n_nbrs).

    Scale shape: ONE tag-union-bucket shuffle keyed on the source ships
    feature rows onto edges (the table is never broadcast); per-batch
    (dst, sum…, count) partials then ONE dst-bucket reduce. Driver sees
    nothing."""
    if not feat_cols:
        raise ValueError("neighbor_agg: feat_cols must be non-empty")
    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())

    fcols = list(feat_cols)

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"k": df["s"], "dst": df["o"],
                            "_side": np.int8(0)})
        for c in fcols:
            out[c] = np.float64(0.0)
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def tag_feat(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"k": df[node_col], "dst": df[node_col],
                            "_side": np.int8(1)})
        for c in fcols:
            out[c] = df[c].to_numpy(dtype=np.float64)
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def ship(g: pd.DataFrame) -> pd.DataFrame:
        el = g.loc[g["_side"] == 0, ["k", "dst"]]
        ft = g.loc[g["_side"] == 1, ["k"] + fcols].drop_duplicates("k")
        m = el.merge(ft, on="k", how="inner")
        part = m.groupby("dst", as_index=False).agg(
            **{c: (c, "sum") for c in fcols},
            n_nbrs=("k", "size"),
        )
        part["n_nbrs"] = part["n_nbrs"].astype(np.int64)
        return part.assign(_bucket=bucket_tag(part, "dst", num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("dst", as_index=False).agg(
            **{c: (c, "sum") for c in fcols},
            n_nbrs=("n_nbrs", "sum"),
        )
        res = pd.DataFrame({"node": out["dst"],
                            "n_nbrs": out["n_nbrs"].astype(np.int64)})
        n = out["n_nbrs"].to_numpy(dtype=np.float64)
        for c in fcols:
            res[f"{c}_mean"] = np.floor(
                out[c].to_numpy(dtype=np.float64) / n * 1e6) / 1e6
        return res

    return (
        edges.map_batches(tag_edge, batch_format="pandas")
        .union(feats.map_batches(tag_feat, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(ship, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def k_truss(
    edges: "ray.data.Dataset",
    k: int,
    max_rounds: int = 64,
    num_buckets: int | None = None,
    hub_threshold: int = 1_000_000,
    max_salts: int = 64,
) -> "ray.data.Dataset":
    """k-truss of the UNDIRECTED simple graph (Cohen 2008): the maximal
    subgraph where every edge participates in ≥ k−2 triangles of the
    subgraph → Dataset (id_a, id_b) of surviving edges (a < b). The
    edge-level cohesion filter one notch stronger than k-core —
    standard for spam-farm / link-ring detection on web graphs.

    Peeling rounds: recompute per-edge triangle support over the
    CURRENT edge set (the shared ``_closed_triangles`` wedge-close with
    hub pre-split), drop edges below k−2, repeat until no edge drops
    (the classic fixpoint — each round is triangle cost, round count ≤
    the peel depth). ``max_rounds`` exhaustion with edges still
    dropping fails loudly. Support counting is one explode + one
    edge-bucket reduce; the driver sees only per-round edge counts."""
    if k < 2:
        raise ValueError(f"k must be ≥ 2: {k}")
    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())
    need = k - 2
    e = _canon_dedup_edges(edges, num_buckets)
    n_edges = e.count()

    def support_tag(df: pd.DataFrame) -> pd.DataFrame:
        g = pd.concat([
            pd.DataFrame({"id_a": df["a"], "id_b": df["b"]}),
            pd.DataFrame({"id_a": df["a"], "id_b": df["c"]}),
            pd.DataFrame({"id_a": df["b"], "id_b": df["c"]}),
        ], ignore_index=True)
        g = g.groupby(["id_a", "id_b"], as_index=False).size().rename(
            columns={"size": "sup"})
        g["sup"] = g["sup"].astype(np.int64)
        return g.assign(
            _bucket=pair_bucket_tag(g, ["id_a", "id_b"], num_buckets))

    def keep_tag(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["id_a", "id_b"]].assign(sup=np.int64(0))
        return out.assign(
            _bucket=pair_bucket_tag(out, ["id_a", "id_b"], num_buckets))

    def filter_bucket(g: pd.DataFrame, _need=need) -> pd.DataFrame:
        # edge rows (sup=0 carriers) + support partials meet per bucket
        out = g.groupby(["id_a", "id_b"], as_index=False)["sup"].sum()
        out = out.loc[out["sup"] >= _need, ["id_a", "id_b"]]
        return out

    for _ in range(max_rounds):
        if n_edges == 0:
            return e
        if need == 0:
            return e  # 2-truss = the simple graph itself
        closed = _closed_triangles(e, num_buckets, hub_threshold,
                                   max_salts).materialize()
        if closed.schema(fetch_if_missing=True) is None:
            # no triangles at all → no edge reaches any support; keep
            # the (id_a, id_b) schema for downstream readers
            return e.map_batches(lambda df: df.head(0),
                                 batch_format="pandas")
        kept = (
            closed.map_batches(support_tag, batch_format="pandas")
            .union(e.map_batches(keep_tag, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(filter_bucket, batch_format="pandas")
            .materialize()
        )
        n_kept = kept.count()
        if n_kept == n_edges:
            return kept
        e, n_edges = kept, n_kept
    raise ValueError(
        f"k_truss did not converge in {max_rounds} peel rounds"
    )


def modularity(
    edges: "ray.data.Dataset",
    labels: "ray.data.Dataset",
    num_buckets: int | None = None,
) -> float:
    """Newman modularity Q of a (node, label) partition over the
    UNDIRECTED simple graph induced by an (s, o) edge Dataset →
    scalar float: Q = Σ_c [ e_c/m − (D_c/(2m))² ] with e_c the
    intra-community edge count, D_c the community degree sum, m the
    simple-edge count. The quality score for label_propagation / SCC /
    component partitions. ``labels`` must hold ONE row per node; a node
    missing a label fails loudly (its edges would silently vanish from
    the inner joins).

    Scale shape: canonical dedup → two label joins (assortativity's
    pattern, key dtype restored between them) → per-batch (label,
    intra, dsum) count partials → one label-bucket reduce → per-label
    Q terms → one ungrouped Sum. Driver sees m and Q only."""
    from ray.data.aggregate import Sum

    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())
    e = _canon_dedup_edges(edges, num_buckets)
    m = e.count()
    if m == 0:
        raise ValueError("modularity: no edges")

    la = bindings_join(
        e.map_batches(
            lambda df: df.rename(columns={"id_a": "node"}),
            batch_format="pandas"),
        labels.map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "la": df["label"]}),
            batch_format="pandas"),
        on=["node"], how="inner", num_buckets=num_buckets,
    ).map_batches(
        # free the 'node' name for the second join's key (a duplicate
        # column would shadow the rename below)
        lambda df: df.rename(columns={"node": "id_a"}),
        batch_format="pandas",
    )
    from ..shuffle import np_key_dtype

    key_dt = np_key_dtype(labels, "node")

    def rekey(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"id_b": "node"})
        if key_dt is not None:
            out["node"] = out["node"].astype(key_dt)
        return out

    lab = bindings_join(
        la.map_batches(rekey, batch_format="pandas"),
        labels.map_batches(
            lambda df: pd.DataFrame({"node": df["node"],
                                     "lb": df["label"]}),
            batch_format="pandas"),
        on=["node"], how="inner", num_buckets=num_buckets,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        a = df["la"].to_numpy()
        b = df["lb"].to_numpy()
        intra = pd.DataFrame({"label": a[a == b]}).groupby(
            "label", as_index=False).size().rename(
            columns={"size": "intra"})
        dsum = pd.DataFrame(
            {"label": np.concatenate([a, b])}
        ).groupby("label", as_index=False).size().rename(
            columns={"size": "dsum"})
        g = dsum.merge(intra, on="label", how="left")
        g["intra"] = g["intra"].fillna(0).astype(np.int64)
        g["dsum"] = g["dsum"].astype(np.int64)
        return g.assign(_bucket=bucket_tag(g, "label", num_buckets))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("label", as_index=False)[["intra", "dsum"]].sum()
        t = out["dsum"].to_numpy(dtype=np.float64) / (2.0 * m)
        return pd.DataFrame({
            "q": out["intra"].to_numpy(dtype=np.float64) / m - t * t,
            "edges2": out["dsum"].astype(np.int64),
        })

    agg = (
        lab.map_batches(partial, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .aggregate(Sum(on="q", alias_name="q"),
                   Sum(on="edges2", alias_name="edges2"))
    )
    if not agg or agg.get("edges2") is None:
        raise ValueError("modularity: label join produced no rows — "
                         "labels missing for every node")
    if int(agg["edges2"]) != 2 * m:
        raise ValueError(
            f"modularity: {m - int(agg['edges2']) // 2} of {m} edges "
            "lost label rows — labels must cover every incident node "
            "exactly once"
        )
    return float(agg["q"])


def bfs_depths(
    edges: "ray.data.Dataset",
    seeds,
    src: str = "s",
    dst: str = "o",
    max_depth: int | None = None,
    max_rounds: int = 64,
    num_partitions: int | None = None,
    broadcast_limit: int = 500_000,
) -> "ray.data.Dataset":
    """Multi-source BFS: shortest hop count from any seed, over a
    DIRECTED (src, dst) edge Dataset → Dataset (node, depth). Seeds get
    depth 0; unreachable nodes are absent. ``max_depth`` stops cleanly
    at that radius (nodes first reached deeper are excluded — the
    SQL-replayable form); without it, exhausting ``max_rounds`` with a
    live frontier raises loudly rather than returning a silent prefix.

    Frontier rounds, 100-TB discipline:

    - **expansion**: while the frontier fits ``broadcast_limit`` rows it
      is broadcast ONCE per round via ``ray.put`` (a set lookup inside
      map_batches — the edge set never shuffles); a wider frontier falls
      back to the tag-union-bucket shuffle keyed on ``src`` (the same
      acero-safe pattern as ``shuffle.kv_join``). Real web graphs hit
      their widest frontier at depth 2-4 — exactly when the shuffle
      path takes over — then shrink back under the broadcast limit.
    - **dedup + visited-check + dist update, fused**: ONE bucket
      shuffle per round unions the candidate successors with the
      visited set, keyed on node; the per-bucket kernel drops
      already-visited nodes and intra-round duplicates in one
      vectorized pass and emits the FULL updated visited set for its
      bucket with a ``_new`` flag — so the round's only shuffle also
      rebuilds dist (no separate union execution; measured 2→1
      executions/round ≈ half the fixed cost on small inputs). The
      frontier count / extraction are map-only passes over the
      already-materialized blocks.
    - the visited set is snapped + ``repartition``-bounded per round
      (iterated-groupby block-explosion lesson, CLAUDE.md); the driver
      only ever sees per-round frontier COUNTS, never node sets
      (except a frontier that chose the broadcast path, ≤ limit rows).

    Rounds are O(effective diameter) — single digits on web-scale link
    graphs (the reference's KG adjacency is exactly that shape).
    """
    import ray
    import ray.data as rd

    seed_list = sorted(set(seeds))
    if not seed_list:
        raise ValueError("bfs_depths requires at least one seed node")
    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())

    dist = rd.from_pandas(
        pd.DataFrame({"node": seed_list}).assign(
            depth=np.int64(0), _new=True
        )
    ).materialize()
    total = len(seed_list)
    frontier_nodes = np.asarray(seed_list)  # broadcast form (small)
    frontier_ds = None  # shuffle form (wide frontier)
    depth = 0

    while True:
        depth += 1
        if max_depth is not None and depth > max_depth:
            break
        if depth > max_rounds:
            raise RuntimeError(
                f"bfs_depths: frontier still live after {max_rounds} "
                "rounds — raise max_rounds (graph deeper than expected) "
                "or set max_depth for a bounded-radius query"
            )

        # -- expansion: frontier ⋈ edges on src → candidate successors
        if frontier_nodes is not None:
            f_ref = ray.put(frontier_nodes)

            def expand(df: pd.DataFrame) -> pd.DataFrame:
                f = ray.get(f_ref)
                hit = df[df[src].isin(f)]
                return pd.DataFrame({"node": hit[dst].unique()})

            cand = edges.map_batches(expand, batch_format="pandas")
        else:
            nb = num_partitions

            def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({"k": df[src], "node": df[dst]})
                out["_side"] = np.int8(0)
                return out.assign(_bucket=bucket_tag(out, "k", nb))

            def tag_frontier(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({"k": df["node"], "node": df["node"]})
                out["_side"] = np.int8(1)
                return out.assign(_bucket=bucket_tag(out, "k", nb))

            def expand_bucket(g: pd.DataFrame) -> pd.DataFrame:
                f = g.loc[g["_side"] == 1, "k"]
                hit = g.loc[g["_side"] == 0]
                hit = hit[hit["k"].isin(set(f))]
                return pd.DataFrame({"node": hit["node"].unique()})

            cand = (
                edges.map_batches(tag_edge, batch_format="pandas")
                .union(
                    frontier_ds.map_batches(
                        tag_frontier, batch_format="pandas"
                    )
                )
                .groupby("_bucket")
                .map_groups(expand_bucket, batch_format="pandas")
            )

        # -- dedup + visited-check: one bucket shuffle, exact new frontier
        nb2 = num_partitions
        d_now = depth

        def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
            out = df.assign(depth=np.int64(d_now), _side=np.int8(0))
            return out.assign(_bucket=bucket_tag(out, "node", nb2))

        def tag_dist(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["node", "depth"]].assign(_side=np.int8(1))
            return out.assign(_bucket=bucket_tag(out, "node", nb2))

        def new_bucket(g: pd.DataFrame) -> pd.DataFrame:
            old = g.loc[g["_side"] == 1, ["node", "depth"]].assign(
                _new=False
            )
            c = g.loc[g["_side"] == 0, ["node", "depth"]]
            c = c[~c["node"].isin(set(old["node"]))].drop_duplicates(
                "node"
            ).assign(_new=True)
            # full updated visited set for this bucket — the round's
            # ONLY shuffle also rebuilds dist
            return pd.concat([old, c], ignore_index=True)

        # snap_lineage (NOT bare materialize): dist feeds back into the
        # next round's plan, and materialize alone keeps the logical
        # plan — each round then replays the whole history (measured
        # per-round wall time DOUBLING from ~round 8). Snapping rebases
        # each round on the computed blocks; O(diameter) rounds stay
        # O(1) cost each.
        dist = snap_lineage(
            cand.map_batches(tag_cand, batch_format="pandas")
            .union(dist.map_batches(tag_dist, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(new_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

        # the visited set only grows, so this round's frontier size is
        # the row-count DELTA — free metadata on the snapped dataset,
        # no counting execution
        new_total = dist.count()
        n_new = new_total - total
        total = new_total
        if n_new == 0:
            break

        frontier = dist.map_batches(
            lambda df: df.loc[df["_new"], ["node"]],
            batch_format="pandas",
        )
        if n_new <= broadcast_limit:
            frontier_nodes = frontier.to_pandas()["node"].to_numpy()
            frontier_ds = None
        else:
            frontier_nodes = None
            frontier_ds = frontier

    return dist.map_batches(
        lambda df: df[["node", "depth"]], batch_format="pandas"
    )


def sssp(
    edges: "ray.data.Dataset",
    seeds,
    src: str = "s",
    dst: str = "o",
    weight: str = "w",
    max_hops: int | None = None,
    max_rounds: int = 64,
    num_partitions: int | None = None,
    broadcast_limit: int = 500_000,
) -> "ray.data.Dataset":
    """Single/multi-source shortest paths (Bellman-Ford frontier
    relaxation) over a weighted directed (src, dst, weight) edge
    Dataset → Dataset (node, dist). Seeds start at 0; unreachable nodes
    are absent. Weights must be non-negative (validated distributedly,
    loud failure — negative-cycle semantics are a different operator).

    ``max_hops=H`` bounds the relaxation to exactly H rounds, making
    the result "min distance over paths of ≤ H edges" — the
    SQL-replayable form (a hop-bounded recursive CTE computes the same
    set). Without it, rounds run to convergence (empty frontier) and
    exhausting ``max_rounds`` raises rather than returning a silent
    prefix.

    Per round, 100-TB shape (mirrors ``bfs_depths``):

    - **relax**: frontier ≤ ``broadcast_limit`` rows → ``ray.put`` a
      (node → dist) map once, probe inside map_batches (edges never
      shuffle); wider frontier → tag-union-bucket shuffle on ``src``.
      Both paths min-combine candidates within batch/bucket before the
      next shuffle (map-side combiner).
    - **improve**: ONE bucket shuffle keyed on node unions candidates
      with the current dist table; the per-bucket kernel takes the min
      and flags strict improvements — output is the full updated dist
      for that bucket, so the dist table is rebuilt (not appended) and
      stays exactly one row per reached node.
    - dist/frontier lineage snapped per round (``shuffle.snap_lineage``);
      the driver sees per-round improvement COUNTS (plus a frontier that
      chose the broadcast path, ≤ limit rows by definition).
    """
    import ray
    import ray.data as rd

    seed_list = sorted(set(seeds))
    if not seed_list:
        raise ValueError("sssp requires at least one seed node")
    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())

    # distributed non-negativity check: one tiny row per block
    def wmin(df: pd.DataFrame) -> pd.DataFrame:
        w = df[weight].to_numpy(np.float64)
        return pd.DataFrame({"m": [float(w.min()) if len(w) else 0.0]})

    mins = edges.map_batches(wmin, batch_format="pandas").take_all()
    if mins and min(r["m"] for r in mins) < 0:
        raise ValueError(
            "sssp requires non-negative edge weights "
            f"(min weight {min(r['m'] for r in mins)})"
        )

    dist = rd.from_pandas(
        pd.DataFrame({"node": seed_list}).assign(dist=np.float64(0.0))
    ).materialize()
    frontier_pdf = pd.DataFrame(
        {"node": seed_list, "dist": np.float64(0.0)}
    )  # broadcast form
    frontier_ds = None
    rounds = 0

    while True:
        rounds += 1
        if max_hops is not None and rounds > max_hops:
            break
        if rounds > max_rounds:
            raise RuntimeError(
                f"sssp: frontier still improving after {max_rounds} "
                "rounds — raise max_rounds or set max_hops for the "
                "hop-bounded form"
            )

        # -- relax: frontier ⋈ edges on src → (node=dst, cand dist)
        if frontier_pdf is not None:
            f_ref = ray.put(
                dict(zip(frontier_pdf["node"], frontier_pdf["dist"]))
            )

            def relax(df: pd.DataFrame) -> pd.DataFrame:
                fmap = ray.get(f_ref)
                hit = df[df[src].isin(fmap)]
                if hit.empty:
                    return pd.DataFrame(
                        {"node": pd.Series([], dtype=df[dst].dtype),
                         "dist": pd.Series([], dtype=np.float64)}
                    )
                d = hit[src].map(fmap).to_numpy(np.float64) + hit[
                    weight
                ].to_numpy(np.float64)
                out = pd.DataFrame({"node": hit[dst], "dist": d})
                return out.groupby("node", as_index=False)["dist"].min()

            cand = edges.map_batches(relax, batch_format="pandas")
        else:
            nb = num_partitions

            def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame(
                    {
                        "k": df[src],
                        "node": df[dst],
                        "dist": df[weight].astype(np.float64),
                        "_side": np.int8(0),
                    }
                )
                return out.assign(_bucket=bucket_tag(out, "k", nb))

            def tag_frontier(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame(
                    {
                        "k": df["node"],
                        "node": df["node"],
                        "dist": df["dist"].astype(np.float64),
                        "_side": np.int8(1),
                    }
                )
                return out.assign(_bucket=bucket_tag(out, "k", nb))

            def relax_bucket(g: pd.DataFrame) -> pd.DataFrame:
                f = g.loc[g["_side"] == 1, ["k", "dist"]].rename(
                    columns={"dist": "fdist"}
                )
                el = g.loc[g["_side"] == 0, ["k", "node", "dist"]]
                hit = el.merge(f, on="k", how="inner")
                if hit.empty:
                    return pd.DataFrame(
                        {"node": pd.Series([], dtype=el["node"].dtype),
                         "dist": pd.Series([], dtype=np.float64)}
                    )
                hit["dist"] = hit["dist"] + hit["fdist"]
                return hit.groupby("node", as_index=False)["dist"].min()

            cand = (
                edges.map_batches(tag_edge, batch_format="pandas")
                .union(
                    frontier_ds.map_batches(
                        tag_frontier, batch_format="pandas"
                    )
                )
                .groupby("_bucket")
                .map_groups(relax_bucket, batch_format="pandas")
            )

        # -- improve: candidates ∪ dist → per-node min + strict-improve
        nb2 = num_partitions

        def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
            out = df.assign(_side=np.int8(0))
            return out.assign(_bucket=bucket_tag(out, "node", nb2))

        def tag_dist(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["node", "dist"]].assign(_side=np.int8(1))
            return out.assign(_bucket=bucket_tag(out, "node", nb2))

        def improve_bucket(g: pd.DataFrame) -> pd.DataFrame:
            cur = g.loc[g["_side"] == 1, ["node", "dist"]]
            cn = (
                g.loc[g["_side"] == 0, ["node", "dist"]]
                .groupby("node", as_index=False)["dist"]
                .min()
                .rename(columns={"dist": "cand"})
            )
            merged = cur.merge(cn, on="node", how="outer")
            cand_v = merged["cand"].to_numpy(np.float64)
            cur_v = merged["dist"].to_numpy(np.float64)
            better = np.where(
                np.isnan(cur_v), cand_v, np.fmin(cur_v, cand_v)
            )
            improved = np.isnan(cur_v) | (
                ~np.isnan(cand_v) & (cand_v < cur_v)
            )
            return pd.DataFrame(
                {
                    "node": merged["node"],
                    "dist": better,
                    "_improved": improved,
                }
            )

        # the round's ONLY snapped execution: the improve shuffle's
        # output IS the new dist table (the _improved flag rides along
        # and is stripped at return); frontier count/extraction are
        # map-only passes over the materialized blocks
        dist = snap_lineage(
            cand.map_batches(tag_cand, batch_format="pandas")
            .union(dist.map_batches(tag_dist, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(improve_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

        def count_improved(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n": [int(df["_improved"].sum())]})

        n_improved = int(
            sum(
                r["n"]
                for r in dist.map_batches(
                    count_improved, batch_format="pandas"
                ).take_all()
            )
        )
        if n_improved == 0:
            break
        new = dist.map_batches(
            lambda df: df.loc[df["_improved"], ["node", "dist"]],
            batch_format="pandas",
        )
        if n_improved <= broadcast_limit:
            frontier_pdf = new.to_pandas()
            frontier_ds = None
        else:
            frontier_pdf = None
            frontier_ds = new

    return dist.map_batches(
        lambda df: df[["node", "dist"]], batch_format="pandas"
    )


def temporal_reach(
    edges: "ray.data.Dataset",
    seeds,
    src: str = "s",
    dst: str = "o",
    ts: str = "t",
    start: float = 0.0,
    max_hops: int | None = None,
    max_rounds: int = 64,
    num_partitions: int | None = None,
    broadcast_limit: int = 500_000,
) -> "ray.data.Dataset":
    """Earliest-arrival reachability over a TEMPORAL directed edge
    Dataset (src, dst, ts): an edge is traversable only at its
    timestamp, and only if that timestamp is ≥ the arrival time at its
    source — the time-respecting-path semantics of temporal graphs
    (contact networks, citation flows, link rot). Seeds start at
    ``start``; → Dataset (node, arrival:float64) with the minimal
    arrival per reachable node (seeds themselves report ``start``).

    Same Bellman-Ford frontier discipline as ``sssp`` (broadcast relax
    under ``broadcast_limit``, tag-union-bucket shuffle above; one
    improve shuffle rebuilds the arrival table per round; lineage
    snapped; the driver sees improvement counts). ``max_hops=H`` gives
    the hop-bounded SQL-replayable form; without it, round exhaustion
    raises loudly."""
    import ray
    import ray.data as rd

    seed_list = sorted(set(seeds))
    if not seed_list:
        raise ValueError("temporal_reach requires at least one seed")
    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())

    arr = rd.from_pandas(
        pd.DataFrame({"node": seed_list}).assign(
            arrival=np.float64(start))
    ).materialize()
    frontier_pdf = pd.DataFrame(
        {"node": seed_list, "arrival": np.float64(start)}
    )
    frontier_ds = None
    rounds = 0

    while True:
        rounds += 1
        if max_hops is not None and rounds > max_hops:
            break
        if rounds > max_rounds:
            raise RuntimeError(
                f"temporal_reach: frontier still improving after "
                f"{max_rounds} rounds — raise max_rounds or set "
                "max_hops for the hop-bounded form"
            )

        if frontier_pdf is not None:
            f_ref = ray.put(dict(zip(frontier_pdf["node"],
                                     frontier_pdf["arrival"])))

            def relax(df: pd.DataFrame) -> pd.DataFrame:
                fmap = ray.get(f_ref)
                hit = df[df[src].isin(fmap)]
                if hit.empty:
                    return pd.DataFrame(
                        {"node": pd.Series([], dtype=df[dst].dtype),
                         "arrival": pd.Series([], dtype=np.float64)})
                t = hit[ts].to_numpy(np.float64)
                ok = t >= hit[src].map(fmap).to_numpy(np.float64)
                out = pd.DataFrame({"node": hit[dst].to_numpy()[ok],
                                    "arrival": t[ok]})
                return out.groupby("node",
                                   as_index=False)["arrival"].min()

            cand = edges.map_batches(relax, batch_format="pandas")
        else:
            nb = num_partitions

            def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({
                    "k": df[src], "node": df[dst],
                    "arrival": df[ts].astype(np.float64),
                    "_side": np.int8(0)})
                return out.assign(_bucket=bucket_tag(out, "k", nb))

            def tag_frontier(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame({
                    "k": df["node"], "node": df["node"],
                    "arrival": df["arrival"].astype(np.float64),
                    "_side": np.int8(1)})
                return out.assign(_bucket=bucket_tag(out, "k", nb))

            def relax_bucket(g: pd.DataFrame) -> pd.DataFrame:
                f = g.loc[g["_side"] == 1, ["k", "arrival"]].rename(
                    columns={"arrival": "farr"})
                el = g.loc[g["_side"] == 0, ["k", "node", "arrival"]]
                hit = el.merge(f, on="k", how="inner")
                hit = hit.loc[hit["arrival"] >= hit["farr"]]
                if hit.empty:
                    return pd.DataFrame(
                        {"node": pd.Series([], dtype=el["node"].dtype),
                         "arrival": pd.Series([], dtype=np.float64)})
                return hit.groupby("node",
                                   as_index=False)["arrival"].min()

            cand = (
                edges.map_batches(tag_edge, batch_format="pandas")
                .union(frontier_ds.map_batches(tag_frontier,
                                               batch_format="pandas"))
                .groupby("_bucket")
                .map_groups(relax_bucket, batch_format="pandas")
            )

        nb2 = num_partitions

        def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
            out = df.assign(_side=np.int8(0))
            return out.assign(_bucket=bucket_tag(out, "node", nb2))

        def tag_arr(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["node", "arrival"]].assign(_side=np.int8(1))
            return out.assign(_bucket=bucket_tag(out, "node", nb2))

        def improve_bucket(g: pd.DataFrame) -> pd.DataFrame:
            cur = g.loc[g["_side"] == 1, ["node", "arrival"]]
            cn = (g.loc[g["_side"] == 0, ["node", "arrival"]]
                  .groupby("node", as_index=False)["arrival"].min()
                  .rename(columns={"arrival": "cand"}))
            merged = cur.merge(cn, on="node", how="outer")
            cand_v = merged["cand"].to_numpy(np.float64)
            cur_v = merged["arrival"].to_numpy(np.float64)
            better = np.where(np.isnan(cur_v), cand_v,
                              np.fmin(cur_v, cand_v))
            improved = np.isnan(cur_v) | (
                ~np.isnan(cand_v) & (cand_v < cur_v))
            return pd.DataFrame({"node": merged["node"],
                                 "arrival": better,
                                 "_improved": improved})

        arr = snap_lineage(
            cand.map_batches(tag_cand, batch_format="pandas")
            .union(arr.map_batches(tag_arr, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(improve_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

        n_improved = int(sum(
            r["n"] for r in arr.map_batches(
                lambda df: pd.DataFrame(
                    {"n": [int(df["_improved"].sum())]}),
                batch_format="pandas",
            ).take_all()
        ))
        if n_improved == 0:
            break
        new = arr.map_batches(
            lambda df: df.loc[df["_improved"], ["node", "arrival"]],
            batch_format="pandas",
        )
        if n_improved <= broadcast_limit:
            frontier_pdf = new.to_pandas()
            frontier_ds = None
        else:
            frontier_pdf = None
            frontier_ds = new

    return arr.map_batches(
        lambda df: df[["node", "arrival"]], batch_format="pandas"
    )


def node_jaccard(
    edges: "ray.data.Dataset",
    min_common: int = 1,
    max_degree: int | None = None,
    num_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Common-neighbor Jaccard similarity over the UNDIRECTED simple
    graph induced by an (s, o) edge Dataset → Dataset
    (a, b, common, jaccard) for every pair a < b with
    |N(a) ∩ N(b)| ≥ ``min_common``, where
    jaccard = |N(a) ∩ N(b)| / |N(a) ∪ N(b)|
            = common / (deg(a) + deg(b) − common).
    The classic link-prediction / entity-resolution primitive over the
    materialized KG adjacency.

    Three shuffles, degrees RIDE the wedges (no post-hoc join):

    1. canonicalize + distributed dedup (``shuffle.dedup_pairs``), then
       symmetrize to (n, m) adjacency rows and attach deg(n) with one
       tag-union-bucket shuffle keyed on n (deg itself comes from the
       ``out_degrees`` combiner — map-side partials, narrow rows);
    2. wedge pairs: bucket on the MIDDLE node m; per bucket one
       vectorized self-merge per group emits (a, b, da, db) with a < b,
       plus a within-bucket groupby-count combiner;
    3. global (a, b) pair-bucket groupby-sum → common counts; degrees
       ride via first() (constant per node); jaccard computed in the
       same kernel; ``min_common`` filters before anything widens.

    Hub seam, counted: a middle of degree d contributes d·(d−1)/2 pairs
    in one bucket (the triangle-wedge skew). ``max_degree`` excludes
    middles whose NEIGHBOR LIST exceeds it — group size is visible for
    free inside the wedge bucket — incrementing the
    ``jaccard_hub_middles_skipped`` metric (no-silent-caps rule: pairs
    whose ONLY common neighbors are excluded hubs are absent from the
    output, which is the standard super-node exclusion in similarity
    mining; leave None for exact results)."""
    from .. import metrics

    if num_buckets is None:
        num_buckets = _auto_partitions(edges.count())

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy()
        o = df["o"].to_numpy()
        keep = s != o
        s, o = s[keep], o[keep]
        return pd.DataFrame(
            {"id_a": np.minimum(s, o), "id_b": np.maximum(s, o)}
        ).drop_duplicates()

    und = dedup_pairs(
        edges.map_batches(canon, batch_format="pandas"),
        num_buckets=num_buckets,
    ).materialize()

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n": pd.concat([df["id_a"], df["id_b"]], ignore_index=True),
                "m": pd.concat([df["id_b"], df["id_a"]], ignore_index=True),
            }
        )

    adj = und.map_batches(both_dirs, batch_format="pandas").materialize()
    deg = out_degrees(adj, src="n", num_buckets=num_buckets)

    # attach deg(n) to adjacency rows: one tag-union-bucket shuffle on n
    def tag_adj(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"k": df["n"], "m": df["m"], "d": np.int64(0),
             "_side": np.int8(0)}
        )
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"k": df["node"], "m": df["node"],
             "d": df["out_deg"].astype(np.int64), "_side": np.int8(1)}
        )
        return out.assign(_bucket=bucket_tag(out, "k", num_buckets))

    def attach_bucket(g: pd.DataFrame) -> pd.DataFrame:
        a = g.loc[g["_side"] == 0, ["k", "m"]]
        dd = g.loc[g["_side"] == 1, ["k", "d"]]
        out = a.merge(dd, on="k", how="inner")
        return out.rename(columns={"k": "n"})[["n", "m", "d"]]

    adj_d = (
        adj.map_batches(tag_adj, batch_format="pandas")
        .union(deg.map_batches(tag_deg, batch_format="pandas"))
        .groupby("_bucket")
        .map_groups(attach_bucket, batch_format="pandas")
    )

    # wedge pairs per middle m (bucketed on m), degrees riding
    def tag_mid(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=bucket_tag(df, "m", num_buckets))

    def wedge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g[["n", "m", "d"]]
        if max_degree is not None:
            sizes = g.groupby("m")["n"].transform("size")
            hot = sizes > max_degree
            if bool(hot.any()):
                metrics.incr(
                    "jaccard_hub_middles_skipped",
                    int(g.loc[hot, "m"].nunique()),
                )
                g = g.loc[~hot]
        p = g.merge(g, on="m", suffixes=("_x", "_y"))
        p = p[p["n_x"] < p["n_y"]]
        out = pd.DataFrame(
            {
                "a": p["n_x"], "b": p["n_y"],
                "da": p["d_x"].astype(np.int64),
                "db": p["d_y"].astype(np.int64),
            }
        )
        # within-bucket combiner before the pair shuffle
        return out.groupby(["a", "b"], as_index=False).agg(
            da=("da", "first"), db=("db", "first"),
            common=("da", "size"),
        )

    pairs = (
        adj_d.map_batches(tag_mid, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(wedge_bucket, batch_format="pandas")
    )

    def tag_pair(df: pd.DataFrame) -> pd.DataFrame:
        return df.assign(_bucket=pair_bucket_tag(df, ["a", "b"],
                                                 num_buckets))

    def reduce_pair(g: pd.DataFrame, _mc=min_common) -> pd.DataFrame:
        out = g.groupby(["a", "b"], as_index=False).agg(
            da=("da", "first"), db=("db", "first"),
            common=("common", "sum"),
        )
        out = out[out["common"] >= _mc]
        c = out["common"].to_numpy(np.float64)
        union = (
            out["da"].to_numpy(np.float64)
            + out["db"].to_numpy(np.float64) - c
        )
        return pd.DataFrame(
            {
                "a": out["a"], "b": out["b"],
                "common": out["common"].astype(np.int64),
                "jaccard": c / union,
            }
        )

    return (
        pairs.map_batches(tag_pair, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_pair, batch_format="pandas")
    )


def k_core(
    edges: "ray.data.Dataset",
    k: int,
    num_rounds: int | None = None,
    max_rounds: int = 64,
    num_partitions: int | None = None,
    broadcast_limit: int = 500_000,
) -> "ray.data.Dataset":
    """k-core of the UNDIRECTED simple graph induced by an (s, o) edge
    Dataset: iteratively peel nodes of degree < k until the remainder
    is stable → Dataset (node, deg) with deg = the node's degree INSIDE
    the core. The standard subgraph-density primitive (spam/boilerplate
    site clusters, KG hub extraction).

    ``num_rounds=R`` runs EXACTLY R peels (converged rounds are no-ops)
    — the SQL-replayable form: an oracle unrolls the same R rounds of
    degree-filter-join CTEs and gets the identical remainder. Without
    it, peeling runs to fixpoint and exhausting ``max_rounds`` raises
    loudly.

    Per round, 100-TB shape:

    - degree: ``out_degrees`` (map-side combiner + one bucket shuffle);
      the dropped set = nodes with deg < k, counted per block (driver
      sees one int).
    - prune: dropped ≤ ``broadcast_limit`` rows → ``ray.put`` the node
      set once and filter adjacency in map_batches (the common case —
      after round 1 peeling drops few nodes per round); a wider dropped
      set (round 1 on a heavy-tailed web graph can shed most nodes)
      → TWO bespoke tag-union-bucket anti shuffles (keyed on n then m)
      with fully-typed identical schemas on both sides (the
      bindings_join object-fill dtype trap, CLAUDE.md, doesn't apply).
    - adjacency lineage snapped per round (``shuffle.snap_lineage``).
    """
    import ray

    if k < 1:
        raise ValueError("k_core requires k >= 1")
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        s = df["s"].to_numpy()
        o = df["o"].to_numpy()
        keep = s != o
        s, o = s[keep], o[keep]
        return pd.DataFrame(
            {"id_a": np.minimum(s, o), "id_b": np.maximum(s, o)}
        ).drop_duplicates()

    und = dedup_pairs(
        edges.map_batches(canon, batch_format="pandas"),
        num_buckets=num_partitions,
    )

    def both_dirs(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n": pd.concat([df["id_a"], df["id_b"]], ignore_index=True),
                "m": pd.concat([df["id_b"], df["id_a"]], ignore_index=True),
            }
        )

    adj = snap_lineage(
        und.map_batches(both_dirs, batch_format="pandas")
        .repartition(num_partitions)
    )

    def anti_shuffle(
        a: "ray.data.Dataset", dropped: "ray.data.Dataset", key: str
    ) -> "ray.data.Dataset":
        """Remove adjacency rows whose ``key`` endpoint is dropped —
        one tag-union-bucket shuffle, schemas typed and identical."""

        def tag_adj(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"k": df[key], "n": df["n"], "m": df["m"],
                 "_side": np.int8(0)}
            )
            return out.assign(
                _bucket=bucket_tag(out, "k", num_partitions)
            )

        def tag_drop(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {"k": df["node"], "n": df["node"], "m": df["node"],
                 "_side": np.int8(1)}
            )
            return out.assign(
                _bucket=bucket_tag(out, "k", num_partitions)
            )

        def bucket(g: pd.DataFrame) -> pd.DataFrame:
            gone = set(g.loc[g["_side"] == 1, "k"])
            rows = g.loc[g["_side"] == 0]
            return rows.loc[~rows["k"].isin(gone), ["n", "m"]]

        return (
            a.map_batches(tag_adj, batch_format="pandas")
            .union(dropped.map_batches(tag_drop, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(bucket, batch_format="pandas")
        )

    rounds = 0
    while True:
        rounds += 1
        if num_rounds is not None and rounds > num_rounds:
            break
        if num_rounds is None and rounds > max_rounds:
            raise RuntimeError(
                f"k_core: still peeling after {max_rounds} rounds — "
                "raise max_rounds or use the fixed num_rounds form"
            )

        deg = snap_lineage(
            out_degrees(adj, src="n", num_buckets=num_partitions)
            .repartition(num_partitions)
        )
        dropped = deg.map_batches(
            lambda df, _k=k: df.loc[df["out_deg"] < _k, ["node"]],
            batch_format="pandas",
        )
        n_dropped = dropped.count()
        if n_dropped == 0:
            if num_rounds is None:
                break
            continue  # fixed-round form: remaining rounds are no-ops

        if n_dropped <= broadcast_limit:
            gone_ref = ray.put(
                set(dropped.to_pandas()["node"].tolist())
            )

            def prune(df: pd.DataFrame) -> pd.DataFrame:
                gone = ray.get(gone_ref)
                return df.loc[
                    ~(df["n"].isin(gone) | df["m"].isin(gone)),
                    ["n", "m"],
                ]

            adj = snap_lineage(
                adj.map_batches(prune, batch_format="pandas")
                .repartition(num_partitions)
            )
        else:
            dropped = snap_lineage(dropped)
            adj = snap_lineage(
                anti_shuffle(
                    anti_shuffle(adj, dropped, "n"), dropped, "m"
                ).repartition(num_partitions)
            )

    # final in-core degrees (one combiner + bucket shuffle)
    return out_degrees(adj, src="n", num_buckets=num_partitions).map_batches(
        lambda df: df.rename(columns={"out_deg": "deg"}),
        batch_format="pandas",
    )


def personalized_pagerank(
    edges: "ray.data.Dataset",
    seeds: list,
    num_iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Personalized PageRank (random walk with restart to a SEED set —
    the KG entity-relatedness score: "importance relative to these
    entities", Haveliwala 2002 topic-sensitive PageRank with a uniform
    seed restart vector). Same power-iteration/shuffle shape as
    ``pagerank``; the restart vector p(v) = 1/|S| for seed nodes
    present in the graph (0 elsewhere) replaces the uniform 1/N:

        rank' = (1-d)·p(v) + d·(Σ_in rank/out_deg + dangling·p(v))

    → Dataset (node, rank), exactly ``num_iters`` rounds (fixed so an
    SQL oracle unrolls the identical computation). Seeds are a small
    bounded list (they ride task closures); raises loudly when NO seed
    is incident to an edge. Per round: two all-to-all shuffles + one
    O(blocks) dangling-mass scalar — identical scale shape to
    ``pagerank``, the seed flag rides the existing carrier rows."""
    from ..shuffle import snap_lineage

    if not seeds:
        raise ValueError("seeds must be non-empty")
    seed_set = frozenset(seeds)

    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())
    edges = edges.repartition(num_partitions).materialize()

    def seed_deg(df: pd.DataFrame) -> pd.DataFrame:
        both = pd.DataFrame(
            {
                "node": pd.concat([df["s"], df["o"]], ignore_index=True),
                "d": np.concatenate(
                    [np.ones(len(df), np.int64),
                     np.zeros(len(df), np.int64)]
                ),
            }
        )
        g = both.groupby("node", as_index=False)["d"].sum()
        return g.assign(_bucket=bucket_tag(g, "node", num_partitions))

    def seed_reduce(g: pd.DataFrame, _s=seed_set) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["d"].sum().rename(
            columns={"d": "out_deg"}
        )
        out["sd"] = out["node"].isin(_s).astype(np.int8)
        return out

    state = (
        edges.map_batches(seed_deg, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(seed_reduce, batch_format="pandas")
        .repartition(num_partitions)
        .materialize()
    )

    def block_scalar(st, col_fn):
        return float(
            sum(r["m"] for r in st.map_batches(
                lambda df: pd.DataFrame({"m": [col_fn(df)]}),
                batch_format="pandas",
            ).take_all())
        )

    n_seed = block_scalar(state, lambda df: float(df["sd"].sum()))
    if n_seed == 0:
        raise ValueError(
            f"no seed of {sorted(seed_set)!r} is incident to any edge"
        )
    p_seed = 1.0 / n_seed

    state = state.map_batches(
        lambda df, _p=p_seed: df.assign(
            rank=df["sd"].astype(np.float64) * _p
        ),
        batch_format="pandas",
    ).materialize()

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "k": df["s"],
                "dst": df["o"],
                "w": np.float64(0.0),
                "deg": np.int64(0),
                "sd": np.int8(0),
                "_side": np.int8(0),
            }
        )
        return out.assign(_bucket=bucket_tag(out, "k", num_partitions))

    def scatter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        el = g.loc[g["_side"] == 0, ["k", "dst"]]
        st = g.loc[g["_side"] == 1, ["k", "w", "deg", "sd"]]
        sent = el.merge(st[["k", "w"]], on="k", how="inner")
        return pd.concat(
            [
                pd.DataFrame(
                    {
                        "dst": sent["dst"],
                        "contrib": sent["w"],
                        "deg": np.int64(0),
                        "sd": np.int8(0),
                    }
                ),
                # carrier: keeps in-degree-0 nodes alive, ships static
                # out_deg AND the seed flag into the gather
                pd.DataFrame(
                    {
                        "dst": st["k"],
                        "contrib": np.float64(0.0),
                        "deg": st["deg"],
                        "sd": st["sd"],
                    }
                ),
            ],
            ignore_index=True,
        )

    for _ in range(num_iters):
        dm = block_scalar(
            state,
            lambda df: float(
                df.loc[df["out_deg"] == 0, "rank"].to_numpy().sum()
            ),
        )
        # rank' = d·Σin + p(v)·((1-d) + d·dm); the p(v) term applies
        # only where the carried seed flag is set
        seed_term = p_seed * ((1.0 - damping) + damping * dm)

        def tag_state(df: pd.DataFrame) -> pd.DataFrame:
            deg = df["out_deg"].to_numpy()
            rank = df["rank"].to_numpy()
            w = np.divide(
                rank, deg, out=np.zeros_like(rank), where=deg > 0
            )
            out = pd.DataFrame(
                {
                    "k": df["node"],
                    "dst": df["node"],
                    "w": w,
                    "deg": df["out_deg"].astype(np.int64),
                    "sd": df["sd"].astype(np.int8),
                    "_side": np.int8(1),
                }
            )
            return out.assign(
                _bucket=bucket_tag(out, "k", num_partitions)
            )

        scattered = (
            edges.map_batches(tag_edges, batch_format="pandas")
            .union(state.map_batches(tag_state, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(scatter_bucket, batch_format="pandas")
        )

        def gather_tag(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("dst", as_index=False).agg(
                contrib=("contrib", "sum"), deg=("deg", "max"),
                sd=("sd", "max"),
            )
            return g.assign(
                _bucket=bucket_tag(g, "dst", num_partitions)
            )

        def gather_bucket(
            g: pd.DataFrame, _st=seed_term, _d=damping
        ) -> pd.DataFrame:
            out = g.groupby("dst", as_index=False).agg(
                contrib=("contrib", "sum"), deg=("deg", "max"),
                sd=("sd", "max"),
            )
            return pd.DataFrame(
                {
                    "node": out["dst"],
                    "out_deg": out["deg"].astype(np.int64),
                    "sd": out["sd"].astype(np.int8),
                    "rank": _d * out["contrib"]
                    + _st * out["sd"].astype(np.float64),
                }
            )

        state = snap_lineage(
            scattered.map_batches(gather_tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(gather_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

    return state.map_batches(
        lambda df: df[["node", "rank"]], batch_format="pandas"
    )


def label_propagation(
    edges: "ray.data.Dataset",
    num_iters: int = 3,
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Synchronous label-propagation community detection (Raghavan et
    al. 2007, the deterministic synchronous variant): label⁰(v) = v;
    each round every node adopts the most frequent label among its
    UNDIRECTED neighbors (parallel edges weigh individually), ties
    break to the smallest label. Fixed ``num_iters`` rounds and
    deterministic ties so an SQL oracle unrolls the identical
    computation (the classic async variant is order-dependent and
    unreplayable). → Dataset (node, label).

    Scale shape: the undirected edge expansion materializes once; per
    round ONE tag-union-bucket scatter (labels meet edges on the source
    node) + ONE dest-bucket gather (vectorized (dst, label) counts →
    per-dst argmax), lineage snapped — the same two-shuffle discipline
    as ``pagerank``. Labels never land on the driver."""
    from ..shuffle import snap_lineage

    def undirect(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "s": pd.concat([df["s"], df["o"]], ignore_index=True),
                "o": pd.concat([df["o"], df["s"]], ignore_index=True),
            }
        )

    eu = edges.map_batches(undirect, batch_format="pandas").materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(eu.count())
    eu = eu.repartition(num_partitions).materialize()

    labels = (
        eu.map_batches(
            lambda df: df[["s"]].drop_duplicates().rename(
                columns={"s": "node"}
            ),
            batch_format="pandas",
        )
        .map_batches(
            lambda df: df.assign(
                _bucket=bucket_tag(df, "node", num_partitions)
            ),
            batch_format="pandas",
        )
        .groupby("_bucket")
        .map_groups(
            lambda g: g.drop_duplicates(subset=["node"]).assign(
                label=lambda d: d["node"]
            )[["node", "label"]],
            batch_format="pandas",
        )
        .repartition(num_partitions)
        .materialize()
    )

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {
                "k": df["s"],
                "dst": df["o"],
                "label": df["s"],  # placeholder on the edge side
                "_side": np.int8(0),
            }
        )
        return out.assign(_bucket=bucket_tag(out, "k", num_partitions))

    def scatter_bucket(g: pd.DataFrame) -> pd.DataFrame:
        el = g.loc[g["_side"] == 0, ["k", "dst"]]
        st = g.loc[g["_side"] == 1, ["k", "label"]]
        sent = el.merge(st, on="k", how="inner")
        # within-bucket combiner: (dst, label) partial counts
        out = sent.groupby(["dst", "label"], as_index=False).size()
        out = out.rename(columns={"size": "c"})
        out["c"] = out["c"].astype(np.int64)
        return out

    for _ in range(num_iters):
        def tag_labels(df: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "k": df["node"],
                    "dst": df["node"],
                    "label": df["label"],
                    "_side": np.int8(1),
                }
            )
            return out.assign(
                _bucket=bucket_tag(out, "k", num_partitions)
            )

        scattered = (
            eu.map_batches(tag_edges, batch_format="pandas")
            .union(labels.map_batches(tag_labels, batch_format="pandas"))
            .groupby("_bucket")
            .map_groups(scatter_bucket, batch_format="pandas")
        )

        def gather_tag(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["dst", "label"], as_index=False)["c"].sum()
            return g.assign(
                _bucket=bucket_tag(g, "dst", num_partitions)
            )

        def gather_bucket(g: pd.DataFrame) -> pd.DataFrame:
            d = g.groupby(["dst", "label"], as_index=False)["c"].sum()
            d = d.sort_values(
                ["dst", "c", "label"], ascending=[True, False, True]
            ).drop_duplicates("dst")
            return pd.DataFrame(
                {"node": d["dst"], "label": d["label"]}
            )

        labels = snap_lineage(
            scattered.map_batches(gather_tag, batch_format="pandas")
            .groupby("_bucket")
            .map_groups(gather_bucket, batch_format="pandas")
            .repartition(num_partitions)
        )

    return labels


def harmonic_centrality(
    edges: "ray.data.Dataset",
    num_seeds: int = 16,
    max_depth: int = 6,
    src: str = "s",
    dst: str = "o",
    num_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Sampled harmonic centrality (Boldi & Vigna, "Axioms for
    Centrality", Internet Math 2014 — the centrality that behaves on
    disconnected graphs): for a deterministic seed sample S,
    ``h(v) = Σ_{s∈S, 0<d(s,v)≤max_depth} 1/d(s,v)``.

    → Dataset (node, h_scaled:int64) with ``h_scaled = h · lcm(1..
    max_depth)`` — every 1/d contribution is an INTEGER, so the sum is
    exact on any engine and the SQL oracle needs no float tolerance.

    Scale shape: seeds are the ``num_seeds`` smallest md5(node) keys
    (distributed sort+limit; SQL-replayable and growth-stable); all
    |S| BFS traversals run FUSED in one ``bfs_depths`` execution via
    composite ``seed\\x1f node`` labels — edges are replicated per seed
    map-side (cost |S|·E scans, the standard price of sampled
    centrality), frontier rounds stay O(diameter), and the per-node
    reduce is one bucket shuffle. Only the seed list (num_seeds rows)
    touches the driver."""
    import math

    import ray
    import ray.data as rd

    from .fasthash import md5_hex

    if num_seeds < 1:
        raise ValueError(f"num_seeds must be ≥ 1: {num_seeds}")
    if max_depth < 1:
        raise ValueError(f"max_depth must be ≥ 1: {max_depth}")
    scale = math.lcm(*range(1, max_depth + 1))

    edges = edges.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(edges.count())

    def nodes_of(df: pd.DataFrame) -> pd.DataFrame:
        n = pd.concat([df[src], df[dst]], ignore_index=True)
        n = n.drop_duplicates().astype(str)
        return pd.DataFrame({"node": n, "h": md5_hex(
            n.to_numpy(dtype=object))})

    from ..shuffle import dedup_pairs

    # per-batch dedup leaves CROSS-batch duplicates — without the
    # global dedup the top-k rows can repeat a node and silently
    # shrink the seed set (caught by the sequential-replay oracle)
    seeds_df = (
        dedup_pairs(
            edges.map_batches(nodes_of, batch_format="pandas"),
            cols=("node", "h"),
        )
        .sort(["h", "node"])
        .limit(num_seeds)
        .to_pandas()  # num_seeds rows — driver-sized by definition
    )
    seeds = seeds_df["node"].tolist()

    sep = "\x1f"
    seeds_ref = ray.put(seeds)

    def label_edges(df: pd.DataFrame) -> pd.DataFrame:
        ss = ray.get(seeds_ref)
        a = df[src].astype(str).to_numpy(dtype=object)
        b = df[dst].astype(str).to_numpy(dtype=object)
        parts = [
            pd.DataFrame({"s": s + sep + a, "o": s + sep + b})
            for s in ss
        ]
        return pd.concat(parts, ignore_index=True)

    labeled = edges.map_batches(label_edges, batch_format="pandas")
    dist = bfs_depths(
        labeled, [s + sep + s for s in seeds], max_depth=max_depth,
        num_partitions=num_partitions,
    )

    def contrib(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return pd.DataFrame({"node": pd.Series([], dtype=object),
                                 "h_scaled": pd.Series([], np.int64)})
        d = df["depth"].to_numpy(np.int64)
        m = d > 0
        node = df["node"].astype(str).str.split(sep, n=1).str[1]
        g = pd.DataFrame({
            "node": node[m].to_numpy(dtype=object),
            "h_scaled": (scale // d[m]).astype(np.int64),
        }).groupby("node", as_index=False)["h_scaled"].sum()
        g["_bucket"] = bucket_tag(g, "node", num_partitions)
        return g

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("node", as_index=False)["h_scaled"].sum()
        out["h_scaled"] = out["h_scaled"].astype(np.int64)
        return out

    return (
        dist.map_batches(contrib, batch_format="pandas")
        .groupby("_bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )
