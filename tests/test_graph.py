"""Graph analytics: out-degrees, degree histogram, PageRank, triangles.

Local oracles are straight numpy/pure-Python recomputations of the same
definitions (power iteration with dangling redistribution; brute-force
triangle enumeration) — independent of the distributed kernels.
"""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.graph import (
    bfs_depths,
    degree_histogram,
    hits,
    k_core,
    node_jaccard,
    out_degrees,
    pagerank,
    sssp,
    temporal_reach,
    triangle_count,
)


def _edges_ds(pairs, num_blocks=3):
    df = pd.DataFrame(pairs, columns=["s", "o"]).astype(np.int64)
    return rd.from_pandas(df).repartition(num_blocks)


def _pagerank_oracle(pairs, num_iters, damping=0.85):
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    deg = np.zeros(n)
    for s, _ in pairs:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        dm = r[deg == 0].sum()
        incoming = np.zeros(n)
        for s, o in pairs:
            incoming[idx[o]] += r[idx[s]] / deg[idx[s]]
        r = (1 - damping) / n + damping * (incoming + dm / n)
    return {nodes[i]: r[i] for i in range(n)}


CHAIN_WITH_HUB = [
    (1, 2), (2, 3), (3, 4), (4, 5),
    (5, 1),                       # cycle back
    (6, 1), (6, 2), (6, 3),       # hub fan-out
    (7, 6),                       # feeds the hub
    (8, 8),                       # self loop (counts as an out-edge)
    (9, 1), (9, 1),               # parallel edges
]  # node 8 only self-loops; no dangling yet


def test_out_degrees_and_histogram():
    ds = _edges_ds(CHAIN_WITH_HUB)
    deg = out_degrees(ds).to_pandas().set_index("node")["out_deg"]
    assert deg[6] == 3 and deg[9] == 2 and deg[1] == 1 and deg[8] == 1
    hist = degree_histogram(ds)
    assert list(hist.columns) == ["out_deg", "n_nodes"]
    got = dict(zip(hist["out_deg"], hist["n_nodes"]))
    # sources: 1,2,3,4,5 deg1; 7 deg1; 8 deg1; 9 deg2; 6 deg3
    assert got == {1: 7, 2: 1, 3: 1}


def test_pagerank_matches_oracle_with_dangling():
    pairs = CHAIN_WITH_HUB + [(3, 10)]  # node 10 is dangling
    ds = _edges_ds(pairs)
    got = pagerank(ds, num_iters=4).to_pandas()
    exp = _pagerank_oracle(pairs, num_iters=4)
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(exp[row["node"]], rel=1e-12)
    # total mass conserved (dangling redistribution, not lost)
    assert got["rank"].sum() == pytest.approx(1.0, rel=1e-9)


def test_pagerank_fixed_iterations_deterministic():
    ds = _edges_ds(CHAIN_WITH_HUB, num_blocks=5)
    a = pagerank(ds, num_iters=3).to_pandas().sort_values("node")
    b = pagerank(ds, num_iters=3).to_pandas().sort_values("node")
    assert np.allclose(a["rank"].to_numpy(), b["rank"].to_numpy(),
                       rtol=0, atol=5e-16)


def test_pagerank_warm_start_composes():
    # warm-starting from j rounds and running k more == j+k rounds cold
    # (the state flows through the init merge bit-exact)
    ds = _edges_ds(CHAIN_WITH_HUB, num_blocks=3)
    cold = pagerank(ds, num_iters=5).to_pandas().sort_values("node")
    warm = pagerank(
        ds, num_iters=2, init_ranks=pagerank(ds, num_iters=3)
    ).to_pandas().sort_values("node")
    assert np.allclose(cold["rank"].to_numpy(), warm["rank"].to_numpy(),
                       rtol=0, atol=5e-16)


def test_pagerank_warm_start_new_nodes_seed_uniform():
    # nodes absent from the prior snapshot start at 1/N_full: with 0
    # warm rounds requested... rounds ≥ 1, so check after 1 round that
    # the result equals 1 cold round over the full graph seeded with
    # (prior ∪ 1/N) — built via the sequential oracle
    base = CHAIN_WITH_HUB
    full = base + [(50, 6), (6, 50)]
    prior = pagerank(_edges_ds(base), num_iters=2)
    got = pagerank(_edges_ds(full), num_iters=1,
                   init_ranks=prior).to_pandas()
    prior_pd = prior.to_pandas().set_index("node")["rank"]
    # sequential replay of one damped round from the mixed init
    nodes = sorted({n for e in full for n in e})
    n = len(nodes)
    deg = {}
    for s, _o in full:
        deg[s] = deg.get(s, 0) + 1
    r0 = {v: float(prior_pd.get(v, 1.0 / n)) for v in nodes}
    dm = sum(r for v, r in r0.items() if v not in deg)
    inc = {v: 0.0 for v in nodes}
    for s, o in full:
        inc[o] += r0[s] / deg[s]
    exp = {v: 0.15 / n + 0.85 * (inc[v] + dm / n) for v in nodes}
    for _, row in got.iterrows():
        assert row["rank"] == pytest.approx(exp[row["node"]], rel=1e-12)


def _triangle_oracle(pairs):
    und = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b in und:
        for c in adj[a] & adj[b]:
            if c > b:  # a < b < c exactly once
                count += 1
    return count


def test_triangle_count():
    # K4 on {1..4} (4 triangles) + a pendant + noise (dups, self-loop,
    # reversed direction)
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 5), (2, 1), (3, 1),
    ]
    assert _triangle_oracle(pairs) == 4
    assert triangle_count(_edges_ds(pairs)) == 4


def test_triangle_count_none():
    pairs = [(1, 2), (2, 3), (3, 4)]  # path: no triangles
    assert triangle_count(_edges_ds(pairs)) == 0


def test_triangle_count_string_ids():
    # IRI-string node ids — the materialized-KG case the module
    # docstring advertises (r3 ADVICE: the int64 dtype restore raised
    # ValueError on any non-integer ids)
    pairs = [
        ("n1", "n2"), ("n1", "n3"), ("n1", "n4"),
        ("n2", "n3"), ("n2", "n4"), ("n3", "n4"),
        ("n4", "n5"), ("n2", "n1"),
    ]
    assert _triangle_oracle(pairs) == 4
    df = pd.DataFrame(pairs, columns=["s", "o"])
    assert triangle_count(rd.from_pandas(df).repartition(3)) == 4


def test_pagerank_empty_graph():
    ds = _edges_ds([])
    assert pagerank(ds, num_iters=2).count() == 0


def _hits_oracle(pairs, num_iters):
    """L1-normalized HITS, plain numpy recomputation."""
    nodes = sorted({x for p in pairs for x in p})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    h = np.ones(n)
    a = np.zeros(n)
    for _ in range(num_iters):
        a = np.zeros(n)
        for s, o in pairs:
            a[idx[o]] += h[idx[s]]
        if a.sum() > 0:
            a = a / a.sum()
        h = np.zeros(n)
        for s, o in pairs:
            h[idx[s]] += a[idx[o]]
        if h.sum() > 0:
            h = h / h.sum()
    return {nodes[i]: (h[i], a[i]) for i in range(n)}


def test_hits_matches_oracle():
    pairs = CHAIN_WITH_HUB + [(3, 10)]  # 10: sink (auth only)
    got = hits(_edges_ds(pairs), num_iters=3).to_pandas()
    exp = _hits_oracle(pairs, num_iters=3)
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        eh, ea = exp[row["node"]]
        assert row["hub"] == pytest.approx(eh, abs=1e-12)
        assert row["auth"] == pytest.approx(ea, abs=1e-12)
    # L1 normalization: both score vectors sum to 1
    assert got["hub"].sum() == pytest.approx(1.0, rel=1e-9)
    assert got["auth"].sum() == pytest.approx(1.0, rel=1e-9)


def test_hits_deterministic_and_empty():
    ds = _edges_ds(CHAIN_WITH_HUB, num_blocks=5)
    a = hits(ds, num_iters=2).to_pandas().sort_values("node")
    b = hits(ds, num_iters=2).to_pandas().sort_values("node")
    assert np.allclose(a["hub"].to_numpy(), b["hub"].to_numpy(), atol=0)
    assert np.allclose(a["auth"].to_numpy(), b["auth"].to_numpy(), atol=0)
    assert hits(_edges_ds([]), num_iters=2).count() == 0


def _bfs_oracle(pairs, seeds, max_depth=None):
    """Plain queue BFS over a python adjacency dict."""
    adj = {}
    for s, o in pairs:
        adj.setdefault(s, []).append(o)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    d = 0
    while frontier:
        d += 1
        if max_depth is not None and d > max_depth:
            break
        nxt = []
        for n in frontier:
            for m in adj.get(n, ()):
                if m not in dist:
                    dist[m] = d
                    nxt.append(m)
        frontier = nxt
    return dist


BFS_GRAPH = [
    (1, 2), (2, 3), (3, 4), (4, 5),      # chain
    (1, 10), (10, 4),                    # shortcut: 4 at depth 2, not 3
    (5, 1),                              # cycle back to the seed
    (20, 21), (21, 20),                  # unreachable 2-cycle
    (3, 3),                              # self loop
    (2, 3), (2, 3),                      # parallel edges
]


def test_bfs_depths_matches_oracle():
    got = bfs_depths(_edges_ds(BFS_GRAPH), seeds=[1]).to_pandas()
    exp = _bfs_oracle(BFS_GRAPH, [1])
    assert dict(zip(got["node"], got["depth"])) == exp
    assert 20 not in set(got["node"])  # unreachable absent


def test_bfs_depths_multi_source_and_max_depth():
    got = bfs_depths(
        _edges_ds(BFS_GRAPH), seeds=[1, 20], max_depth=2
    ).to_pandas()
    exp = _bfs_oracle(BFS_GRAPH, [1, 20], max_depth=2)
    assert dict(zip(got["node"], got["depth"])) == exp
    assert exp[21] == 1 and exp[4] == 2  # shortcut wins over the chain
    assert 5 not in exp  # depth 3 > max_depth excluded


def test_bfs_depths_shuffle_path():
    # broadcast_limit=0 forces the wide-frontier shuffle expansion from
    # round 2 on (round 1 always broadcasts the seed list)
    got = bfs_depths(
        _edges_ds(BFS_GRAPH, num_blocks=4), seeds=[1], broadcast_limit=0
    ).to_pandas()
    assert dict(zip(got["node"], got["depth"])) == _bfs_oracle(BFS_GRAPH, [1])


def test_bfs_depths_string_ids():
    pairs = [("a", "b"), ("b", "c"), ("a", "c"), ("x", "y")]
    df = pd.DataFrame(pairs, columns=["s", "o"])
    got = bfs_depths(rd.from_pandas(df).repartition(2), seeds=["a"])
    assert dict(zip(*got.to_pandas()[["node", "depth"]].T.values.tolist())) \
        == {"a": 0, "b": 1, "c": 1}


def test_bfs_depths_round_exhaustion_raises():
    chain = [(i, i + 1) for i in range(12)]
    with pytest.raises(RuntimeError, match="frontier still live"):
        bfs_depths(_edges_ds(chain), seeds=[0], max_rounds=5)
    # bounded-radius query on the same graph is the clean stop
    got = bfs_depths(
        _edges_ds(chain), seeds=[0], max_depth=5, max_rounds=5
    ).to_pandas()
    assert got["depth"].max() == 5 and len(got) == 6


def test_bfs_depths_empty_seeds_raises():
    with pytest.raises(ValueError):
        bfs_depths(_edges_ds(BFS_GRAPH), seeds=[])


def _wedges_ds(triples, num_blocks=3):
    df = pd.DataFrame(triples, columns=["s", "o", "w"])
    df["s"] = df["s"].astype(np.int64)
    df["o"] = df["o"].astype(np.int64)
    df["w"] = df["w"].astype(np.float64)
    return rd.from_pandas(df).repartition(num_blocks)


def _sssp_oracle(triples, seeds, max_hops=None):
    """Hop-bounded Bellman-Ford, plain python."""
    dist = {s: 0.0 for s in seeds}
    rounds = max_hops if max_hops is not None else len(
        {x for t in triples for x in t[:2]}
    )
    for _ in range(rounds):
        nxt = dict(dist)
        for s, o, w in triples:
            if s in dist and dist[s] + w < nxt.get(o, np.inf):
                nxt[o] = dist[s] + w
        if nxt == dist:
            break
        dist = nxt
    return dist


SSSP_GRAPH = [
    (1, 2, 1.0), (2, 3, 1.0), (3, 4, 1.0),   # unit chain
    (1, 4, 5.0),                              # direct but heavier
    (1, 5, 0.0), (5, 4, 2.5),                 # zero-weight edge
    (4, 1, 0.5),                              # cycle back
    (7, 8, 1.0),                              # unreachable island
    (2, 4, 1.7),                              # shortcut via 2: 2.7
]


def test_sssp_matches_oracle():
    got = sssp(_wedges_ds(SSSP_GRAPH), seeds=[1]).to_pandas()
    exp = _sssp_oracle(SSSP_GRAPH, [1])
    assert dict(zip(got["node"], got["dist"])) == pytest.approx(exp)
    # zero-weight path 1→5→4 (2.5) beats both 1→4 (5.0) and 1→2→4 (2.7)
    assert exp[4] == 2.5 and 7 not in exp


def test_sssp_hop_bounded():
    got = sssp(_wedges_ds(SSSP_GRAPH), seeds=[1], max_hops=1).to_pandas()
    exp = _sssp_oracle(SSSP_GRAPH, [1], max_hops=1)
    assert dict(zip(got["node"], got["dist"])) == pytest.approx(exp)
    assert exp[4] == 5.0  # only the direct edge within 1 hop


def test_sssp_shuffle_path_and_multi_source():
    got = sssp(
        _wedges_ds(SSSP_GRAPH, num_blocks=4),
        seeds=[1, 7],
        broadcast_limit=0,
    ).to_pandas()
    exp = _sssp_oracle(SSSP_GRAPH, [1, 7])
    assert dict(zip(got["node"], got["dist"])) == pytest.approx(exp)
    assert exp[8] == 1.0


def test_sssp_negative_weight_raises():
    bad = SSSP_GRAPH + [(2, 5, -0.1)]
    with pytest.raises(ValueError, match="non-negative"):
        sssp(_wedges_ds(bad), seeds=[1])


def test_sssp_round_exhaustion_raises():
    chain = [(i, i + 1, 1.0) for i in range(12)]
    with pytest.raises(RuntimeError, match="still improving"):
        sssp(_wedges_ds(chain), seeds=[0], max_rounds=5)


def _temporal_oracle(edges, seeds, start=0.0, max_hops=None):
    """Round-synchronous earliest-arrival relaxation, plain python
    (an edge (s, o, t) is usable only when t >= arrival[s])."""
    arr = {s: float(start) for s in seeds}
    rounds = max_hops if max_hops is not None else len(edges) + 1
    for _ in range(rounds):
        nxt = dict(arr)
        for s, o, t in edges:
            if s in arr and t >= arr[s] and t < nxt.get(o, np.inf):
                nxt[o] = t
        if nxt == arr:
            break
        arr = nxt
    return arr


# (src, dst, timestamp) — time-respecting-path semantics
TEMPORAL_GRAPH = [
    (1, 2, 1.0), (2, 3, 2.0),   # respects time: 1→2@1 then 2→3@2
    (1, 4, 5.0), (4, 5, 3.0),   # 4→5@3 blocked (3 < arrival 5)
    (4, 5, 6.0),                # later parallel edge works: arrival 6
    (2, 6, 0.5),                # blocked: 0.5 < arrival-at-2 (1.0)
    (7, 8, 1.0),                # island, only reachable from seed 7
    (1, 3, 9.0),                # direct but late — min arrival stays 2
]


def test_temporal_reach_matches_oracle():
    got = temporal_reach(
        _wedges_ds(TEMPORAL_GRAPH), seeds=[1], ts="w"
    ).to_pandas()
    exp = _temporal_oracle(TEMPORAL_GRAPH, [1])
    assert dict(zip(got["node"], got["arrival"])) == pytest.approx(exp)
    # the time-blocked edges never fire; the late direct edge loses
    assert exp == {1: 0.0, 2: 1.0, 3: 2.0, 4: 5.0, 5: 6.0}


def test_temporal_reach_hop_bounded_and_start():
    got = temporal_reach(
        _wedges_ds(TEMPORAL_GRAPH), seeds=[1], ts="w", start=1.5, max_hops=1
    ).to_pandas()
    exp = _temporal_oracle(TEMPORAL_GRAPH, [1], start=1.5, max_hops=1)
    assert dict(zip(got["node"], got["arrival"])) == pytest.approx(exp)
    # start=1.5 disqualifies the t=1.0 edge out of the seed
    assert 2 not in exp and exp[4] == 5.0


def test_temporal_reach_shuffle_path_multi_source():
    got = temporal_reach(
        _wedges_ds(TEMPORAL_GRAPH, num_blocks=4),
        seeds=[1, 7],
        ts="w",
        broadcast_limit=0,
    ).to_pandas()
    exp = _temporal_oracle(TEMPORAL_GRAPH, [1, 7])
    assert dict(zip(got["node"], got["arrival"])) == pytest.approx(exp)
    assert exp[8] == 1.0


def test_temporal_reach_empty_seeds_raises():
    with pytest.raises(ValueError):
        temporal_reach(_wedges_ds(TEMPORAL_GRAPH), seeds=[], ts="w")


def _jaccard_oracle(pairs, min_common=1, skip_middles=()):
    adj = {}
    for s, o in pairs:
        if s == o:
            continue
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    out = {}
    mids = [m for m in adj if m not in skip_middles]
    from itertools import combinations
    counts = {}
    for m in mids:
        for a, b in combinations(sorted(adj[m]), 2):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    for (a, b), c in counts.items():
        if c >= min_common:
            out[(a, b)] = (c, c / (len(adj[a]) + len(adj[b]) - c))
    return out


def test_node_jaccard_matches_oracle():
    # K4 + pendant + noise (self-loop, dup, reversed) — rich common
    # neighborhoods
    pairs = [
        (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
        (4, 5), (5, 5), (2, 1), (3, 1),
    ]
    got = node_jaccard(_edges_ds(pairs)).to_pandas()
    exp = _jaccard_oracle(pairs)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        c, j = exp[(r["a"], r["b"])]
        assert r["common"] == c
        assert r["jaccard"] == pytest.approx(j, rel=1e-12)
    # inside K4: nodes 1,2 share {3,4}: common 2, union 3+3-2=4 → 0.5
    assert exp[(1, 2)] == (2, 0.5)


def test_node_jaccard_min_common():
    pairs = [(1, 2), (1, 3), (2, 4), (3, 4), (1, 4)]
    got = node_jaccard(_edges_ds(pairs), min_common=2).to_pandas()
    exp = _jaccard_oracle(pairs, min_common=2)
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        assert exp[(r["a"], r["b"])][0] == r["common"]


def test_node_jaccard_hub_exclusion_counted():
    from graphforge_ray import metrics

    # hub 0 adjacent to 1..20; rim edges (1,2),(3,4) give non-hub wedges
    pairs = [(0, i) for i in range(1, 21)] + [(1, 2), (3, 4)]
    before = metrics.snapshot().get("jaccard_hub_middles_skipped", 0)
    got = node_jaccard(
        _edges_ds(pairs, num_blocks=4), max_degree=10
    ).to_pandas()
    after = metrics.snapshot().get("jaccard_hub_middles_skipped", 0)
    assert after > before  # the hub middle was skipped and counted
    exp = _jaccard_oracle(pairs, skip_middles={0})
    assert len(got) == len(exp)
    for _, r in got.iterrows():
        c, j = exp[(r["a"], r["b"])]
        assert r["common"] == c and r["jaccard"] == pytest.approx(j)


def _kcore_oracle(pairs, k):
    adj = {}
    for s, o in pairs:
        if s == o:
            continue
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    alive = set(adj)
    while True:
        gone = {n for n in alive if len(adj[n] & alive) < k}
        if not gone:
            break
        alive -= gone
    return {n: len(adj[n] & alive) for n in alive}


KCORE_GRAPH = [
    # K4 on {1..4} (a 3-core) with pendant chains hanging off it —
    # peeling must cascade down the chains over multiple rounds
    (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
    (4, 5), (5, 6), (6, 7),
    (2, 8),
    (10, 11), (11, 12), (10, 12),  # triangle: a 2-core island
    (1, 1), (2, 1),                # self-loop + reversed dup noise
]


def test_k_core_matches_oracle():
    for k in (2, 3):
        got = k_core(_edges_ds(KCORE_GRAPH), k=k).to_pandas()
        exp = _kcore_oracle(KCORE_GRAPH, k)
        assert dict(zip(got["node"], got["deg"])) == exp
    # 3-core is exactly the K4
    assert set(_kcore_oracle(KCORE_GRAPH, 3)) == {1, 2, 3, 4}


def test_k_core_fixed_rounds_and_empty():
    # after enough fixed rounds the fixed-round form equals convergence
    got = k_core(_edges_ds(KCORE_GRAPH), k=3, num_rounds=8).to_pandas()
    exp = _kcore_oracle(KCORE_GRAPH, 3)
    assert dict(zip(got["node"], got["deg"])) == exp
    # k high enough to peel everything → empty result
    assert k_core(_edges_ds(KCORE_GRAPH), k=5).count() == 0


def test_k_core_shuffle_prune_path():
    got = k_core(
        _edges_ds(KCORE_GRAPH, num_blocks=4), k=2, broadcast_limit=0
    ).to_pandas()
    exp = _kcore_oracle(KCORE_GRAPH, 2)
    assert dict(zip(got["node"], got["deg"])) == exp


def test_triangle_count_hub_presplit():
    # one hub (node 0) of degree 2k, plus a rim edge (2i-1, 2i) for each
    # spoke pair → exactly k triangles through the hub. With a low
    # hub_threshold the hub's wedge work MUST salt-split across tasks
    # (metric increments) and the count must stay exact.
    import ray

    from graphforge_ray import metrics

    # the hub must sit in the MIDDLE of the a<b<c ordering to skew the
    # wedge join: spokes below (1..499) and above (501..1000) give it
    # left-degree 499 × right-degree 500 ≈ 250k wedges on one key
    hub, k = 500, 60
    pairs = [(i, hub) for i in range(1, hub)]
    pairs += [(hub, hub + i) for i in range(1, hub + 1)]
    pairs += [(i, hub + i) for i in range(1, k + 1)]  # rim closures
    assert _triangle_oracle(pairs) == k
    before = metrics.snapshot().get("triangle_hub_splits", 0)
    got = triangle_count(_edges_ds(pairs, num_blocks=4),
                         hub_threshold=500)
    assert got == k
    after = metrics.snapshot().get("triangle_hub_splits", 0)
    assert after > before  # the hub was detected and split
    # default threshold: same result, no split
    assert triangle_count(_edges_ds(pairs, num_blocks=4)) == k


def test_personalized_pagerank_localizes_to_seed(ray_session):
    # two disconnected 3-cycles; restart to a seed in cycle A → ALL
    # mass stays in cycle A (cycle B gets exactly 0), total mass 1
    import ray.data as rd

    from graphforge_ray.stages.graph import personalized_pagerank

    edges = pd.DataFrame(
        {"s": [1, 2, 3, 10, 11, 12], "o": [2, 3, 1, 11, 12, 10]}
    )
    got = (
        personalized_pagerank(rd.from_pandas(edges), seeds=[1],
                              num_iters=4)
        .to_pandas()
        .set_index("node")["rank"]
    )
    assert abs(got.sum() - 1.0) < 1e-9
    assert got.loc[10] == 0 and got.loc[11] == 0 and got.loc[12] == 0
    # all mass lives in the seed's cycle (it rotates around the cycle
    # for small iteration counts — no per-node ordering claim)
    assert got.loc[1] > 0 and got.loc[[1, 2, 3]].sum() > 0.999


def test_personalized_pagerank_matches_numpy_replay(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.graph import personalized_pagerank

    # chain with a dangling tail: 1→2→3→4 (4 dangles), seeds {1, 3}
    edges = pd.DataFrame({"s": [1, 2, 3], "o": [2, 3, 4]})
    d, iters = 0.85, 3
    nodes = [1, 2, 3, 4]
    p = {1: 0.5, 2: 0.0, 3: 0.5, 4: 0.0}
    deg = {1: 1, 2: 1, 3: 1, 4: 0}
    r = dict(p)
    for _ in range(iters):
        dm = sum(r[n] for n in nodes if deg[n] == 0)
        nxt = {}
        for n in nodes:
            inc = sum(
                r[s] / deg[s]
                for s, o in zip(edges["s"], edges["o"])
                if o == n
            )
            nxt[n] = (1 - d) * p[n] + d * (inc + dm * p[n])
        r = nxt
    got = (
        personalized_pagerank(
            rd.from_pandas(edges), seeds=[1, 3], num_iters=iters
        )
        .to_pandas()
        .set_index("node")["rank"]
    )
    for n in nodes:
        assert abs(got.loc[n] - r[n]) < 1e-12, (n, got.loc[n], r[n])


def test_personalized_pagerank_rejects_absent_seeds(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.graph import personalized_pagerank

    edges = rd.from_pandas(pd.DataFrame({"s": [1], "o": [2]}))
    with pytest.raises(ValueError, match="non-empty"):
        personalized_pagerank(edges, seeds=[])
    with pytest.raises(ValueError, match="incident"):
        personalized_pagerank(edges, seeds=[99])


def test_label_propagation_two_cliques(ray_session):
    # two 4-cliques joined by one bridge edge: synchronous LP with the
    # (count desc, label asc) tie rule converges each clique to its
    # min member's label; the bridge does not merge them
    import itertools

    import ray.data as rd

    from graphforge_ray.stages.graph import label_propagation

    a = list(itertools.combinations([1, 2, 3, 4], 2))
    b = list(itertools.combinations([10, 11, 12, 13], 2))
    edges = pd.DataFrame(a + b + [(4, 10)], columns=["s", "o"])
    got = (
        label_propagation(rd.from_pandas(edges), num_iters=4)
        .to_pandas()
        .set_index("node")["label"]
    )
    assert set(got.loc[[1, 2, 3, 4]]) == {1}
    assert set(got.loc[[11, 12, 13]]) == {10}


def test_label_propagation_matches_sequential_replay(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.graph import label_propagation

    rng_edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4), (5, 1)]
    edges = pd.DataFrame(rng_edges, columns=["s", "o"])
    und = rng_edges + [(o, s) for s, o in rng_edges]
    labels = {n: n for e in und for n in e}
    for _ in range(3):
        nxt = {}
        for v in labels:
            counts = {}
            for s, o in und:
                if o == v:
                    lab = labels[s]
                    counts[lab] = counts.get(lab, 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            nxt[v] = best[0][0]
        labels = nxt
    got = (
        label_propagation(rd.from_pandas(edges), num_iters=3)
        .to_pandas()
        .set_index("node")["label"]
    )
    for n, lab in labels.items():
        assert got.loc[n] == lab, (n, got.loc[n], lab)


def test_harmonic_centrality_matches_sequential():
    import collections
    import hashlib
    import math

    from graphforge_ray.stages.graph import harmonic_centrality

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (5, 1),
             (6, 5), (7, 6), (2, 7), (8, 8)]
    ds = _edges_ds(pairs, num_blocks=3)
    got = (harmonic_centrality(ds, num_seeds=4, max_depth=3)
           .to_pandas().sort_values("node").reset_index(drop=True))

    nodes = sorted({str(n) for e in pairs for n in e})
    seeds = sorted(
        nodes, key=lambda n: (hashlib.md5(n.encode()).hexdigest(), n)
    )[:4]
    scale = math.lcm(1, 2, 3)
    adj = collections.defaultdict(list)
    for s, o in pairs:
        adj[str(s)].append(str(o))
    h = collections.Counter()
    for s in seeds:
        dist = {s: 0}
        q = [s]
        while q:
            nq = []
            for u in q:
                if dist[u] >= 3:
                    continue
                for v in adj.get(u, []):
                    if v not in dist:
                        dist[v] = dist[u] + 1
                        nq.append(v)
            q = nq
        for v, d in dist.items():
            if d > 0:
                h[v] += scale // d
    want = pd.DataFrame(sorted(h.items()), columns=["node", "h_scaled"])
    got["h_scaled"] = got["h_scaled"].astype(int)
    assert list(got["node"].astype(str)) == list(want["node"])
    assert list(got["h_scaled"]) == list(want["h_scaled"])


def test_harmonic_centrality_bad_params():
    ds = _edges_ds([(1, 2)])
    from graphforge_ray.stages.graph import harmonic_centrality

    with pytest.raises(ValueError):
        harmonic_centrality(ds, num_seeds=0)
    with pytest.raises(ValueError):
        harmonic_centrality(ds, max_depth=0)


# ---------------------------------------------------------------------------
# local clustering coefficient + degree assortativity
# ---------------------------------------------------------------------------

def _und_oracle(pairs):
    """Undirected simple graph: adjacency, per-node triangles, degrees."""
    und = {(min(s, o), max(s, o)) for s, o in pairs if s != o}
    adj = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {n: 0 for n in adj}
    for a, b in und:
        for c in adj[a] & adj[b]:
            if a < b < c:
                tri[a] += 1
                tri[b] += 1
                tri[c] += 1
    return und, adj, tri


def test_local_clustering_matches_bruteforce():
    from graphforge_ray.stages.graph import local_clustering

    ks = np.arange(1, 61)
    pairs = list(zip(ks, ks // 2)) + list(zip(ks, ks - 1))
    und, adj, tri = _und_oracle(pairs)
    exp = {
        n: (2 * tri[n] / (len(adj[n]) * (len(adj[n]) - 1))
            if len(adj[n]) >= 2 else 0.0)
        for n in adj
    }
    got = (
        local_clustering(_edges_ds(pairs, num_blocks=4))
        .to_pandas().set_index("node")["clustering"].to_dict()
    )
    assert set(got) == set(exp)
    for n, v in exp.items():
        assert abs(got[n] - v) < 1e-12, n


def test_local_clustering_triangle_free_and_isolated_degree1():
    from graphforge_ray.stages.graph import local_clustering

    # a path graph: no triangles, every coefficient 0.0 (incl. deg-1 ends)
    pairs = [(1, 2), (2, 3), (3, 4)]
    got = local_clustering(_edges_ds(pairs)).to_pandas()
    assert set(got["node"]) == {1, 2, 3, 4}
    assert (got["clustering"] == 0.0).all()


def test_degree_assortativity_matches_numpy():
    from graphforge_ray.stages.graph import degree_assortativity

    ks = np.arange(1, 61)
    pairs = list(zip(ks, ks // 2)) + list(zip(ks, ks - 1))
    und, adj, _ = _und_oracle(pairs)
    xs, ys = [], []
    for a, b in und:
        xs += [len(adj[a]), len(adj[b])]
        ys += [len(adj[b]), len(adj[a])]
    exp = np.corrcoef(xs, ys)[0, 1]
    got = degree_assortativity(_edges_ds(pairs, num_blocks=4))
    assert abs(got - exp) < 1e-10


def test_degree_assortativity_star_is_negative_one():
    from graphforge_ray.stages.graph import degree_assortativity

    # star K_{1,5}: perfectly disassortative, r = -1
    pairs = [(0, i) for i in range(1, 6)]
    got = degree_assortativity(_edges_ds(pairs))
    assert abs(got - (-1.0)) < 1e-12


def test_degree_assortativity_regular_graph_raises():
    from graphforge_ray.stages.graph import degree_assortativity

    # 4-cycle: every degree 2 → zero variance → loud error
    pairs = [(1, 2), (2, 3), (3, 4), (4, 1)]
    with pytest.raises(ValueError, match="variance|no edges"):
        degree_assortativity(_edges_ds(pairs))


def _weighted_pagerank_oracle(tris, num_iters, damping=0.85):
    """(s, o, w) triples → exact weighted power iteration."""
    nodes = sorted({x for s, o, _ in tris for x in (s, o)})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    outw = np.zeros(n)
    for s, _, w in tris:
        outw[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(num_iters):
        dm = r[outw == 0].sum()
        incoming = np.zeros(n)
        for s, o, w in tris:
            incoming[idx[o]] += (r[idx[s]] / outw[idx[s]]) * w
        r = (1 - damping) / n + damping * (incoming + dm / n)
    return {nodes[i]: r[i] for i in range(n)}


def test_pagerank_weighted_matches_oracle():
    tris = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0),
            (4, 1, 5.0), (2, 4, 0.5)]  # 4 has out-edges; no dangling
    tris += [(3, 5, 2.0)]              # 5 is dangling
    df = pd.DataFrame(tris, columns=["s", "o", "w"])
    ds = rd.from_pandas(df).repartition(3)
    got = (
        pagerank(ds, num_iters=4, weight_col="w")
        .to_pandas().set_index("node")["rank"].to_dict()
    )
    want = _weighted_pagerank_oracle(tris, 4)
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12, k


def test_pagerank_weighted_all_ones_equals_unweighted():
    pairs = CHAIN_WITH_HUB + [(3, 10)]
    df = pd.DataFrame(pairs, columns=["s", "o"]).astype(np.int64)
    df["w"] = 1.0
    w = (
        pagerank(rd.from_pandas(df).repartition(3), num_iters=3,
                 weight_col="w")
        .to_pandas().set_index("node")["rank"]
    )
    u = (
        pagerank(_edges_ds(pairs), num_iters=3)
        .to_pandas().set_index("node")["rank"]
    )
    for k in u.index:
        assert abs(w[k] - u[k]) < 1e-14


def test_pagerank_weighted_rejects_nonpositive():
    df = pd.DataFrame({"s": [1, 2], "o": [2, 3], "w": [1.0, 0.0]})
    with pytest.raises(Exception, match="strictly positive"):
        pagerank(rd.from_pandas(df), num_iters=1, weight_col="w")


# ---------------------------------------------------------------------------
# modularity
# ---------------------------------------------------------------------------

def _modularity_oracle(pairs, lab):
    und = {(min(s, o), max(s, o)) for s, o in pairs if s != o}
    m = len(und)
    comms = {}
    for a, b in und:
        comms.setdefault(lab[a], [0, 0])
        comms.setdefault(lab[b], [0, 0])
        if lab[a] == lab[b]:
            comms[lab[a]][0] += 1
        comms[lab[a]][1] += 1
        comms[lab[b]][1] += 1
    return sum(e / m - (d / (2 * m)) ** 2 for e, d in comms.values())


def test_modularity_matches_bruteforce():
    from graphforge_ray.stages.graph import modularity

    # two triangles joined by one bridge — the textbook 2-community
    # graph (high Q for the natural split)
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    lab = {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 1}
    labels = rd.from_pandas(pd.DataFrame(
        {"node": list(lab), "label": [lab[k] for k in lab]}
    ).astype(np.int64))
    got = modularity(_edges_ds(pairs), labels)
    exp = _modularity_oracle(pairs, lab)
    assert abs(got - exp) < 1e-12
    assert got > 0.3  # the natural split scores high

    # everything in ONE community: Q = e/m - 1 = 0 exactly
    one = rd.from_pandas(pd.DataFrame(
        {"node": list(lab), "label": [7] * len(lab)}).astype(np.int64))
    assert abs(modularity(_edges_ds(pairs), one)) < 1e-12


def test_modularity_missing_labels_raise():
    from graphforge_ray.stages.graph import modularity

    pairs = [(1, 2), (2, 3)]
    labels = rd.from_pandas(pd.DataFrame(
        {"node": [1, 2], "label": [0, 0]}).astype(np.int64))
    with pytest.raises(Exception, match="labels must cover|no rows"):
        modularity(_edges_ds(pairs), labels)


def test_diameter_estimate_path_and_star():
    from graphforge_ray.stages.graph import diameter_estimate

    # path 1-2-3-4-5 (fed as directed edges; sweep is undirected)
    out = diameter_estimate(_edges_ds([(1, 2), (2, 3), (3, 4), (4, 5)]))
    assert out.iloc[0]["seed"] == 1
    assert out.iloc[0]["peripheral"] == 5
    assert out.iloc[0]["diameter_lb"] == 4

    # star around 0: every leaf is depth 1 from 0... seed is 0,
    # farthest = min leaf (1), second sweep reaches depth 2
    out = diameter_estimate(_edges_ds([(0, i) for i in range(1, 6)]))
    assert out.iloc[0]["seed"] == 0
    assert out.iloc[0]["peripheral"] == 1
    assert out.iloc[0]["diameter_lb"] == 2


def test_diameter_estimate_cycle_tie_break():
    from graphforge_ray.stages.graph import diameter_estimate

    # 6-cycle: ecc = 3 everywhere; farthest from 1 is node 4 (unique)
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6), (6, 1)]
    out = diameter_estimate(_edges_ds(pairs))
    assert out.iloc[0]["seed"] == 1
    assert out.iloc[0]["peripheral"] == 4
    assert out.iloc[0]["diameter_lb"] == 3


def test_bipartite_project_counts_and_cap():
    from graphforge_ray.stages.graph import bipartite_project

    rows = pd.DataFrame({
        "k": [1, 1, 1, 2, 2, 3, 3, 3, 3],
        "v": [10, 20, 30, 10, 20, 10, 20, 30, 30],  # dup (3,30) ignored
    })
    ds = rd.from_pandas(rows).repartition(3)
    out = (
        bipartite_project(ds, "k", "v", min_count=1)
        .to_pandas().sort_values(["a", "b"], ignore_index=True)
    )
    got = {(r["a"], r["b"]): r["n"] for _, r in out.iterrows()}
    # (10,20) in k=1,2,3; (10,30) in 1,3; (20,30) in 1,3
    assert got == {(10, 20): 3, (10, 30): 2, (20, 30): 2}

    # min_count filter
    out2 = bipartite_project(ds, "k", "v", min_count=3).to_pandas()
    assert len(out2) == 1 and out2.iloc[0]["n"] == 3

    # max_group: k=1 and k=3 (3 values each) dropped, only k=2 pairs
    out3 = (
        bipartite_project(ds, "k", "v", min_count=1, max_group=2)
        .to_pandas()
    )
    got3 = {(r["a"], r["b"]): r["n"] for _, r in out3.iterrows()}
    assert got3 == {(10, 20): 1}


def _truss_oracle(pairs, k):
    und = {(min(s, o), max(s, o)) for s, o in pairs if s != o}
    need = k - 2
    while True:
        adj = {}
        for a, b in und:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in und}
        kept = {e for e in und if sup[e] >= need}
        if kept == und:
            return und
        und = kept


def test_k_truss_matches_peel_oracle():
    from graphforge_ray.stages.graph import k_truss

    # two triangles sharing an edge + a pendant path + a 4-clique
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4), (1, 4),       # 2 triangles
             (4, 5), (5, 6),                                # path (peels)
             (10, 11), (10, 12), (10, 13), (11, 12),
             (11, 13), (12, 13)]                            # K4
    def edge_set(df):
        # a fully-peeled truss is an EMPTY Dataset — pandas conversion
        # drops columns (documented schema-less-when-empty behavior)
        if len(df) == 0:
            return set()
        return set(map(tuple, df[["id_a", "id_b"]].to_numpy()))

    for k in (3, 4, 5):
        got = edge_set(k_truss(_edges_ds(pairs), k=k).to_pandas())
        assert got == _truss_oracle(pairs, k), k
    # 5-truss: K4 edges have support 2 < 3 → everything peels
    assert _truss_oracle(pairs, 5) == set()


def test_k_truss_triangle_free_is_empty():
    from graphforge_ray.stages.graph import k_truss

    got = k_truss(_edges_ds([(1, 2), (2, 3), (3, 4)]), k=3).to_pandas()
    assert len(got) == 0


def test_k_truss_k2_is_simple_graph():
    from graphforge_ray.stages.graph import k_truss

    got = k_truss(_edges_ds([(1, 2), (2, 1), (3, 3), (2, 3)]), k=2)
    assert set(map(tuple, got.to_pandas()[["id_a", "id_b"]]
                   .to_numpy())) == {(1, 2), (2, 3)}


def test_neighbor_agg_means_and_missing_features():
    from graphforge_ray.stages.graph import neighbor_agg

    edges = _edges_ds([(1, 10), (2, 10), (3, 10), (1, 20), (9, 20),
                       (1, 1)])  # 9 has no feature row; self-loop ok
    feats = rd.from_pandas(pd.DataFrame({
        "node": [1, 2, 3],
        "f": [2.0, 4.0, 9.0],
    }))
    out = (
        neighbor_agg(edges, feats, ["f"])
        .to_pandas().set_index("node")
    )
    assert out.loc[10, "n_nbrs"] == 3
    assert abs(out.loc[10, "f_mean"] - 5.0) < 1e-9
    # node 20: only src 1 has features (src 9 contributes nothing)
    assert out.loc[20, "n_nbrs"] == 1
    assert abs(out.loc[20, "f_mean"] - 2.0) < 1e-9
    # self-loop counts as an in-edge of node 1
    assert out.loc[1, "n_nbrs"] == 1
    # validation
    with pytest.raises(ValueError, match="non-empty"):
        neighbor_agg(edges, feats, [])
