"""random_walks vs a sequential hashlib replay (same md5 choice rule,
same sorted-neighbor ranks), plus dead-end and multi-edge semantics."""

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.walks import random_walks

EDGES = pd.DataFrame(
    {
        "s": [1, 1, 1, 2, 2, 3, 4, 4, 5, 6, 1],
        "o": [2, 3, 4, 3, 5, 1, 5, 6, 6, 1, 2],  # dup (1,2) at end
    }
)


def _md5i(sx: str) -> int:
    return int(hashlib.md5(sx.encode()).hexdigest()[:10], 16)


def _replay(edges, starts, walk_len, wpn, salt="graft-walk"):
    adj = {}
    for s, o in sorted(set(map(tuple, edges.itertuples(index=False)))):
        adj.setdefault(s, []).append(o)
    rows = []
    for n in starts:
        for w in range(wpn):
            wid = f"{n}#{w}"
            cur = n
            rows.append((wid, 0, n))
            for t in range(walk_len):
                nb = adj.get(cur)
                if not nb:
                    break
                cur = nb[_md5i(f"{salt}|{wid}|{t}") % len(nb)]
                rows.append((wid, t + 1, cur))
    return sorted(rows)


def test_walks_match_replay(ray_session):
    ds = rd.from_pandas(EDGES).repartition(3)
    got = random_walks(ds, walk_len=5, walks_per_node=2).to_pandas()
    got_rows = sorted(map(tuple, got[["walk_id", "step", "node"]]
                          .itertuples(index=False)))
    want = _replay(EDGES, sorted(EDGES["s"].unique()), 5, 2)
    assert got_rows == want
    # the walk actually moves (some step-5 rows exist on this graph)
    assert got["step"].max() >= 3


def test_walks_dead_end_stops(ray_session):
    chain = pd.DataFrame({"s": [1, 2], "o": [2, 3]})  # 3 is a sink
    got = random_walks(
        rd.from_pandas(chain), walk_len=10).to_pandas()
    w1 = got[got["walk_id"] == "1#0"].sort_values("step")
    assert w1["node"].tolist() == [1, 2, 3]  # stopped at the sink
    assert got["step"].max() == 2


def test_walks_explicit_starts_and_guards(ray_session):
    ds = rd.from_pandas(EDGES)
    st = rd.from_pandas(pd.DataFrame({"node": [3, 6]}))
    got = random_walks(ds, walk_len=2, starts=st).to_pandas()
    assert set(w.split("#")[0] for w in got["walk_id"]) == {"3", "6"}
    want = _replay(EDGES, [3, 6], 2, 1)
    assert sorted(map(tuple, got[["walk_id", "step", "node"]]
                      .itertuples(index=False))) == want
    with pytest.raises(ValueError, match="walk_len"):
        random_walks(ds, walk_len=0)
    with pytest.raises(ValueError, match="walks_per_node"):
        random_walks(ds, walk_len=1, walks_per_node=0)
    empty = rd.from_pandas(pd.DataFrame({"node": [99]})).filter(
        lambda r: False)
    with pytest.raises(ValueError, match="empty start"):
        random_walks(ds, walk_len=1, starts=empty)


def test_skipgram_pairs_match_bruteforce(ray_session):
    from collections import Counter

    from graphforge_ray.stages.walks import skipgram_pairs

    ds = rd.from_pandas(EDGES).repartition(3)
    walks = random_walks(ds, walk_len=5, walks_per_node=2)
    got = skipgram_pairs(walks, window=2).to_pandas()
    got_map = {(r.center, r.context): r.cnt
               for r in got.itertuples(index=False)}

    rows = _replay(EDGES, sorted(EDGES["s"].unique()), 5, 2)
    by_walk = {}
    for wid, step, node in rows:
        by_walk.setdefault(wid, []).append((step, node))
    want = Counter()
    for seq in by_walk.values():
        seq = [n for _, n in sorted(seq)]
        for i, c in enumerate(seq):
            for j in range(max(0, i - 2), min(len(seq), i + 3)):
                if j != i:
                    want[(c, seq[j])] += 1
    assert got_map == dict(want)
    with pytest.raises(ValueError, match="window"):
        skipgram_pairs(walks, window=0)
