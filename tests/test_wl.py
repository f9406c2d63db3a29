"""WL signatures vs a sequential hashlib replay + isomorphism sanity."""

import hashlib

import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.wl import wl_signatures

# two isomorphic directed triangles (a,b,c) and (x,y,z) + one odd node
EDGES = pd.DataFrame(
    {
        "s": ["a", "b", "c", "x", "y", "z", "q", "q"],
        "p": ["r", "r", "r", "r", "r", "r", "r", "t"],
        "o": ["b", "c", "a", "y", "z", "x", "a", "x"],
    }
)


def _replay(edges, rounds, with_pred=True):
    nodes = sorted(set(edges["s"]) | set(edges["o"]))
    lab = {n: "" for n in nodes}
    for _ in range(rounds):
        new = {}
        for n in nodes:
            contribs = sorted(
                (r if with_pred else "") + "|" + lab[o]
                for s, r, o in edges.itertuples(index=False) if s == n
            )
            key = lab[n] + "|" + "|".join(contribs)
            new[n] = hashlib.md5(key.encode()).hexdigest()
        lab = new
    return lab


def test_wl_matches_replay_and_separates(ray_session):
    ds = rd.from_pandas(EDGES).repartition(3)
    got = dict(map(tuple, wl_signatures(ds, rounds=3).to_pandas()
                   [["node", "lab"]].itertuples(index=False)))
    want = _replay(EDGES, 3)
    assert got == want
    # isomorphic triangles share signatures; q is distinct
    assert got["a"] == got["x"] == got["b"] == got["y"]
    assert got["q"] != got["a"]
    # round-1 already separates q (degree 2 with a 't' edge)
    one = dict(map(tuple, wl_signatures(ds, rounds=1).to_pandas()
                   [["node", "lab"]].itertuples(index=False)))
    assert one["q"] != one["a"]
    assert one == _replay(EDGES, 1)


def test_wl_unlabeled_and_seeded(ray_session):
    ds = rd.from_pandas(EDGES).repartition(2)
    got = dict(map(tuple, wl_signatures(ds, rounds=2, pred=None)
                   .to_pandas()[["node", "lab"]].itertuples(index=False)))
    assert got == _replay(EDGES, 2, with_pred=False)
    # seeded labels break the triangle symmetry
    seeds = rd.from_pandas(pd.DataFrame(
        {"node": sorted(set(EDGES["s"]) | set(EDGES["o"]))}).assign(
            lab=lambda d: d["node"]))
    seeded = dict(map(tuple, wl_signatures(ds, rounds=1, labels=seeds)
                      .to_pandas()[["node", "lab"]]
                      .itertuples(index=False)))
    assert seeded["a"] != seeded["x"]
    with pytest.raises(ValueError, match="rounds"):
        wl_signatures(ds, rounds=0)
