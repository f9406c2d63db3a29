"""Strongly connected components vs brute-force mutual reachability."""

import pandas as pd
import pytest
import ray.data as rd

from graphforge_ray.stages.scc import strongly_connected_components


def _brute(edges: pd.DataFrame) -> dict:
    nodes = sorted(set(edges["s"]) | set(edges["o"]))
    adj = {}
    for s, o in edges.itertuples(index=False):
        adj.setdefault(s, set()).add(o)

    def reach(start):
        seen, stack = set(), [start]
        while stack:
            n = stack.pop()
            for m in adj.get(n, ()):  # noqa: B905
                if m not in seen:
                    seen.add(m)
                    stack.append(m)
        return seen

    fwd = {n: reach(n) for n in nodes}
    out = {}
    for n in nodes:
        mutual = {m for m in fwd[n] if n in fwd[m]} | {n}
        out[n] = min(mutual)
    return out


CASES = [
    # two cycles joined by a DAG edge + tail
    pd.DataFrame({
        "s": [1, 2, 3, 3, 4, 5, 6, 0, 0],
        "o": [2, 3, 1, 4, 5, 6, 4, 1, 7],
    }),
    # self-loop, 2-cycle, isolated-ish chain
    pd.DataFrame({
        "s": [10, 11, 12, 13, 14, 14],
        "o": [10, 12, 11, 14, 13, 15],
    }),
    # pure DAG (all singletons)
    pd.DataFrame({"s": [1, 1, 2, 3], "o": [2, 3, 4, 4]}),
]


@pytest.mark.parametrize("edges", CASES)
def test_scc_matches_bruteforce(ray_session, edges):
    got = strongly_connected_components(
        rd.from_pandas(edges).repartition(2), num_buckets=4
    ).to_pandas()
    got_map = {int(n): int(c)
               for n, c in zip(got["node"], got["scc_id"])}
    assert got_map == _brute(edges)


def test_scc_string_nodes(ray_session):
    edges = pd.DataFrame({
        "s": ["a", "b", "c", "c", "d"],
        "o": ["b", "c", "a", "d", "d"],  # abc cycle, d self-loop
    })
    got = strongly_connected_components(
        rd.from_pandas(edges), num_buckets=4).to_pandas()
    m = dict(zip(got["node"], got["scc_id"]))
    assert m == {"a": "a", "b": "a", "c": "a", "d": "d"}
