"""global_rank / NTILE (stages/sampling.global_rank) — exact vs a
sequential replay, SQL NTILE group-size semantics."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.sampling import global_rank


def test_global_rank_exact_with_ties(ray_session):
    df = pd.DataFrame(
        {"doc_id": [5, 1, 3, 2, 4], "score": [2.0, 2.0, 1.0, 9.0, 1.0]}
    )
    out = (
        global_rank(rd.from_pandas(df).repartition(3), "score")
        .to_pandas()
        .sort_values("rank")
    )
    # asc order: (1.0,3), (1.0,4), (2.0,1), (2.0,5), (9.0,2)
    assert list(out["doc_id"]) == [3, 4, 1, 5, 2]
    assert list(out["rank"]) == [1, 2, 3, 4, 5]


def test_global_rank_descending_and_ntile(ray_session):
    n = 10
    df = pd.DataFrame(
        {"doc_id": range(n), "score": [float(i) for i in range(n)]}
    )
    out = (
        global_rank(
            rd.from_pandas(df).repartition(4), "score",
            descending=True, ntiles=3,
        )
        .to_pandas()
        .sort_values("rank")
    )
    assert list(out["doc_id"]) == list(range(9, -1, -1))
    # NTILE(3) over 10 rows: sizes 4,3,3 (first total%n tiles larger)
    assert list(out["ntile"]) == [1, 1, 1, 1, 2, 2, 2, 3, 3, 3]


def test_global_rank_all_equal_scores_single_bucket(ray_session):
    df = pd.DataFrame({"doc_id": [3, 1, 2], "score": [7.0, 7.0, 7.0]})
    out = (
        global_rank(rd.from_pandas(df), "score").to_pandas()
        .sort_values("rank")
    )
    assert list(out["doc_id"]) == [1, 2, 3]  # tie → id order


def test_global_rank_bad_ntiles(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1], "score": [1.0]}))
    with pytest.raises(ValueError):
        global_rank(ds, "score", ntiles=0)
