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


# ---------------------------------------------------------------------------
# grouped_rank — per-group ROW_NUMBER / NTILE (PARTITION BY semantics)
# ---------------------------------------------------------------------------

from graphforge_ray.stages.sampling import grouped_rank


def _window_replay(df, ntiles, descending=True):
    """pandas replay of ROW_NUMBER + NTILE over (group ORDER BY score
    [DESC], id)."""
    out = []
    for g, sub in df.groupby("lang"):
        sub = sub.sort_values(
            ["score", "doc_id"], ascending=[not descending, True]
        ).reset_index(drop=True)
        r = np.arange(1, len(sub) + 1)
        q, rem = divmod(len(sub), ntiles)
        if q == 0:
            tile = r
        else:
            cut = rem * (q + 1)
            tile = np.where(r <= cut, (r - 1) // (q + 1) + 1,
                            rem + (r - 1 - cut) // q + 1)
        out.append(sub.assign(rank=r, ntile=tile))
    return pd.concat(out, ignore_index=True)


@pytest.fixture()
def grouped_frame():
    rng = np.random.default_rng(5)
    n = 200
    return pd.DataFrame({
        "doc_id": np.arange(n),
        "lang": rng.choice(["en", "fr", "de"], n),
        # coarse grid → plenty of in-group ties exercising the id break
        "score": rng.integers(0, 12, n).astype(float),
    })


def test_grouped_rank_matches_window_replay(ray_session, grouped_frame):
    got = (
        grouped_rank(rd.from_pandas(grouped_frame).repartition(4),
                     "score", "lang", descending=True, ntiles=3)
        .to_pandas().sort_values(["lang", "rank"]).reset_index(drop=True)
    )
    want = _window_replay(grouped_frame, 3).sort_values(
        ["lang", "rank"]).reset_index(drop=True)
    for c in ("doc_id", "lang", "rank", "ntile"):
        assert list(got[c]) == list(want[c]), c


def test_grouped_rank_drops_null_groups(ray_session, grouped_frame):
    df = grouped_frame.copy()
    df.loc[df.index[:10], "lang"] = None
    got = grouped_rank(
        rd.from_pandas(df), "score", "lang", descending=True, ntiles=3
    ).to_pandas()
    assert len(got) == len(df) - 10
    assert got["lang"].notna().all()


def test_grouped_rank_nan_score_raises(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "en"],
                       "score": [1.0, float("nan")]})
    with pytest.raises(Exception, match="NaN"):
        grouped_rank(rd.from_pandas(df), "score", "lang").to_pandas()


def test_grouped_rank_fewer_rows_than_tiles(ray_session):
    df = pd.DataFrame({"doc_id": [1, 2], "lang": ["en", "en"],
                       "score": [2.0, 1.0]})
    got = grouped_rank(
        rd.from_pandas(df), "score", "lang", descending=True, ntiles=5
    ).to_pandas().sort_values("rank")
    assert list(got["ntile"]) == [1, 2]  # tile == rank (SQL semantics)
