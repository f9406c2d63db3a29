"""group_topk and zscore_standardize (stages/stats additions)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from graphforge_ray.stages.stats import group_topk, zscore_standardize


def test_group_topk_exact_with_ties(ray_session):
    df = pd.DataFrame(
        {
            "src": ["a", "a", "a", "a", "b", "b"],
            "score": [5.0, 5.0, 4.0, 9.0, 1.0, 1.0],
            "id": [4, 3, 2, 1, 10, 9],
        }
    )
    out = group_topk(
        rd.from_pandas(df).repartition(3), key="src",
        score_col="score", k=2, id_col="id",
    ).to_pandas()
    got = set(zip(out["src"], out["id"]))
    # a: 9.0(id1) then 5.0 tie → id3 before id4; b: both 1.0 → id9, id10
    assert got == {("a", 1), ("a", 3), ("b", 9), ("b", 10)}


def test_group_topk_ascending_and_k_large(ray_session):
    df = pd.DataFrame(
        {"src": ["a", "a", "b"], "score": [2.0, 1.0, 7.0],
         "id": [1, 2, 3]}
    )
    out = group_topk(
        rd.from_pandas(df), key="src", score_col="score", k=5,
        id_col="id", descending=False,
    ).to_pandas()
    assert len(out) == 3  # never pads


def test_group_topk_bad_k(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"src": ["a"], "score": [1.0],
                                      "id": [1]}))
    with pytest.raises(ValueError):
        group_topk(ds, "src", "score", 0, "id")


def test_zscore_matches_numpy(ray_session):
    x = np.array([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0])
    ds = rd.from_pandas(
        pd.DataFrame({"id": range(len(x)), "v": x})
    ).repartition(3)
    out = (
        zscore_standardize(ds, "v")
        .to_pandas()
        .sort_values("id")
    )
    mu, sd = x.mean(), x.std()
    want = np.floor((x - mu) / sd * 1e6) / 1e6
    assert np.allclose(out["v_z"].to_numpy(), want, atol=2e-6)
    assert list(out.columns) == ["id", "v", "v_z"]


def test_zscore_constant_column_raises(ray_session):
    ds = rd.from_pandas(pd.DataFrame({"v": [2.0, 2.0, 2.0]}))
    with pytest.raises(ValueError, match="constant"):
        zscore_standardize(ds, "v")


def test_pearson_corr_matches_numpy(ray_session):
    from graphforge_ray.stages.stats import pearson_corr

    rng_x = np.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    y = 2.5 * rng_x + np.array([0.1, -0.2, 0.0, 0.3, -0.1, 0.2])
    ds = rd.from_pandas(pd.DataFrame({"x": rng_x, "y": y})).repartition(3)
    got = pearson_corr(ds, "x", "y")
    want = float(np.corrcoef(rng_x, y)[0, 1])
    assert got == pytest.approx(want, abs=1e-12)


def test_pearson_corr_constant_raises(ray_session):
    from graphforge_ray.stages.stats import pearson_corr

    ds = rd.from_pandas(pd.DataFrame({"x": [1.0, 1.0], "y": [1.0, 2.0]}))
    with pytest.raises(ValueError, match="constant"):
        pearson_corr(ds, "x", "y")


def test_group_quantiles_sketch_error_bound(ray_session):
    # r5 (r4 verdict item #7): fixed-grid sketch over a CONTINUOUS
    # column — every reported value within width/2 of the exact
    # percentile_disc answer, bins bound the shuffle
    import ray.data as rd

    from graphforge_ray.stages.stats import group_quantiles_sketch

    rng = np.random.default_rng(11)
    n = 4000
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, n),
            "x": rng.normal(100.0, 25.0, n),  # continuous, hi cardinality
        }
    )
    num_bins = 512
    got = (
        group_quantiles_sketch(
            rd.from_pandas(df).repartition(5), "g", "x",
            qs=(0.25, 0.5, 0.9), num_bins=num_bins,
        )
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
    )
    width = (df["x"].max() - df["x"].min()) / num_bins
    assert len(got) == 9
    for (g, q), v in zip(zip(got["g"], got["q_pct"]), got["value"]):
        xs = np.sort(df.loc[df["g"] == g, "x"].to_numpy())
        exact = xs[int(np.ceil(q / 100 * len(xs))) - 1]
        assert abs(v - exact) <= width  # midpoint ± floor slack < width


def test_group_quantiles_sketch_constant_column(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.stats import group_quantiles_sketch

    df = pd.DataFrame({"g": ["a"] * 5 + ["b"] * 5, "x": [7.0] * 10})
    got = group_quantiles_sketch(
        rd.from_pandas(df), "g", "x", qs=(0.5,)
    ).to_pandas()
    assert len(got) == 2 and (got["value"] == 7.0).all()


def test_group_quantiles_sketch_empty_input_raises(ray_session):
    import ray.data as rd

    from graphforge_ray.stages.stats import group_quantiles_sketch

    df = pd.DataFrame({"g": ["a"], "x": [1.0]}).iloc[:0]
    with pytest.raises(ValueError, match="no rows"):
        group_quantiles_sketch(rd.from_pandas(df).repartition(2),
                               "g", "x")
